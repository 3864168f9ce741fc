"""Phase-timer taxonomy matching the reference's instrumentation.

The reference brackets every phase with gettimeofday into ~20 accumulators
(photoNs.h:104-137, dtime() utility.c:126-136): p2p_self / p2p (remote) /
p2p_collect / p2p_transfer / p2p_update / m2l / fmm / pm / task / ext ...
This is the measurement harness behind the redundancy paper's performance
model (SURVEY.md 5.1), so the rebuild reproduces the same taxonomy.

On TPU, device work is async: ``measure`` blocks on the returned arrays
(block_until_ready) so the bracket reflects true device time.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

PHASES = (
    "p2p_self",      # local P2P kernel (dtime_p2p_self)
    "p2p",           # remote/halo P2P kernel (dtime_p2p)
    "p2p_collect",   # task/pack construction (dtime_p2p_collect)
    "p2p_transfer",  # layout/gather transfers (dtime_p2p_transfer)
    "p2p_update",    # result accumulation (dtime_p2p_update)
    "m2l",           # M2L compute (dtime_m2l)
    "fmm",           # whole FMM short-range phase (dtime_fmm)
    "pm",            # PM long-range phase (dtime_pm)
    "task",          # tree-walk/task generation (dtime_task)
    "ext",           # remote/periodic pass (dtime_ext)
    "prep",          # tree build + upward pass (dtime_prep)
    "domain",        # decomposition / migration (DTIME_DOMAIN)
    "step",          # whole KDK step
    "warmup",        # first force computation incl. compile (never a row)
)


class PhaseTimers:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def measure(self, phase: str, *sync_arrays):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            for arr in sync_arrays:
                jax.block_until_ready(arr)
            self.add(phase, time.perf_counter() - t0)

    def add(self, phase: str, seconds: float):
        self.totals[phase] += seconds
        self.counts[phase] += 1
        self.last[phase] = seconds

    def reset(self):
        self.totals.clear()
        self.counts.clear()
        self.last.clear()

    def snapshot(self) -> Dict[str, float]:
        return dict(self.totals)

    def latest(self) -> Dict[str, float]:
        """Most recent measurement per phase (per-step log row values)."""
        return dict(self.last)

    def report(self) -> str:
        lines = [f"  {k:>14s}: {self.totals[k]:9.4f} s  (x{self.counts[k]})"
                 for k in PHASES if k in self.totals]
        return "\n".join(lines)
