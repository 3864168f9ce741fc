"""Phase-decomposed force computation for honest per-phase timing.

The production step is ONE fused jit (sim.make_step_fn) -- phases cannot be
bracketed inside it from Python.  The profiler re-runs the same force
computation as separately-jitted phase functions, fencing each with a
device->host scalar read (the only reliable completion barrier through the
axon tunnel, where block_until_ready can return before remote execution
finishes -- see bench.py).

This reproduces the reference's phase taxonomy (photoNs.h:104-137,
SURVEY.md 5.1): dtime_prep (tree build + P2M/M2M), dtime_task (tree walk),
dtime_p2p_collect (pack), dtime_p2p_self (kernel), dtime_m2l (M2L+L2L+L2P),
dtime_p2p_update (scatter to particle order), dtime_pm.  Because the
phases compile separately, XLA cannot fuse across them, so the phase sum is
an upper bound of the fused step's time (the fused step also overlaps PM
with FMM as independent subgraphs); the split is still the measurement
harness the redundancy study needs (utility.c:8-48).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from photons_tpu.config import SimConfig
from photons_tpu.sim import _aot_wrap as _aot
from photons_tpu.utils.timers import PhaseTimers


def _fence(tree_of_arrays) -> None:
    """Force completion: host-read one element of one output buffer."""
    leaf = jax.tree_util.tree_leaves(tree_of_arrays)[0]
    _ = jnp.asarray(leaf).ravel()[0].item()


class PhaseProfiler:
    """Jitted per-phase force pipeline matching a Simulation's engine.

    Phases are compiled ahead-of-time (sim._aot_wrap): the dispatch-time
    compile path picks lane-padded layouts that are multi-GB too large at
    256^3 (the round-1 reason for the --no-profile escape hatch); AOT picks
    compact layouts, so the profiler fits alongside the production run.
    Call :meth:`warm` once before the timed loop so no recorded span ever
    includes compilation.
    """

    def __init__(self, cfg: SimConfig, engine: str):
        self.cfg = cfg
        self.engine = engine
        backend = engine.partition("-")[2] or "jnp"
        if engine.startswith("fmm"):
            self._build_fmm(cfg, backend)
        self._build_pm(cfg)

    def _build_pm(self, cfg):
        self.f_pm_tree = None
        if cfg.longshort or cfg.pm_only:
            from photons_tpu.pm.solver import green_function, pm_accel
            gf = green_function(cfg.n_side, cfg.boxsize, cfg.split_radius,
                                deconvolve=not cfg.pm_only,
                                dtype=jnp.dtype(cfg.dtype))
            use_pallas_cic = (self.engine.startswith("fmm")
                              and cfg.longshort
                              and (cfg.cic_backend == "pallas"
                                   or (cfg.cic_backend == "auto"
                                       and jax.default_backend() == "tpu")))
            if use_pallas_cic:
                # production parity: the fmm engine rides PM on the FMM
                # tree via the Pallas CIC kernels (pm_from_tree), NOT the
                # XLA-scatter pm_accel -- profiling the latter overstated
                # the pm phase ~2.5x at 256^3
                from photons_tpu.ops.fmm_engine import pm_from_tree
                self.f_pm_tree = _aot(jax.jit(
                    lambda tree: pm_from_tree(tree, cfg, gf)[0]))
                self.f_pm = None
                return
            self.f_pm = _aot(jax.jit(lambda pos: pm_accel(
                pos, gf, mass=cfg.particle_mass, boxsize=cfg.boxsize,
                n_side=cfg.n_side)))
        else:
            self.f_pm = _aot(jax.jit(lambda pos: jnp.zeros_like(pos)))

    def _build_fmm(self, cfg, backend):
        from photons_tpu.ops.fmm_engine import (apply_m2l, downward_l2l,
                                                leaf_l2p, p2p_jnp)
        from photons_tpu.ops.traversal import dual_tree_traversal
        from photons_tpu.tree.build import build_tree

        rs = cfg.split_radius if cfg.longshort else None
        cutoff = cfg.cutoff_radius if cfg.longshort else None
        box = cfg.boxsize if cfg.periodic else None
        mass = cfg.particle_mass

        self.f_tree = _aot(jax.jit(lambda pos: build_tree(
            pos, mass=mass, leaf_size=cfg.leaf_size, lo=0.0, hi=cfg.boxsize)))
        self.f_trav = _aot(jax.jit(lambda tree: dual_tree_traversal(
            tree, theta=cfg.open_angle, cutoff=cutoff, boxsize=box,
            open_cap=cfg.open_cap_per_node, m2l_cap=cfg.m2l_cap_per_node,
            p2p_cap=cfg.p2p_neighbor_cap, adjacency_eps=1e-9 * cfg.boxsize)))

        def m2l_chain(tree, lists):
            loc = apply_m2l(tree, lists, rs, box)
            loc = downward_l2l(tree, loc)
            return leaf_l2p(tree, loc[-1])
        self.f_m2l = _aot(jax.jit(m2l_chain))

        if backend == "jnp":
            self.f_collect = None
            self.f_p2p = _aot(jax.jit(lambda tree, lists: p2p_jnp(
                tree, lists, mass, cfg.soften_scale, rs, box)))
        else:
            from photons_tpu.ops.p2p_pallas import p2p_compute, p2p_prepare

            def collect(tree, lists):
                prep = p2p_prepare(tree, lists, mass, box, layout=backend)
                prep.pop("layout")
                return prep
            self.f_collect = _aot(jax.jit(collect))
            self.f_p2p = _aot(jax.jit(lambda prep: p2p_compute(
                {**prep, "layout": backend}, cfg.soften_scale, rs, box)))

        def update(tree, acc_leaf):
            # returns the padded array; the production path slices [:n]
            # afterwards -- the scatter is the cost being measured
            flat = jnp.where(tree.mask[..., None], acc_leaf, 0.0
                             ).reshape(-1, 3)
            acc_all = jnp.zeros((tree.perm.shape[0], 3), flat.dtype)
            return acc_all.at[tree.perm].set(flat)
        self.f_update = _aot(jax.jit(update))

    def warm(self, pos) -> None:
        """Compile + run every phase once without recording, so no timed
        profile ever includes compilation (round-1 logs carried one stale
        compile-inclusive value in every row -- VERDICT weak 1)."""
        self.profile(pos, PhaseTimers())

    def profile(self, pos, timers: PhaseTimers) -> None:
        """Run one phase-bracketed force computation, recording timers.

        Each phase is fenced with a scalar read, so the recorded spans are
        real device time (+ one ~70 ms tunnel round trip each, which the
        fused production step does not pay)."""
        import time as _t

        def run(phase, fn, *args):
            t0 = _t.perf_counter()
            out = fn(*args)
            _fence(out)
            timers.add(phase, _t.perf_counter() - t0)
            return out

        t_fmm0 = _t.perf_counter()
        tree = None
        if self.engine.startswith("fmm"):
            tree = run("prep", self.f_tree, pos)
            lists = run("task", self.f_trav, tree)
            acc_leaf = run("m2l", self.f_m2l, tree, lists)
            if self.f_collect is not None:
                prep = run("p2p_collect", self.f_collect, tree, lists)
                acc_p2p = run("p2p_self", self.f_p2p, prep)
            else:
                acc_p2p = run("p2p_self", self.f_p2p, tree, lists)
            run("p2p_update", self.f_update, tree, acc_leaf + acc_p2p)
            timers.add("fmm", _t.perf_counter() - t_fmm0)
        if self.f_pm_tree is not None:
            run("pm", self.f_pm_tree, tree)
        else:
            run("pm", self.f_pm, pos)
