"""Device-memory accounting: the pmalloc/TotalMemory/MaxMemory analogue.

The reference wraps every allocation in an indexed-slot accounting malloc
with peak tracking (pmalloc/pfree/reset_mem, utility.c:61-123).  On TPU,
allocation is XLA's job; the equivalent observability is the live-buffer
census and the allocator's own peak statistics, exposed per device.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax


def device_memory_report(device=None) -> Dict[str, float]:
    """Bytes in use / peak / limit for one device (MaxMemory analogue).

    Falls back to a live-buffer census where the backend exposes no
    allocator stats (CPU).
    """
    dev = device or jax.local_devices()[0]
    stats = dev.memory_stats() or {}
    out = {
        "bytes_in_use": float(stats.get("bytes_in_use", 0)),
        "peak_bytes_in_use": float(stats.get("peak_bytes_in_use", 0)),
        "bytes_limit": float(stats.get("bytes_limit", 0)),
    }
    if out["bytes_in_use"] == 0:
        out["bytes_in_use"] = float(sum(
            b.nbytes for b in jax.live_arrays()
            if dev in getattr(b, "devices", lambda: set())()))
    return out


def live_array_census(top: int = 10):
    """Largest live device arrays: (shape, dtype, nbytes) rows -- the
    per-slot table of pmalloc, reconstructed from the runtime."""
    rows = [(tuple(a.shape), str(a.dtype), int(a.nbytes))
            for a in jax.live_arrays()]
    rows.sort(key=lambda r: -r[2])
    return rows[:top]


def format_memory(device=None) -> str:
    rep = device_memory_report(device)
    gb = 1024.0 ** 3
    return (f"in_use {rep['bytes_in_use'] / gb:.3f} GB, "
            f"peak {rep['peak_bytes_in_use'] / gb:.3f} GB, "
            f"limit {rep['bytes_limit'] / gb:.3f} GB")
