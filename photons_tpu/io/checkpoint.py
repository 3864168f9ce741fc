"""Native checkpoint format (+ Gadget-2 compatible snapshots elsewhere).

The reference resumes only through Gadget-2 snapshots (SURVEY.md 5.4);
this adds a lossless native format: one ``.npz`` per shard holding the
full float-precision state, the scale factor, the slab bounds, and the
config, so a run restarts bit-for-bit (snapshots are float32 on disk and
drop acc/acc_pm, forcing a force recomputation on resume).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np

from photons_tpu.config import SimConfig

_FIELDS = ("pos", "vel", "acc", "acc_pm")


def save_checkpoint(path: str, cfg: SimConfig, state, shard: int = 0) -> str:
    """Write one shard's checkpoint file ``<path>.ckpt.<shard>.npz``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fname = f"{path}.ckpt.{shard}.npz"
    arrays = {k: np.asarray(getattr(state, k)) for k in _FIELDS}
    arrays["a"] = np.asarray(state.a)
    for opt in ("valid", "bounds", "xbounds", "ybounds"):
        if hasattr(state, opt):
            arrays[opt] = np.asarray(getattr(state, opt))
    cfg_json = json.dumps(dataclasses.asdict(cfg))
    np.savez(fname, __config__=np.frombuffer(cfg_json.encode(), np.uint8),
             **arrays)
    return fname


def load_checkpoint(path: str, shard: int = 0):
    """Read back (cfg, arrays dict)."""
    with np.load(f"{path}.ckpt.{shard}.npz") as z:
        cfg_json = bytes(z["__config__"]).decode()
        kw = json.loads(cfg_json)
        kw["snap_times"] = tuple(kw.get("snap_times", ()))
        cfg = SimConfig(**kw)
        arrays = {k: z[k] for k in z.files if k != "__config__"}
    return cfg, arrays


def resume_simulation(path: str, engine: str = "fmm", shard: int = 0):
    """Rebuild a single-device Simulation from a native checkpoint."""
    import jax.numpy as jnp

    from photons_tpu.sim import Simulation
    from photons_tpu.state import SimState

    cfg, arr = load_checkpoint(path, shard)
    dtype = jnp.dtype(cfg.dtype)
    state = SimState(
        pos=jnp.asarray(arr["pos"], dtype), vel=jnp.asarray(arr["vel"], dtype),
        acc=jnp.asarray(arr["acc"], dtype),
        acc_pm=jnp.asarray(arr["acc_pm"], dtype),
        a=jnp.asarray(arr["a"], dtype))
    return Simulation(cfg=cfg, state=state, engine=engine)
