"""Open-boundary collisionless merger: the second model family.

The reference ships an alternate IC for this scenario
(demo/ic_merger.gdt2; non-periodic mode via the BoxMinimum/BoxMaximum
geometry, fmm_construct fmm.c:339-349): two Plummer-like clusters on a
collision course, evolved with pure Newtonian FMM (no Ewald split, no PM).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from photons_tpu.config import SimConfig
from photons_tpu.sim import Simulation


def merger_config(n_part: int = 16384, boxsize: float = 20000.0,
                  **kw) -> SimConfig:
    base = dict(
        boxsize=boxsize, n_part_total=n_part,
        omega_m=0.25, omega_x=0.75, hubble=0.7,
        open_angle=0.4, leaf_size=16,
        longshort=False, periodic=False, initial_redshift=49.0,
        code_proj="merger")
    base.update(kw)
    return SimConfig(**base)


def ic_merger(cfg: SimConfig, seed: int = 42, separation: float = 0.4,
              cluster_scale: float = 0.05, v_approach: float = 50.0):
    """Two equal Plummer spheres approaching along x."""
    rng = np.random.default_rng(seed)
    n_half = cfg.n_part_total // 2
    L = cfg.boxsize
    a_pl = cluster_scale * L

    def plummer(n):
        # radius from the Plummer inverse CDF, isotropic directions
        u = rng.uniform(0, 1, n)
        r = a_pl / np.sqrt(u ** (-2.0 / 3.0) - 1.0)
        r = np.minimum(r, 0.3 * L)
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return r[:, None] * v

    c1 = np.array([0.5 - separation / 2, 0.5, 0.5]) * L
    c2 = np.array([0.5 + separation / 2, 0.5, 0.5]) * L
    pos = np.concatenate([plummer(n_half) + c1,
                          plummer(cfg.n_part_total - n_half) + c2])
    pos = np.clip(pos, 0.01 * L, 0.99 * L)
    vel = np.zeros_like(pos)
    vel[:n_half, 0] = +v_approach
    vel[n_half:, 0] = -v_approach
    return pos, vel


def demo_merger(engine: str = "fmm", seed: int = 42, log: bool = False,
                cfg: Optional[SimConfig] = None, **cfg_kw) -> Simulation:
    cfg = cfg or merger_config(**cfg_kw)
    if cfg.input_path:
        return Simulation.from_config(cfg, engine=engine, log=log)
    pos, vel = ic_merger(cfg, seed=seed)
    return Simulation.from_arrays(cfg, pos, vel, engine=engine, log=log)
