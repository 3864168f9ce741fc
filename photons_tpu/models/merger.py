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


def merger_from_reference(path: str, engine: str = "fmm", log: bool = False,
                          subsample: int = 1, **cfg_kw) -> Simulation:
    """Build the merger simulation from the reference's packaged IC
    (demo/ic_merger.gdt2: 40000 type-1 + 20000 type-2 particles, header
    boxsize/Omega/z all zero -> open-boundary Newtonian galaxy model in
    Gadget units, coordinates ~[-200, 200] kpc/h).

    Reference parity notes: the reference streams ALL particle types into
    one array (read_Particle_Gadget2 loops m=0..5, snapshot.c:244-258) and
    uses the single global MASSPART = header.mass[1] for every particle --
    the per-particle mass assignment is commented out (snapshot.c:251) and
    type 2's lighter mass is dropped.  We reproduce exactly that (scalar
    cfg.mass_part); header time=0 means velocities carry NO a^1.5 Gadget
    scaling (gdt2unit = (1/(1+0))^1.5 = 1, snapshot.c:261).

    Positions are shifted to the positive octant (the tree builder wants
    [0, boxsize); the reference instead carries BoxMinimum/BoxMaximum
    geometry, fmm.c:339-349) -- a rigid translation, physics-neutral for
    the open boundary.

    ``subsample``: keep every k-th particle with mass scaled by k (total
    mass preserved).  The full galaxy is near-field-dense (the reference
    sizes its task list for up to 1000 neighbor leaves per leaf,
    fmm.c:774) -- at 60000 particles that P2P table is a device workload;
    CPU smoke tests pass subsample >= 4."""
    import numpy as np

    from photons_tpu.io.gadget import read_gadget

    head, pos, vel = read_gadget(path)
    if subsample > 1:
        pos = pos[::subsample]
        vel = vel[::subsample]
    span = float(np.abs(pos).max()) * 2.0
    box = float(np.ceil(span * 1.3))
    pos = pos + 0.5 * box
    cfg = merger_config(n_part=pos.shape[0], boxsize=box,
                        mass_part=float(head.mass[1]) * subsample,
                        newtonian=True, **cfg_kw)
    # a=0: with cfg.newtonian the state's scale-factor slot carries
    # internal time (kpc/(km/s) ~ 0.978 Gyr in Gadget units) starting at 0
    return Simulation.from_arrays(cfg, pos, vel, engine=engine, a=0.0,
                                  log=log)
