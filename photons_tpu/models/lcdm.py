"""Flat-LambdaCDM periodic TreePM: the flagship model family.

Mirrors the reference's primary scenario (demo/lcdm_g2.run: N=32^3,
L=100 Mpc/h box, z=49 -> 1, Omega_m=0.25, Omega_x=0.75, h=0.7), with
generated ICs standing in for the packaged Gadget-2 file when no input
snapshot is given.
"""

from __future__ import annotations

from typing import Optional

from photons_tpu.config import SimConfig
from photons_tpu.sim import Simulation


def lcdm_config(n_part: int = 32768, boxsize: float = 100000.0,
                n_side: int = 32, **kw) -> SimConfig:
    """Demo-equivalent config (demo/lcdm_g2.run + ic_lcdm.gdt2 header)."""
    base = dict(
        boxsize=boxsize, n_part_total=n_part, n_side=n_side,
        omega_m=0.25, omega_x=0.75, hubble=0.7, initial_redshift=49.0,
        open_angle=0.4, leaf_size=16,   # reference MaxPackage default;
        # pass leaf_size=128 for TPU-tuned throughput (see BENCH_NOTES.md)
        longshort=True, periodic=True,
        code_proj="demo", n_steps=100, final_scale_factor=1.0)
    base.update(kw)
    return SimConfig(**base)


def demo_lcdm(engine: str = "fmm", ic: str = "zeldovich", seed: int = 12345,
              log: bool = False, cfg: Optional[SimConfig] = None,
              **cfg_kw) -> Simulation:
    """Build the 32^3 demo simulation (the reference's `make demo`)."""
    cfg = cfg or lcdm_config(**cfg_kw)
    if cfg.input_path:
        return Simulation.from_config(cfg, engine=engine, log=log)
    if ic in ("zeldovich", "lcdm"):
        from photons_tpu.ics import ic_zeldovich
        pos, vel = ic_zeldovich(
            cfg, seed=seed,
            spectral_index="lcdm" if ic == "lcdm" else -1.0)
    elif ic == "uniform":
        from photons_tpu.ics import ic_uniform
        pos, vel = ic_uniform(cfg, seed=seed)
    else:
        raise ValueError(f"unknown ic {ic!r}")
    return Simulation.from_arrays(cfg, pos, vel, engine=engine, log=log)
