#!/usr/bin/env python
"""Generate a Gadget-2 demo IC file (the stand-in for the reference's
packaged demo/ic_lcdm.gdt2: N=32^3, L=100 Mpc/h, z=49, Om=0.25, OL=0.75,
h=0.7) so the file-based `run_sim.py <paramfile>` path works end to end.

    python scripts/make_demo_ic.py demo/ic_lcdm.gdt2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("output", nargs="?", default="demo/ic_lcdm.gdt2")
    ap.add_argument("--n-side", type=int, default=32)
    ap.add_argument("--boxsize", type=float, default=100000.0)
    ap.add_argument("--redshift", type=float, default=49.0)
    ap.add_argument("--amplitude", type=float, default=0.05,
                    help="rms Zel'dovich displacement in grid spacings")
    ap.add_argument("--seed", type=int, default=12345)
    args = ap.parse_args()

    from photons_tpu.config import SimConfig
    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.io.gadget import GadgetHeader, write_gadget

    n = args.n_side ** 3
    cfg = SimConfig(boxsize=args.boxsize, n_part_total=n,
                    initial_redshift=args.redshift,
                    omega_m=0.25, omega_x=0.75, hubble=0.7)
    pos, vel = ic_zeldovich(cfg, seed=args.seed, amplitude=args.amplitude)

    a0 = cfg.initial_scale_factor
    head = GadgetHeader(
        npart=(0, n, 0, 0, 0, 0), npart_total=(0, n, 0, 0, 0, 0),
        mass=(0.0, cfg.particle_mass, 0.0, 0.0, 0.0, 0.0),
        time=a0, redshift=args.redshift, boxsize=args.boxsize,
        omega_m=cfg.omega_m, omega_x=cfg.omega_x, hubble=cfg.hubble)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    write_gadget(args.output, head, pos, vel)
    print(f"wrote {args.output}: N={n}, L={args.boxsize:g}, z={args.redshift}, "
          f"m_p={cfg.particle_mass:.4f}")


if __name__ == "__main__":
    main()
