#!/usr/bin/env python
"""Split-geometry accuracy sweep (VERDICT round 2, item 1).

Measures the TOTAL (FMM short + PM long) force error against the exact
Ewald oracle as a function of the Ewald split geometry:

  rs_cells = split_radius in PM mesh cells   (reference: 1.25, initial.c:324)
  rs_phys  = split_radius / boxsize          (sets cutoff & P2P pair volume)

The flagship 256^3 run inherits the reference default rs = 1.25 cells on a
1-particle-per-cell mesh; the repo's own Ewald budget test only proved the
<1e-3 RMS target at rs = 2.5 cells.  This sweep measures both, plus the
rs-halved geometries that would cut P2P pair volume ~8x (cutoff = 4.5*rs):

  A  n_side =  n, rs = 1.25 cells   -- flagship / reference geometry
  B  n_side = 2n, rs = 2.50 cells   -- same physical rs, proven mesh ratio
  C  n_side = 2n, rs = 1.25 cells   -- rs halved physically (8x fewer pairs)
  D  n_side = 4n, rs = 2.50 cells   -- rs halved, proven mesh ratio

Oracle: ewald_forces on a target subsample (exact k-space + erfc images,
float64), with the short/long parts budgeted separately so the error is
attributable (PM aliasing vs short-range truncation vs FMM).

Usage:
    python scripts/sweep_split_geometry.py --n 32 --targets 512 --cpu
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=32, help="particles per side")
    ap.add_argument("--targets", type=int, default=512,
                    help="oracle target subsample size")
    ap.add_argument("--leaf-size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--zeldovich", action="store_true",
                    help="evolved-looking Zel'dovich IC instead of uniform")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--geoms", nargs="*", default=None,
                    help="extra geometries as MULT:RATIO (n_side = MULT*n, "
                         "rs = RATIO cells), e.g. 2:1.75 2:2.0; replaces "
                         "the default A-D ladder when given")
    ap.add_argument("--out", default="artifacts/split_geometry.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from photons_tpu.config import SimConfig
    from photons_tpu.ops.direct import ewald_forces
    from photons_tpu.ops.fmm_engine import fmm_forces
    from photons_tpu.pm import green_function, pm_accel

    n = args.n
    n_part = n ** 3
    L = 100000.0                       # demo box scale (kpc/h); ratios matter
    rng = np.random.default_rng(args.seed)
    if args.zeldovich:
        from photons_tpu.ics import ic_zeldovich
        from photons_tpu.models.lcdm import lcdm_config
        cfg0 = lcdm_config(n_part=n_part, n_side=n, dtype="float64")
        pos, _ = ic_zeldovich(cfg0, seed=args.seed, spectral_index="lcdm")
        pos = np.asarray(pos, np.float64)
        L = cfg0.boxsize
    else:
        pos = rng.uniform(0, L, (n_part, 3))
    tgt = rng.choice(n_part, size=min(args.targets, n_part), replace=False)

    if args.geoms:
        geoms = []
        for spec in args.geoms:
            mult, ratio = spec.split(":")
            geoms.append((f"m{mult}_r{ratio}", int(mult) * n, float(ratio)))
    else:
        geoms = [
            ("A_flagship", n, 1.25),
            ("B_same_rs_fine_mesh", 2 * n, 2.50),
            ("C_half_rs", 2 * n, 1.25),
            ("D_half_rs_fine_mesh", 4 * n, 2.50),
        ]

    # one oracle per unique physical rs
    oracles = {}
    results = []
    for name, n_side, ratio in geoms:
        rs = ratio * L / n_side
        cfg = SimConfig(
            boxsize=L, n_side=n_side, n_part_total=n_part, dtype="float64",
            leaf_size=args.leaf_size, split_scale=rs,
            open_cap_per_node=512, m2l_cap_per_node=256,
            p2p_neighbor_cap=512, sorted_state=False)
        key = round(rs / L, 9)
        if key not in oracles:
            # k-space needs k*rs ~ 5.5 for f64-negligible truncation
            k_max = int(np.ceil(5.5 * L / (2 * np.pi * rs))) + 1
            t0 = time.perf_counter()
            tot, sh, lg = ewald_forces(
                pos, cfg.particle_mass, L, rs, cfg.soften_scale,
                n_images=1, k_max=k_max, targets=tgt, return_parts=True)
            oracles[key] = (tot, sh, lg)
            print(f"oracle rs={rs:.1f} ({ratio} cells/{n_side}): k_max="
                  f"{k_max}, {time.perf_counter() - t0:.1f}s", flush=True)
        exact, exact_sh, exact_lg = oracles[key]
        rms = np.sqrt((exact ** 2).sum(-1).mean())

        t0 = time.perf_counter()
        acc_s, diag = jax.jit(lambda p, c=cfg: fmm_forces(p, c))(
            jnp.asarray(pos))
        gf = green_function(n_side, L, rs, dtype=jnp.float64)
        acc_pm = pm_accel(jnp.asarray(pos), gf, mass=cfg.particle_mass,
                          boxsize=L, n_side=n_side)
        acc_s = np.asarray(acc_s)[tgt]
        acc_pm = np.asarray(acc_pm)[tgt]
        solver_t = time.perf_counter() - t0
        assert not bool(diag["overflow"]), f"{name}: traversal overflow"

        def rms_err(a, b):
            return float(np.sqrt((((a - b) ** 2).sum(-1)).mean()) / rms)

        row = {
            "name": name, "n_side": n_side, "rs_cells": ratio,
            "rs_over_L": rs / L, "cutoff_over_L": 4.5 * rs / L,
            "err_total_rms": rms_err(acc_s + acc_pm, exact),
            "err_short_rms": rms_err(acc_s, exact_sh),
            "err_long_rms": rms_err(acc_pm, exact_lg),
            "err_total_max": float(
                np.sqrt(((acc_s + acc_pm - exact) ** 2).sum(-1)).max()
                / rms),
            "n_p2p": int(diag["n_p2p"]), "n_m2l": int(diag["n_m2l"]),
            "solver_seconds": solver_t,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"n": n, "n_part": n_part, "boxsize": L,
                   "targets": len(tgt), "seed": args.seed,
                   "ic": "zeldovich" if args.zeldovich else "uniform",
                   "results": results}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
