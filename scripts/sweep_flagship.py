#!/usr/bin/env python
"""Flagship-regime sweep (VERDICT r1 item 1): leaf size x theta at N^3,
measuring steady-state s/step, interaction counters and a per-phase
breakdown on the real chip.

The round-1 flagship (S=256) ran brute-force P2P everywhere: cutoff =
4.5*1.25*L/256 is ~0.9 leaf widths at S=256, so every in-cutoff pair is
adjacent and the traversal emits only P2P -- 12k pair-interactions per
particle.  Smaller leaves shrink the neighbor ball (pairs/particle ~
S * (2*r_c/w + 1)^3 with w ~ S^(1/3)), trading kernel work for traversal
and table overhead.  This sweep finds the minimum of that tradeoff
(the reference tunes the same knob: MAXLEAF=8..32 timings recorded at
1_Indexing/src/initial.c:172-179).

Timing protocol: compile everything (one warm step), then dispatch K
steps back-to-back and fence once at the end (chained-execution fence,
see bench.py -- axon's block_until_ready can return early, a
data-dependent host read cannot).

Usage:
    python scripts/sweep_flagship.py --n 256 --steps 6
    python scripts/sweep_flagship.py --n 64 --steps 4 --cpu   # smoke
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sweep_one(cfg, engine, pos, vel, steps, phase_profile=True):
    """Returns dict with s/step, counters, and optional phase breakdown."""
    import jax
    from photons_tpu import cosmology
    from photons_tpu.sim import Simulation

    sim = Simulation.from_arrays(cfg, pos, vel, engine=engine)
    a0 = cfg.initial_scale_factor
    a1 = a0 * 1.02
    loga = np.linspace(np.log(a0), np.log(a1), steps + 2)
    a_grid = np.exp(loga)
    dk, dd = cosmology.step_factors(a0, a1, steps + 1,
                                    cfg.omega_m, cfg.omega_x)

    sim.compute_forces()                      # compile + initial forces
    state, diag = sim._step_fn(sim.state, float(dk[0]), float(dd[0]),
                               float(a_grid[1]))                 # warm step
    float(state.pos[0, 0])                                       # fence
    sim._check_diag(diag)

    t0 = time.perf_counter()
    for j in range(1, steps + 1):
        state, diag = sim._step_fn(state, float(dk[j]), float(dd[j]),
                                   float(a_grid[j + 1]))
    float(state.pos[0, 0])                                       # one fence
    dt = (time.perf_counter() - t0) / steps
    sim._check_diag(diag)

    out = {"s_per_step": dt,
           "n_p2p": int(sim.last_diag.get("n_p2p", 0)),
           "n_m2l": int(sim.last_diag.get("n_m2l", 0))}

    if phase_profile:
        from photons_tpu.profiling import PhaseProfiler
        from photons_tpu.utils.timers import PhaseTimers
        prof = PhaseProfiler(cfg, engine)
        prof.warm(state.pos)
        t = PhaseTimers()
        prof.profile(state.pos, t)
        out["phases"] = {k: round(v, 4) for k, v in t.latest().items()}

    del sim, state
    gc.collect()
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--engine", default="fmm-indexing")
    ap.add_argument("--leaf-sizes", default="32,64,128,256")
    ap.add_argument("--thetas", default="0.4")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-profile", action="store_true")
    ap.add_argument("--sorted", action="store_true", dest="sorted_state",
                    help="sorted-state stepping (no unsort scatter)")
    ap.add_argument("--list-reuse", type=int, default=1,
                    help="rebuild traversal lists every k-th step "
                         "(Verlet skin; implies --sorted)")
    ap.add_argument("--open-cap", type=int, default=0,
                    help="override the per-leaf-size open_cap")
    ap.add_argument("--p2p-cap", type=int, default=0,
                    help="override the per-leaf-size p2p_cap")
    ap.add_argument("--mesh-mult", type=int, default=1,
                    help="PM mesh side = mesh_mult * n (split-geometry "
                         "sweep, VERDICT r2 item 1)")
    ap.add_argument("--rs-cells", type=float, default=1.25,
                    help="split radius in PM mesh cells")
    ap.add_argument("--open-cap-levels", default="",
                    help="leaf-anchored per-level open-cap schedule, "
                         "e.g. '96,64,48' (see run_pk_parity.py)")
    ap.add_argument("--quantized-mac", action="store_true",
                    help="packed u16 fixed-point MAC gathers "
                         "(cfg.traversal_quantized)")
    ap.add_argument("--tag", default="", help="artifact filename suffix")
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config

    n = args.n
    n_side = args.mesh_mult * n
    base = lcdm_config(n_part=n ** 3, n_side=n_side, dtype="float32",
                       fused_step=n < 256, code_proj=f"sweep{n}",
                       sorted_state=args.sorted_state or args.list_reuse > 1,
                       list_reuse=args.list_reuse,
                       output_path=args.out)
    base = base.replace(split_scale=args.rs_cells * base.boxsize / n_side)
    if args.open_cap_levels:
        base = base.replace(open_cap_levels=tuple(
            int(x) for x in args.open_cap_levels.split(",")))
    if args.quantized_mac:
        base = base.replace(traversal_quantized=True)
    print(f"geometry: mesh {n_side}^3, rs = {args.rs_cells} cells = "
          f"{base.split_radius:.1f} kpc/h, cutoff {base.cutoff_radius:.1f}",
          flush=True)
    pos, vel = ic_zeldovich(base, seed=2026, spectral_index="lcdm")

    # per-leaf-size capacity tuning: smaller leaves -> more neighbors per
    # leaf (the ball holds ~(2 r_c/w + 1)^3 blocks); generous but bounded
    caps = {16: (384, 320), 32: (256, 192), 64: (160, 128),
            128: (128, 96), 256: (128, 96), 512: (128, 96)}

    results = []
    for s_leaf in [int(x) for x in args.leaf_sizes.split(",")]:
        for theta in [float(x) for x in args.thetas.split(",")]:
            open_cap, p2p_cap = caps.get(s_leaf, (128, 96))
            open_cap = args.open_cap or open_cap
            p2p_cap = args.p2p_cap or p2p_cap
            cfg = base.replace(leaf_size=s_leaf, open_angle=theta,
                               open_cap_per_node=open_cap,
                               p2p_neighbor_cap=p2p_cap,
                               m2l_cap_per_node=64)
            tag = f"S={s_leaf} theta={theta}"
            print(f"--- {tag} ...", flush=True)
            try:
                r = sweep_one(cfg, args.engine, pos, vel, args.steps,
                              phase_profile=not args.no_profile)
            except Exception as e:     # OOM / capacity: record and move on
                print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
                results.append({"leaf_size": s_leaf, "theta": theta,
                                "error": f"{type(e).__name__}: {e}"[:300]})
                gc.collect()
                continue
            r.update(leaf_size=s_leaf, theta=theta)
            results.append(r)
            print(f"{tag}: {r['s_per_step']:.2f} s/step  "
                  f"n_p2p={r['n_p2p']} n_m2l={r['n_m2l']}", flush=True)
            if "phases" in r:
                print("  phases:", r["phases"], flush=True)

    os.makedirs(args.out, exist_ok=True)
    geo = ("" if args.mesh_mult == 1 and args.rs_cells == 1.25
           else f"_m{args.mesh_mult}r{args.rs_cells:g}")
    if args.tag:
        geo += f"_{args.tag}"
    path = os.path.join(args.out, f"sweep_{n}{geo}.json")
    with open(path, "w") as fh:
        json.dump({"n": n, "engine": args.engine, "steps": args.steps,
                   "mesh_side": n_side, "rs_cells": args.rs_cells,
                   "results": results}, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
