#!/usr/bin/env python
"""BASELINE physics target: evolve an N^3 LCDM box z=49 -> 0 and compare
the low-k power spectrum against linear growth (and optionally against a
PM-only companion run of the same IC).

Produces artifacts/pk_<N>.json with:
  k           bin centers (h/kpc)
  pk_init     P(k) at z=49
  pk_final    P(k) at z=0 (or --a-final)
  ratio       pk_final / pk_init per bin
  linear      linear-theory D(a_f)^2 / D(a_i)^2 (the parity anchor)
  pk_pm       (with --pm-compare) z=0 P(k) of the PM-only run

The reference's demo is 32^3 (demo/lcdm_g2.run); the rebuild target is the
same physics at 256^3 (BASELINE.md).  Large scales must track linear
theory; mildly nonlinear bins grow faster -- both are recorded.

Usage:
    python scripts/run_pk_parity.py --n 256            # the target run
    python scripts/run_pk_parity.py --n 64 --steps 10  # smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent compile cache (TPU-side dir; the CPU suite uses .jax_cache_cpu):
# the 512^3 fused-step compile through the axon remote endpoint costs tens
# of minutes -- a retry without the cache repays it every time
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=256, help="particles per side")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--a-final", type=float, default=1.0)
    ap.add_argument("--engine", default="fmm-indexing")
    ap.add_argument("--leaf-size", type=int, default=128)
    ap.add_argument("--pm-compare", action="store_true",
                    help="also run the PM-only engine on the same IC")
    ap.add_argument("--no-profile", action="store_true",
                    help="skip the phase profiler (it now compiles AOT "
                         "with compact layouts and fits at 256^3; this "
                         "escape hatch remains for debugging only)")
    ap.add_argument("--profile-interval", type=int, default=12,
                    help="profile phases every k-th check window.  At "
                         "256^3 the phase pipeline's multi-GB transients "
                         "alongside the resident fused step fragment the "
                         "16 GB heap; per-window profiling (k=1) was "
                         "measured to OOM the step itself ~3 windows in, "
                         "so production runs profile sparsely")
    ap.add_argument("--mesh-mult", type=int, default=2,
                    help="PM mesh side = mesh_mult * n.  The reference "
                         "pairs a 1-cell-per-particle mesh with rs = 1.25 "
                         "cells (initial.c:324), which misses the 1e-3 "
                         "total-force budget (2.09e-3 RMS measured under "
                         "the Ewald oracle, artifacts/split_geometry16."
                         "json); the default is the accuracy-compliant "
                         "geometry found in the round-3 sweep: mesh 2n "
                         "with rs = 1.75 cells (6.3e-4 RMS, 2.4x less P2P "
                         "pair volume)")
    ap.add_argument("--rs-cells", type=float, default=2.0,
                    help="Ewald split radius in PM mesh cells "
                         "(rs = rs_cells * L / (mesh_mult*n)).  2.0 is "
                         "the round-5 default: the 1.75 geometry "
                         "measured 1.17e-3 RMS under the flagship Ewald "
                         "oracle (over the <1e-3 budget; CIC aliasing), "
                         "2.0 measures 8.44e-4 "
                         "(artifacts/split_geometry256_r5.json) for "
                         "~1.75x more P2P pair volume")
    # caps pre-sized for z=0 clustering at 256^3 (VERDICT r2 next-7:
    # p2p rows exceed 160 by z~13 under the old 96 default, costing
    # elastic-recovery recompiles mid-run; a full run must finish with 0).
    # rs 2.0 widens the cutoff ball 1.5x in volume over the rs-1.75 caps
    # ((160,96,96)+192 settled by the round-4 recovery): scaled to match
    ap.add_argument("--open-cap", type=int, default=256)
    ap.add_argument("--p2p-cap", type=int, default=288)
    ap.add_argument("--cic-straddler-cap", type=int, default=192,
                    help="XLA residual-path capacity for leaves whose CIC "
                         "footprint exceeds the Pallas brick tile.  The "
                         "round-3 production run grew 8 -> 128 through 4 "
                         "elastic recoveries (~47 s replay each, "
                         "LOGpk256.TXT rows 60-103); 192 covers the "
                         "measured z=0 straddler count with margin "
                         "(VERDICT r3 next-6; fmm.c:774 sizes capacities "
                         "up-front the same way)")
    ap.add_argument("--pm-interlace", default=None,
                    choices=("off", "read", "full"),
                    help="override cfg.pm_interlace (default: the config "
                         "default, 'read').  The 512^3 single-chip smoke "
                         "needs 'off': the second readout's gradient+"
                         "padded fields cost ~4.7 GB at mesh 512 "
                         "(measured 21.8/15.75 GB OOM)")
    ap.add_argument("--theta", type=float, default=None,
                    help="MAC opening angle override (flagship sweep winner)")
    ap.add_argument("--open-cap-levels", default="224,144,144",
                    help="leaf-anchored per-level open-cap schedule "
                         "(deepest internal level first; shallower levels "
                         "reuse the last entry).  The deep levels are "
                         "gather-bound (artifacts/traversal_profile_256."
                         "json: IC occupancy <= 32/row vs the old uniform "
                         "128), so tapered caps carry most of the 9.05 -> "
                         "5.98 s/step cut.  The default is what the "
                         "z=0-clustering elastic recovery settled on in "
                         "the round-4 production run ((96,64,48) tripped "
                         "ONCE at z~6.7 and grew to this; steps 48-100, "
                         "the most clustered, then ran overflow-free) -- "
                         "pre-sizing it makes full runs zero-recovery.  "
                         "'' = uniform --open-cap")
    ap.add_argument("--no-quantized-mac", action="store_true",
                    help="disable the packed u16 fixed-point MAC gathers "
                         "(ops/traversal.pack_node_geometry) and classify "
                         "from full-precision per-axis gathers instead")
    ap.add_argument("--sorted", action="store_true", dest="sorted_state",
                    help="sorted-state stepping: keep particles in tree "
                         "order across steps (kills the unsort scatter)")
    ap.add_argument("--split-step", action="store_true",
                    help="split FMM/PM dispatch (separate AOT stage "
                         "executables).  Round 1 needed this at 256^3 for "
                         "HBM; round 2's memory savings (sorted state, "
                         "halo-free z, bf16 CIC contractions) let the "
                         "fused step fit, and the AOT stage compiler's "
                         "stricter scoped-vmem budget rejects the fused "
                         "read kernel -- so fused is now the default.")
    ap.add_argument("--list-reuse", type=int, default=1,
                    help="rebuild traversal lists every k-th step "
                         "(Verlet skin; implies --sorted)")
    ap.add_argument("--adaptive", choices=["off", "global", "block"],
                    default="off",
                    help="refine macro steps into 2^k KDK substeps: "
                         "'global' one level for all particles, 'block' "
                         "per-particle levels (the reference's vestigial "
                         "inc/adaptive.h:12-20 surface).  Artifact becomes "
                         "pk_<n>_<mode>.json for A/B against fixed steps")
    ap.add_argument("--eta", type=float, default=0.025,
                    help="adaptive accuracy parameter (dt < eta/|levels|)")
    ap.add_argument("--pk-on-cpu", action="store_true",
                    help="measure the P(k) diagnostics through the host "
                         "CPU backend instead of the accelerator: the "
                         "512^3 diagnostic paint is a one-off program "
                         "whose remote compile can cost more than the "
                         "measurement")
    ap.add_argument("--no-snapshots", action="store_true",
                    help="skip snapshot writes (a 512^3 Gadget snapshot "
                         "is ~4.8 GB on disk; smokes don't want it)")
    ap.add_argument("--out", default="artifacts")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from photons_tpu import cosmology
    from photons_tpu.diagnostics import power_spectrum
    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.sim import Simulation

    n = args.n
    n_side = args.mesh_mult * n
    # Adaptive runs get their own log + snapshot names so a new run can
    # never truncate the committed artifact of a previous fixed-step run
    # (utility.c:35-48 keeps one log per run name; VERDICT r3 next-4).
    run_name = f"pk{n}" if args.adaptive == "off" \
        else f"pk{n}_{args.adaptive}"
    cfg = lcdm_config(
        n_part=n ** 3, n_side=n_side, leaf_size=args.leaf_size,
        dtype="float32",
        open_cap_per_node=args.open_cap, p2p_neighbor_cap=args.p2p_cap,
        m2l_cap_per_node=64, cic_straddler_cap=args.cic_straddler_cap,
        fused_step=not args.split_step,
        code_proj=run_name, output_path=args.out, output_name=run_name)
    cfg = cfg.replace(split_scale=args.rs_cells * cfg.boxsize / n_side)
    if args.open_cap_levels:
        cfg = cfg.replace(open_cap_levels=tuple(
            int(x) for x in args.open_cap_levels.split(",")))
    cfg = cfg.replace(traversal_quantized=not args.no_quantized_mac)
    if args.pm_interlace is not None:
        cfg = cfg.replace(pm_interlace=args.pm_interlace)
    print(f"geometry: mesh {n_side}^3, rs = {args.rs_cells} cells "
          f"= {cfg.split_radius:.1f} kpc/h, cutoff = "
          f"{cfg.cutoff_radius:.1f} kpc/h", flush=True)
    if args.theta is not None:
        cfg = cfg.replace(open_angle=args.theta)
    if args.sorted_state or args.list_reuse > 1:
        cfg = cfg.replace(sorted_state=True, list_reuse=args.list_reuse)
    print(f"IC: Zel'dovich EH98 LCDM, N={n}^3, L={cfg.boxsize:g} kpc/h",
          flush=True)
    ic_cache = os.environ.get("PHOTONS_IC_CACHE", "")
    if ic_cache and os.path.exists(ic_cache):
        with np.load(ic_cache) as z:
            pos, vel = z["pos"], z["vel"]
        print(f"IC loaded from cache {ic_cache}", flush=True)
    else:
        pos, vel = ic_zeldovich(cfg, seed=2026, spectral_index="lcdm")
        if ic_cache:
            np.savez(ic_cache, pos=np.asarray(pos, np.float32),
                     vel=np.asarray(vel, np.float32))
            print(f"IC cached to {ic_cache}", flush=True)

    import contextlib

    def pk_ctx():
        if args.pk_on_cpu:
            return jax.default_device(jax.local_devices(backend="cpu")[0])
        return contextlib.nullcontext()

    a0 = cfg.initial_scale_factor
    # the initial P(k) depends only on the (cached) IC: cache it next to
    # the IC cache so large-N smoke retries skip the ~10 min single-core
    # 512^3 paint+FFT (PHOTONS_IC_CACHE=foo.npz -> foo.pk.npz)
    pk_cache = ic_cache + ".pk.npz" if ic_cache else ""
    if pk_cache and os.path.exists(pk_cache):
        with np.load(pk_cache) as z:
            k_i, pk_i = z["k"], z["pk"]
        print(f"P(k) at a={a0:.4f} loaded from {pk_cache}", flush=True)
    else:
        with pk_ctx():
            k_i, pk_i, _ = power_spectrum(pos, cfg.boxsize, n, n_bins=32)
        if pk_cache:
            np.savez(pk_cache, k=np.asarray(k_i), pk=np.asarray(pk_i))
        print(f"P(k) at a={a0:.4f} measured ({len(k_i)} bins)", flush=True)

    sim = Simulation.from_arrays(cfg, pos, vel, engine=args.engine, log=True)
    print(f"engine={args.engine} device={jax.devices()[0].platform} "
          f"steps={args.steps}", flush=True)
    adaptive = {"off": False, "global": True, "block": "block"}[args.adaptive]
    t0 = time.perf_counter()
    sim.run(n_steps=args.steps, a_final=args.a_final,
            snapshot_times=None if args.no_snapshots
            else (0.25, 0.5, args.a_final),
            adaptive=adaptive, eta=args.eta,
            profile_interval=0 if args.no_profile
            else args.profile_interval)
    wall = time.perf_counter() - t0
    print(f"run: {wall:.1f}s total, {wall / args.steps:.2f} s/step",
          flush=True)

    # peak-HBM census (device allocator stats; axon/tpu only)
    hbm = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm = {k: int(v) for k, v in stats.items()
               if k in ("bytes_in_use", "peak_bytes_in_use",
                        "bytes_limit", "largest_alloc_size")}
        if hbm:
            msg = (f"HBM census: peak {hbm.get('peak_bytes_in_use', 0)/2**30:.2f}"
                   f" GiB, in-use {hbm.get('bytes_in_use', 0)/2**30:.2f} GiB"
                   f" of {hbm.get('bytes_limit', 0)/2**30:.2f} GiB")
            print(msg, flush=True)
            if sim.log is not None:
                sim.log.note(msg)
    except Exception:
        pass

    pos_f = np.asarray(sim.state.pos)
    with pk_ctx():
        k_f, pk_f, n_modes = power_spectrum(pos_f, cfg.boxsize, n, n_bins=32)

    d_i = cosmology.growth_factor(a0, cfg.omega_m, cfg.omega_x)
    d_f = cosmology.growth_factor(args.a_final, cfg.omega_m, cfg.omega_x)
    linear = float((d_f / d_i) ** 2)

    if sim.recoveries:
        print(f"WARNING: {sim.recoveries} capacity recoveries during the "
              f"run -- pre-size caps (final: open="
              f"{sim.cfg.open_cap_per_node} p2p={sim.cfg.p2p_neighbor_cap} "
              f"m2l={sim.cfg.m2l_cap_per_node})", flush=True)

    out = {
        "n": n, "boxsize": cfg.boxsize, "a_init": a0,
        "a_final": args.a_final, "steps": args.steps,
        "engine": args.engine, "wall_s": wall,
        "s_per_step": wall / args.steps,
        "mesh_side": n_side, "rs_cells": args.rs_cells,
        "split_radius": cfg.split_radius,
        "pm_gradient": sim.cfg.pm_gradient,
        "pm_interlace": sim.cfg.pm_interlace,
        "recoveries": sim.recoveries,
        "hbm": hbm,
        "adaptive": args.adaptive,
        "max_adaptive_level": int(getattr(sim, "max_adaptive_level", 0)),
        "final_caps": {"open": sim.cfg.open_cap_per_node,
                       "open_levels": list(sim.cfg.open_cap_levels or ()),
                       "p2p": sim.cfg.p2p_neighbor_cap,
                       "m2l": sim.cfg.m2l_cap_per_node,
                       "cic_straddler": sim.cfg.cic_straddler_cap,
                       "cic_tile": sim.cfg.cic_tile,
                       "cic_backend": sim.cfg.cic_backend},
        "k": k_f.tolist(), "n_modes": n_modes.tolist(),
        "pk_init": pk_i.tolist(), "pk_final": pk_f.tolist(),
        "ratio": (pk_f / pk_i).tolist(), "linear": linear,
        "diag": {k: int(v) for k, v in sim.last_diag.items()},
    }

    if args.pm_compare:
        sim_pm = Simulation.from_arrays(cfg.replace(code_proj=f"pk{n}pm"),
                                        pos, vel, engine="pm")
        sim_pm.run(n_steps=args.steps, a_final=args.a_final)
        _, pk_pm, _ = power_spectrum(np.asarray(sim_pm.state.pos),
                                     cfg.boxsize, n, n_bins=32)
        out["pk_pm"] = pk_pm.tolist()
        out["ratio_pm"] = (pk_pm / pk_i).tolist()

    os.makedirs(args.out, exist_ok=True)
    suffix = "" if args.adaptive == "off" else f"_{args.adaptive}"
    path = os.path.join(args.out, f"pk_{n}{suffix}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)

    low = slice(0, 5)
    print(f"linear D^2 growth: {linear:.1f}")
    print("low-k measured ratios:",
          " ".join(f"{r:.1f}" for r in (pk_f / pk_i)[low]))
    if args.pm_compare:
        print("low-k PM-only ratios:",
              " ".join(f"{r:.1f}" for r in (np.asarray(out['pk_pm'])
                                            / pk_i)[low]))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
