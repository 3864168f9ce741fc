#!/usr/bin/env python
"""Multi-chip evidence beyond toys (VERDICT r3 next-8).

Two artifacts, both on the virtual-CPU device mesh (the de-facto ICI
stand-in, SURVEY.md section 4 implication 5):

A. ``--part a`` (artifacts/multichip_64.json): 64^3 (262k) Zel'dovich
   IC stepped on a 2x4 8-device mesh at the SHIPPED production
   configuration (rs = 2.0 cells, caps 224,144,144 / 256 / 288,
   shard_capacity_factor 1.25) vs the single-chip engine on the same
   IC: P(k) parity per bin, zero overflow, zero recoveries, per-shard
   occupancy recorded.  This is the scaled-up version of the N=1024
   dryrun (reference analogue: multi-rank demo runs, domains.c:86-144,
   remotes.c:740-809).

B. ``--part b`` (artifacts/multichip_512shape.json): ONE step of the
   2x2-brick plan at the 512^3-run mesh geometry (n_side = 1024 pencil
   FFT, brick-local PM patches, ghost exchange) with a small particle
   load -- compiles and executes the exact sharded program shapes the
   4-chip 512^3 production plan needs (BENCH_NOTES), minus only the
   particle count.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/multichip_evidence.py --part a --steps 6
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python scripts/multichip_evidence.py --part b
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def shipped_cfg(lcdm_config, n: int, mesh_mult: int = 2, **kw):
    """The run_pk_parity shipped flagship configuration, scaled to n."""
    n_side = mesh_mult * n
    cfg = lcdm_config(n_part=n ** 3, n_side=n_side, leaf_size=128,
                      dtype="float32", **kw)
    return cfg.replace(
        split_scale=2.0 * cfg.boxsize / n_side,
        open_cap_per_node=256, p2p_neighbor_cap=288, m2l_cap_per_node=64,
        open_cap_levels=(224, 144, 144), traversal_quantized=True,
        cic_straddler_cap=192, shard_capacity_factor=1.25,
        sorted_state=False)


def part_a(args):
    import jax
    from jax.sharding import Mesh

    from photons_tpu import cosmology
    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.parallel.step import ShardedSimulation
    from photons_tpu.sim import Simulation

    n = args.n
    cfg = shipped_cfg(lcdm_config, n, code_proj=f"mc{n}",
                      output_path=args.out)
    pos, vel = ic_zeldovich(cfg, seed=2026, spectral_index="lcdm")
    a0 = cfg.initial_scale_factor
    # the production run's log-a grid, truncated to --steps
    loga = np.linspace(np.log(a0), 0.0, 100 + 1)[:args.steps + 1]
    a_final = float(np.exp(loga[-1]))

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("x", "y"))
    t0 = time.perf_counter()
    sim = ShardedSimulation.from_arrays(cfg, mesh, pos, vel,
                                        p2p_backend=args.backend)
    sim.run(args.steps, a_final, log=False)
    wall_sharded = time.perf_counter() - t0
    k, pk_s, nm = sim.power_spectrum()
    occ = sim.occupancy()
    recoveries = sim.recoveries

    t0 = time.perf_counter()
    ssim = Simulation.from_arrays(cfg.replace(n_devices=1), pos, vel,
                                  engine=f"fmm-{args.backend}")
    ssim.run(args.steps, a_final=a_final)
    wall_single = time.perf_counter() - t0
    from photons_tpu.diagnostics import power_spectrum
    k1, pk_1, _ = power_spectrum(np.asarray(ssim.state.pos), cfg.boxsize,
                                 cfg.n_side)

    ratio = np.asarray(pk_s) / np.maximum(np.asarray(pk_1), 1e-30)
    valid = np.asarray(pk_1) > 0
    dev = float(np.abs(ratio[valid] - 1.0).max())
    out = {
        "n": n, "steps": args.steps, "mesh": "2x4", "backend": args.backend,
        "a_final": a_final,
        "pk_ratio_max_abs_dev": dev,
        "recoveries": int(recoveries),
        "capacity_factor": cfg.shard_capacity_factor,
        "occupancy_per_shard": [float(x) for x in np.asarray(occ).ravel()],
        "wall_sharded_s": wall_sharded, "wall_single_s": wall_single,
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"multichip_{n}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({kk: out[kk] for kk in
                      ("pk_ratio_max_abs_dev", "recoveries", "steps")}))
    print(f"wrote {path}")
    assert dev < args.pk_tol, f"P(k) parity {dev} > {args.pk_tol}"
    assert recoveries == 0, "expected a zero-recovery run at 1.25x"


def part_b(args):
    import jax
    from jax.sharding import Mesh

    from photons_tpu import cosmology
    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.parallel.step import ShardedSimulation

    # the 512^3 plan's geometry on 2x2 bricks; particle load shrunk
    # (shapes, not throughput, are what a CPU can de-risk).  Default
    # mesh 512 = the single-chip 512^3 smoke geometry (mesh_mult 1,
    # BENCH_NOTES HBM budget); the budget-geometry mesh 1024 CANNOT be
    # emulated on this 1-vCPU host: XLA:CPU's collective rendezvous
    # hard-terminates after 40 s (rendezvous.cc, no flag), and one core
    # serializing four shards' multi-GB pencil-FFT chunks starves the
    # permute (measured crash at op_id=1) -- a virtual-device artifact,
    # not a program property; mesh-1024 shapes need >= 4 real cores or
    # chips.
    n_part = args.nb ** 3
    cfg = lcdm_config(n_part=n_part, n_side=args.nside, leaf_size=128,
                      dtype="float32", code_proj="mc512shape",
                      output_path=args.out)
    cfg = cfg.replace(
        split_scale=2.0 * cfg.boxsize / args.nside,
        open_cap_per_node=256, p2p_neighbor_cap=288, m2l_cap_per_node=64,
        open_cap_levels=(224, 144, 144), traversal_quantized=True,
        cic_straddler_cap=192, shard_capacity_factor=1.25)
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, cfg.boxsize, (n_part, 3)).astype(np.float32)
    vel = np.zeros_like(pos)

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    a0 = cfg.initial_scale_factor
    a1 = float(np.exp(np.log(a0) + (0.0 - np.log(a0)) / 100))
    t0 = time.perf_counter()
    sim = ShardedSimulation.from_arrays(cfg, mesh, pos, vel,
                                        p2p_backend=args.backend)
    sim.run(1, a1, log=False)
    wall = time.perf_counter() - t0
    from photons_tpu.parallel.step import gather_state
    gpos, _, _ = gather_state(sim.state)
    finite = bool(np.isfinite(np.asarray(gpos)).all())
    out = {"mesh": "2x2", "n_side": args.nside, "n_part": n_part,
           "rs_cells": 2.0, "wall_first_step_s": wall,
           "recoveries": int(sim.recoveries),
           "finite": finite, "backend": args.backend}
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "multichip_512shape.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--part", choices=("a", "b"), required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--nb", type=int, default=32,
                    help="part b: particles per side (shapes only)")
    ap.add_argument("--nside", type=int, default=512,
                    help="part b: PM mesh side (512 = the single-chip "
                         "512^3 smoke geometry; 1024 needs real cores, "
                         "see part_b notes)")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--backend", default="indexing")
    ap.add_argument("--pk-tol", type=float, default=0.02)
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.part == "a":
        part_a(args)
    else:
        part_b(args)


if __name__ == "__main__":
    main()
