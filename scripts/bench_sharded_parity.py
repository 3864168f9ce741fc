#!/usr/bin/env python
"""Per-chip parity: ShardedSimulation on a 1-device mesh vs the
single-chip Simulation engine at the same scale (VERDICT r2 next-5).

The sharded engine pays for generality (capacity padding, ghost/migration
plumbing, brick-local PM) even on one device; this measures that tax so
"multi-chip per-chip step time" has a denominator.  Steady-state s/step
over chained steps, chained-execution fencing (see bench.py: axon's
block_until_ready can return before remote execution finishes).

Usage:
    python scripts/bench_sharded_parity.py --n 128 --steps 5
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
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--leaf-size", type=int, default=128)
    ap.add_argument("--backend", default="indexing",
                    help="p2p backend for BOTH engines")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh

    from photons_tpu import cosmology
    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.parallel.step import ShardedSimulation
    from photons_tpu.sim import Simulation

    n = args.n
    cfg = lcdm_config(n_part=n ** 3, n_side=n, leaf_size=args.leaf_size,
                      dtype="float32", code_proj=f"parity{n}",
                      output_path=args.out)
    pos, vel = ic_zeldovich(cfg, seed=2026, spectral_index="lcdm")
    a0 = cfg.initial_scale_factor
    a1 = float(np.exp(np.log(a0) + 0.05))
    results = {}

    def steady(run_fn, warm_fn):
        warm_fn()                                # compile + first step
        t0 = time.perf_counter()
        run_fn()
        return (time.perf_counter() - t0) / args.steps

    # ---- single-chip engine (round-2 feature set) ------------------------
    sim = Simulation.from_arrays(
        cfg.replace(sorted_state=True), pos, vel,
        engine=f"fmm-{args.backend}")
    sim.run(n_steps=1, a_final=a1, check_interval=1)
    t0 = time.perf_counter()
    sim.run(n_steps=args.steps, a_final=a1, check_interval=args.steps)
    results["single_chip_s_per_step"] = (time.perf_counter() - t0) / args.steps

    # ---- sharded engine, 1-device mesh ------------------------------------
    mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
    ssim = ShardedSimulation.from_arrays(cfg, mesh, pos, vel,
                                         p2p_backend=args.backend)
    ssim.run(n_steps=1, a_final=a1)
    t0 = time.perf_counter()
    ssim.run(n_steps=args.steps, a_final=a1)
    results["sharded_1dev_s_per_step"] = (time.perf_counter() - t0) / args.steps

    results["ratio"] = (results["sharded_1dev_s_per_step"]
                        / results["single_chip_s_per_step"])
    results.update(n=n, steps=args.steps, leaf_size=args.leaf_size,
                   backend=args.backend,
                   platform=jax.devices()[0].platform)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"sharded_parity_{n}.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
