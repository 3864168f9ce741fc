#!/usr/bin/env python
"""Per-level / per-stage breakdown of the dual-tree traversal on the TPU.

The flagship 256^3 configuration at S=128 spends ~4 s/step in the
traversal (sweep_256_m2r1.75); this pins down WHERE: cumulative prefix
programs over tree levels (differenced, like profiling.ShardedPhaseProfiler)
plus a stage split (candidate gathers / MAC flags / compaction sort) at the
deepest levels, using the real frontier produced by the previous level.

Usage:
    python scripts/profile_traversal.py --n 128 --leaf-size 128
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_tpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--leaf-size", type=int, default=128)
    ap.add_argument("--mesh-mult", type=int, default=2)
    ap.add_argument("--rs-cells", type=float, default=1.75)
    ap.add_argument("--open-cap", type=int, default=128)
    ap.add_argument("--p2p-cap", type=int, default=192)
    ap.add_argument("--theta", type=float, default=0.4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.ops.kernels import min_image as _min_image
    from photons_tpu.ops.traversal import (_row_compact,
                                           acceptance_flags_axes)
    from photons_tpu.tree.build import build_tree

    n = args.n
    cfg = lcdm_config(n_part=n ** 3, n_side=args.mesh_mult * n,
                      leaf_size=args.leaf_size, dtype="float32")
    cfg = cfg.replace(split_scale=args.rs_cells * cfg.boxsize
                      / (args.mesh_mult * n))
    pos, _ = ic_zeldovich(cfg, seed=2026, spectral_index="lcdm")
    tree = jax.block_until_ready(build_tree(
        jnp.asarray(pos, jnp.float32), mass=cfg.particle_mass,
        leaf_size=cfg.leaf_size, lo=0.0, hi=cfg.boxsize))
    depth = tree.depth
    print(f"tree: {tree.n_leaf} leaves, depth {depth}, "
          f"cutoff {cfg.cutoff_radius:.1f}", flush=True)

    theta, cutoff, box = args.theta, cfg.cutoff_radius, cfg.boxsize
    eps = 1e-9 * box

    def level_step(centers, widths, counts, open_src, d, last):
        parent_open = jnp.repeat(open_src, 2, axis=0)
        alive = parent_open >= 0
        left = jnp.where(alive, parent_open * 2, -1)
        right = jnp.where(alive, parent_open * 2 + 1, -1)
        cand = jnp.concatenate([left, right], axis=1)
        valid = cand >= 0
        safe = jnp.maximum(cand, 0)
        dists = tuple(
            _min_image(centers[d + 1][:, None, ax]
                       - centers[d + 1][:, ax][safe], box)
            for ax in range(3))
        w_ts = tuple(widths[d + 1][:, None, ax] for ax in range(3))
        w_ss = tuple(widths[d + 1][:, ax][safe] for ax in range(3))
        flags = acceptance_flags_axes(
            dists, w_ts, w_ss, counts[d + 1][:, None],
            counts[d + 1][safe], theta, cutoff, eps)
        flags = jnp.where(valid, flags, -1)
        kcand = cand.shape[1]
        cap = min(kcand, args.p2p_cap if last else args.open_cap)
        out, cnt, ovf = _row_compact(cand, flags == 0, cap)
        return out, cnt

    def prefix(k):
        def fn(tr):
            open_src = jnp.zeros((1, 1), jnp.int32)
            cnt = jnp.zeros((), jnp.int32)
            for d in range(k):
                open_src, cnt = level_step(tr.centers, tr.widths, tr.counts,
                                           open_src, d, d + 1 == depth)
            return jnp.sum(open_src).astype(jnp.float32) + cnt
        return jax.jit(fn)

    def fence(x):
        float(np.asarray(x).ravel()[0])

    # cumulative per-level timing
    spans = []
    for k in range(1, depth + 1):
        f = prefix(k)
        out = f(tree); fence(out)                      # compile + warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(tree)
        fence(out)
        spans.append((time.perf_counter() - t0) / reps)
        lvl = spans[-1] - (spans[-2] if k > 1 else 0.0)
        print(f"prefix {k:2d}: {spans[-1]*1e3:8.1f} ms  "
              f"(level {k}: {lvl*1e3:+8.1f} ms)", flush=True)

    # stage split at the deepest level, on the REAL frontier
    def upto(k):
        def fn(tr):
            open_src = jnp.zeros((1, 1), jnp.int32)
            for d in range(k):
                open_src, _ = level_step(tr.centers, tr.widths, tr.counts,
                                         open_src, d, False)
            return open_src
        return jax.jit(fn)

    frontier = jax.block_until_ready(upto(depth - 1)(tree))
    d = depth - 1

    def stage_fn(stage):
        def fn(tr, open_src):
            parent_open = jnp.repeat(open_src, 2, axis=0)
            alive = parent_open >= 0
            left = jnp.where(alive, parent_open * 2, -1)
            right = jnp.where(alive, parent_open * 2 + 1, -1)
            cand = jnp.concatenate([left, right], axis=1)
            valid = cand >= 0
            safe = jnp.maximum(cand, 0)
            if stage == "expand":
                return jnp.sum(cand).astype(jnp.float32)
            dists = tuple(
                _min_image(tr.centers[d + 1][:, None, ax]
                           - tr.centers[d + 1][:, ax][safe], box)
                for ax in range(3))
            w_ts = tuple(tr.widths[d + 1][:, None, ax] for ax in range(3))
            w_ss = tuple(tr.widths[d + 1][:, ax][safe] for ax in range(3))
            if stage == "gather":
                return (sum(jnp.sum(x) for x in dists)
                        + sum(jnp.sum(x) for x in w_ss)).astype(jnp.float32)
            flags = acceptance_flags_axes(
                dists, w_ts, w_ss, tr.counts[d + 1][:, None],
                tr.counts[d + 1][safe], theta, cutoff, eps)
            flags = jnp.where(valid, flags, -1)
            if stage == "flags":
                return jnp.sum(flags).astype(jnp.float32)
            out, cnt, _ = _row_compact(cand, flags == 0,
                                       min(cand.shape[1], args.p2p_cap))
            return jnp.sum(out).astype(jnp.float32) + cnt
        return jax.jit(fn)

    stages = {}
    prev = 0.0
    for stage in ("expand", "gather", "flags", "sort"):
        f = stage_fn(stage)
        out = f(tree, frontier); fence(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(tree, frontier)
        fence(out)
        cum = (time.perf_counter() - t0) / reps
        stages[stage] = cum - prev
        prev = cum
        print(f"last-level stage {stage}: cum {cum*1e3:8.1f} ms "
              f"(delta {stages[stage]*1e3:+8.1f} ms)", flush=True)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"traversal_profile_{n}.json")
    with open(path, "w") as fh:
        json.dump({"n": n, "leaf_size": args.leaf_size,
                   "open_cap": args.open_cap, "p2p_cap": args.p2p_cap,
                   "cumulative_s": spans, "last_level_stages_s": stages},
                  fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
