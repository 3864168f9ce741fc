#!/usr/bin/env python
"""Redundancy-vs-indexing layout study in the CLUSTERED regime
(VERDICT r3 next-8).

The fork's reason to exist (arXiv:2403.01596) is the P2P data-layout
tradeoff: pre-gathered redundant streams vs in-kernel index gathers.
Round 3 compared the layouts only on uniform particle sets -- and
discovered the redundant stream cannot even run the packaged merger's
Plummer cores (its (nleaf, 3, K*S) source copies scale with the widest
neighbor row; 19.3 GB at p2p_cap 384).  This sweep measures the kernel
rate of redundant / indexing / K-bucketed hybrid (ops/p2p_pallas.
p2p_hybrid) across a clustering ladder, reporting the neighbor-row
distribution (K mean/p99/max) alongside, so the crossover is explicit.

Usage:
    python scripts/bench_hybrid.py --n 64 --steps 3
    python scripts/bench_hybrid.py --n 128            # the study
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_state(kind, n_part, L, rng):
    """Particle sets on a clustering ladder."""
    if kind == "uniform":
        return rng.uniform(0, L, (n_part, 3))
    frac = 0.5                             # half the mass in clusters
    n_cl = int(n_part * frac)
    n_bg = n_part - n_cl
    sigma = {"mild": 0.10, "strong": 0.03, "extreme": 0.012}[kind]
    k_clusters = 8
    centers = rng.uniform(0.15 * L, 0.85 * L, (k_clusters, 3))
    which = rng.integers(0, k_clusters, n_cl)
    blob = centers[which] + rng.normal(0.0, sigma * L, (n_cl, 3))
    return np.concatenate([rng.uniform(0, L, (n_bg, 3)),
                           np.mod(blob, L)])


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=128, help="particles per side")
    ap.add_argument("--leaf-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5,
                    help="timed kernel invocations (chained, one fence)")
    ap.add_argument("--p2p-cap", type=int, default=320)
    ap.add_argument("--redundant-cap", type=int, default=128,
                    help="neighbor_cap for the pure-redundant engine: its "
                         "pre-gathered stream is (nleaf, 3, cap*S) -- the "
                         "full study cap is 8 GB at 128^3/cap 320 "
                         "(compile OOM).  Rows wider than this overflow "
                         "honestly (the layout's documented limit)")
    ap.add_argument("--threshold", type=int, default=64)
    ap.add_argument("--kinds", default="uniform,mild,strong,extreme")
    ap.add_argument("--engines", default="redundant,indexing,hybrid")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="artifacts/hybrid_study.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from photons_tpu.config import SimConfig
    from photons_tpu.ops.p2p_pallas import p2p_hybrid, p2p_pallas
    from photons_tpu.ops.traversal import dual_tree_traversal
    from photons_tpu.tree.build import build_tree

    n = args.n
    n_part = n ** 3
    L = 100000.0
    rng = np.random.default_rng(99)
    cfg = SimConfig(boxsize=L, n_side=2 * n, n_part_total=n_part,
                    dtype="float32", leaf_size=args.leaf_size,
                    periodic=True, longshort=True,
                    p2p_neighbor_cap=args.p2p_cap,
                    open_cap_per_node=256, m2l_cap_per_node=64)
    cfg = cfg.replace(split_scale=1.75 * cfg.boxsize / (2 * n))
    rs, cutoff = cfg.split_radius, cfg.cutoff_radius
    results = []

    # clustered tiers need fatter static caps (measured: strong/extreme
    # overflow the uniform-tier 256/320).  'extreme' (>1536 rows/leaf)
    # exceeds ANY affordable single-pass table: it runs the segmented
    # multi-pass instead (dual_tree_traversal p2p_segment -- the
    # reference's LEN_TASK flush loop as a space-slice,
    # 2_Redundant/src/fmm.c:921,377-418), bounded to (nleaf, 512)/pass.
    # (open_cap, p2p_cap, m2l_cap): extreme's collapsed blobs ALSO
    # produce accepted M2L pairs far beyond the uniform tiers' counts
    # (measured bits=6 overflow at m2l 64)
    kind_caps = {"uniform": (256, 320, 64), "mild": (256, 320, 64),
                 "strong": (768, 1024, 64), "extreme": (2048, 512, 256)}
    from photons_tpu.ops.traversal import OVF_M2L, OVF_OPEN, OVF_P2P
    for kind in args.kinds.split(","):
        open_cap, p2p_cap, m2l_cap = kind_caps.get(
            kind, (256, args.p2p_cap, 64))
        pos = jnp.asarray(make_state(kind, n_part, L, rng), jnp.float32)
        tree = jax.block_until_ready(build_tree(
            pos, mass=cfg.particle_mass, leaf_size=cfg.leaf_size,
            lo=0.0, hi=L))

        def traverse(segment=0):
            return dual_tree_traversal(
                tree, theta=cfg.open_angle, cutoff=cutoff, boxsize=L,
                open_cap=open_cap, m2l_cap=m2l_cap,
                p2p_cap=p2p_cap, quant_bounds=(0.0, L),
                p2p_segment=segment)

        lists = jax.block_until_ready(traverse())
        bits = int(lists.overflow_bits)
        if bits & (OVF_OPEN | OVF_M2L):
            # internal frontier/m2l truncation: results would be
            # INCOMPLETE at any segment -- a real capacity error
            print(f"{kind}: internal traversal overflow (bits={bits}) at "
                  f"caps {open_cap}/{p2p_cap} -- recording and skipping",
                  flush=True)
            results.append({"kind": kind, "error": "traversal overflow",
                            "overflow_bits": bits})
            continue
        segments = [lists]
        while bool(segments[-1].overflow):
            # leaf rows wider than p2p_cap: collect the next space-slice
            segments.append(jax.block_until_ready(
                traverse(segment=len(segments))))
        n_seg = len(segments)
        if n_seg > 1:
            print(f"{kind}: segmented multi-pass, {n_seg} passes at "
                  f"p2p_cap {p2p_cap}", flush=True)
        rows = sum(np.asarray((ls.p2p >= 0).sum(axis=1))
                   for ls in segments)
        pairs = int(rows.sum()) * cfg.leaf_size ** 2
        kstats = {"k_mean": float(rows.mean()),
                  "k_p99": float(np.percentile(rows, 99)),
                  "k_max": int(rows.max()),
                  "frac_over_threshold":
                      float((rows > args.threshold).mean())}
        print(f"--- {kind}: n_p2p={rows.sum()} K mean={kstats['k_mean']:.0f}"
              f" p99={kstats['k_p99']:.0f} max={kstats['k_max']}"
              f" frac>thr={kstats['frac_over_threshold']:.3f}", flush=True)

        # multi-pass cost accounting: each extra segment pays a re-walk
        # of the traversal (the space-slice price); measure it once
        seg_walk = 0.0
        if n_seg > 1:
            t0 = time.perf_counter()
            for s in range(1, n_seg):
                jax.block_until_ready(traverse(segment=s))
            seg_walk = time.perf_counter() - t0

        for engine in args.engines.split(","):
            def run_once(ls):
                if engine == "hybrid":
                    acc, ovf = p2p_hybrid(
                        tree, ls, cfg.particle_mass, cfg.soften_scale,
                        rs, L, k_threshold=args.threshold, cutoff=cutoff)
                else:
                    acc, ovf = p2p_pallas(
                        tree, ls, cfg.particle_mass, cfg.soften_scale,
                        rs, L, layout=engine,
                        neighbor_cap=args.redundant_cap
                        if engine == "redundant" else None,
                        cutoff=cutoff if engine == "indexing" else None)
                return acc, ovf
            f = jax.jit(run_once)
            try:
                outs = [jax.block_until_ready(f(ls)) for ls in segments]
                truncated = any(bool(np.asarray(o[1])) for o in outs)
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    for ls in segments:
                        out, ovf = f(ls)
                float(jnp.sum(out[0, 0]))               # chained fence
                dt = (time.perf_counter() - t0) / args.steps
            except Exception as e:
                msg = f"{type(e).__name__}: {e}"[:200]
                print(f"{kind}/{engine}: FAILED {msg}", flush=True)
                results.append({"kind": kind, "engine": engine,
                                "error": msg, **kstats})
                gc.collect()
                continue
            rate = pairs / dt
            print(f"{kind}/{engine}: {dt*1e3:.1f} ms kernel"
                  f" (+{seg_walk*1e3:.0f} ms walk/step for {n_seg} passes),"
                  f" {rate:.3e} pairs/s"
                  f"{' TRUNCATED (cap overflow)' if truncated else ''}",
                  flush=True)
            results.append({"kind": kind, "engine": engine,
                            "seconds": dt, "pairs": pairs,
                            "pairs_per_sec": rate,
                            "n_passes": n_seg,
                            "seg_walk_seconds": seg_walk,
                            "truncated": truncated, **kstats})
            gc.collect()
        del tree, lists, segments, pos
        gc.collect()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump({"n": n, "leaf_size": args.leaf_size,
                   "p2p_cap": args.p2p_cap, "threshold": args.threshold,
                   "results": results}, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
