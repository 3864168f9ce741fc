"""Measure traversal / tree-build / full-force times on the real TPU.

Usage: python scripts/bench_traversal.py [n_side_cube] [backend]
  n_side_cube: particles per side (default 64 -> 64^3)
  backend: redundant | indexing | jnp (default redundant)

Timing uses the chained-fence trick (axon's block_until_ready is unreliable;
see bench.py): N invocations chained through a data dependence inside one
jit, ended with a scalar host read, minus measured round-trip overhead.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def chain_time(fn, x, n_chain, perturb):
    """Time fn applied n_chain times, chained through its scalar output."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x):
        def body(carry, _):
            out = fn(x + perturb * carry)
            return out, 0.0
        last, _ = jax.lax.scan(body, jnp.asarray(0.0, x.dtype), None,
                               length=n_chain)
        return last

    f0 = jax.jit(lambda v: (v * 2.0).sum())
    small = jnp.ones((8, 8))
    float(f0(small))
    t0 = time.perf_counter()
    for _ in range(3):
        float(f0(small))
    overhead = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    float(chained(x))                    # compile + warm
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x))
        times.append(time.perf_counter() - t0)
    return (min(times) - overhead) / n_chain, compile_s


def main():
    import jax
    import jax.numpy as jnp
    from photons_tpu.config import SimConfig
    from photons_tpu.tree.build import build_tree
    from photons_tpu.ops.traversal import dual_tree_traversal
    from photons_tpu.ops.fmm_engine import fmm_forces

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    backend = sys.argv[2] if len(sys.argv) > 2 else "redundant"
    n = side ** 3
    cfg = SimConfig(boxsize=100000.0, n_side=max(32, side), n_part_total=n,
                    dtype="float32", leaf_size=128,
                    open_cap_per_node=128, p2p_neighbor_cap=96,
                    m2l_cap_per_node=64)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, cfg.boxsize, (n, 3)), jnp.float32)
    print(f"backend={jax.default_backend()} n={n} p2p={backend}", flush=True)

    def trav_only(p):
        tree = build_tree(p, mass=cfg.particle_mass, leaf_size=cfg.leaf_size,
                          lo=0.0, hi=cfg.boxsize)
        lists = dual_tree_traversal(
            tree, theta=cfg.open_angle, cutoff=cfg.cutoff_radius,
            boxsize=cfg.boxsize, open_cap=cfg.open_cap_per_node,
            m2l_cap=cfg.m2l_cap_per_node, p2p_cap=cfg.p2p_neighbor_cap,
            adjacency_eps=1e-9 * cfg.boxsize)
        return (lists.p2p_count + sum(c.sum() for c in lists.m2l_counts)
                ).astype(jnp.float32)

    def force(p):
        acc, diag = fmm_forces(p, cfg, p2p_backend=backend)
        return acc[0, 0]

    t_trav, c1 = chain_time(trav_only, pos, 10, 0.0)
    print(json.dumps({"phase": "tree+traversal", "seconds": t_trav,
                      "compile_s": c1}), flush=True)
    t_force, c2 = chain_time(force, pos, 5, 1e-6)
    print(json.dumps({"phase": "full_fmm_force", "seconds": t_force,
                      "compile_s": c2, "p2p_backend": backend}), flush=True)


if __name__ == "__main__":
    main()
