"""North-star benchmark: P2P pair-interactions per second per chip.

Measures the Pallas P2P kernels on realistic TreePM workloads (Morton
tree + traversal interaction lists, Ewald-damped softened kernel,
float32) in BOTH layouts of the reference study (arXiv:2403.01596):

  * 32^3 demo scale, redundant layout  (round-1 headline configuration)
  * 128^3 production scale (N=2.1M), redundant AND indexing layouts --
    the scale where the layouts swap ranks (BENCH_NOTES.md)

Prints ONE JSON line (the best measured configuration) to stdout;
per-configuration rates go to stderr and artifacts/bench_detail.json.
vs_baseline is against the BASELINE.md target of 1e10 pairs/s/chip.

Timing note: the axon remote platform dispatches asynchronously and
block_until_ready can return before execution, so the benchmark chains N
kernel invocations through a data dependence inside one jit and forces a
scalar host read -- the only reliable fence -- then subtracts the measured
round-trip overhead.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

# run-scoped logs: bench invocations must not clobber the committed
# artifacts/LOG*.TXT evidence (utils/logging.RunLog honors this env)
os.environ.setdefault("PHOTONS_LOG_DIR",
                      tempfile.mkdtemp(prefix="photons_bench_logs_"))


def _build_workload(n_side: int, leaf_size: int):
    """Uniform box at one particle per mesh cell: tree + traversal tables."""
    import jax.numpy as jnp
    from photons_tpu.config import SimConfig
    from photons_tpu.tree.build import build_tree
    from photons_tpu.ops.traversal import dual_tree_traversal

    cfg = SimConfig(boxsize=100000.0, n_side=n_side,
                    n_part_total=n_side**3, dtype="float32",
                    leaf_size=leaf_size,
                    open_cap_per_node=128, p2p_neighbor_cap=96)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, cfg.boxsize, (cfg.n_part_total, 3)),
                      jnp.float32)
    tree = build_tree(pos, mass=cfg.particle_mass, leaf_size=cfg.leaf_size,
                      lo=0.0, hi=cfg.boxsize)
    lists = dual_tree_traversal(
        tree, theta=cfg.open_angle, cutoff=cfg.cutoff_radius,
        boxsize=cfg.boxsize, open_cap=cfg.open_cap_per_node,
        m2l_cap=cfg.m2l_cap_per_node, p2p_cap=cfg.p2p_neighbor_cap,
        adjacency_eps=1e-9 * cfg.boxsize)

    # the traversal emits the per-leaf neighbor table directly; tighten the
    # column count to the measured max partner count (the production engine
    # buckets this and recompiles on overflow)
    table_np = np.asarray(lists.p2p)
    max_cnt = int((table_np >= 0).sum(axis=1).max())
    cap = -(-max_cnt // 8) * 8
    table = jnp.asarray(table_np[:, :cap])
    n_pairs_leaf = int(jnp.sum(table >= 0))
    return cfg, tree, table, n_pairs_leaf


def _overhead():
    import jax
    import jax.numpy as jnp
    f0 = jax.jit(lambda x: (x * 2.0).sum())
    xsmall = jnp.ones((8, 8))
    float(f0(xsmall))
    t0 = time.perf_counter()
    for _ in range(3):
        float(f0(xsmall))
    return (time.perf_counter() - t0) / 3


def _time_chained(fn, args, n_chain: int, overhead: float):
    import jax

    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            return carry + 0.0 * out[:1, :1, :1], out[0, 0, 0]
        carry, last = jax.lax.scan(body, a[0], None, length=n_chain)
        return last.sum()

    float(chained(*args))                        # warm / compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append(time.perf_counter() - t0)
    return max(1e-9, (min(times) - overhead) / n_chain)


def measure_redundant(n_side: int, leaf_size: int, n_chain: int,
                      overhead: float, on_tpu: bool):
    """Redundant layout: pre-packed per-task source stream
    (ComputeP2PDualNaive parity, 2_Redundant/src/photoNs_CUDA.cu:225-309)."""
    import jax.numpy as jnp
    from photons_tpu.ops.p2p_pallas import pack_redundant, p2p_redundant, LANES

    cfg, tree, table, n_pairs_leaf = _build_workload(n_side, leaf_size)
    s = tree.pos.shape[1]
    planes = jnp.moveaxis(tree.pos, -1, 1)
    masses = jnp.where(tree.mask, cfg.particle_mass, 0.0).astype(jnp.float32)
    centers = tree.centers[-1]
    src_p, src_m = pack_redundant(planes, masses, table, s, centers=centers,
                                  boxsize=cfg.boxsize)
    tgt_rel = planes - centers[:, :, None]
    used = jnp.sum(table >= 0, axis=1) * s
    chunk_counts = -(-used // LANES)
    eps, rs = cfg.soften_scale, cfg.split_radius

    def fn(tgt, masses, src_p, src_m):
        return p2p_redundant(tgt, masses, src_p, src_m, eps=eps, rs=rs,
                             boxsize=cfg.boxsize, chunk_counts=chunk_counts,
                             interpret=not on_tpu)

    per_call = _time_chained(fn, (tgt_rel, masses, src_p, src_m),
                             n_chain, overhead)
    return n_pairs_leaf * s * s / per_call


def measure_indexing(n_side: int, leaf_size: int, n_chain: int,
                     overhead: float, on_tpu: bool):
    """Indexing layout: in-kernel double-buffered HBM DMA gather through
    the leaf-pair table (ComputeP2PIndexing parity,
    1_Indexing/src/photoNs_CUDA.cu:250-387)."""
    import jax.numpy as jnp
    from photons_tpu.ops.p2p_pallas import p2p_indexing

    cfg, tree, table, n_pairs_leaf = _build_workload(n_side, leaf_size)
    s = tree.pos.shape[1]
    planes = jnp.moveaxis(tree.pos, -1, 1)
    masses = jnp.where(tree.mask, cfg.particle_mass, 0.0).astype(jnp.float32)
    eps, rs = cfg.soften_scale, cfg.split_radius

    def fn(planes, masses, table):
        return p2p_indexing(planes, masses, table, eps=eps, rs=rs,
                            boxsize=cfg.boxsize, interpret=not on_tpu)

    per_call = _time_chained(fn, (planes, masses, table), n_chain, overhead)
    return n_pairs_leaf * s * s / per_call


def main():
    import jax

    on_tpu = jax.default_backend() == "tpu"
    overhead = _overhead()
    results = []

    def run(label, f, *a, scale="production"):
        try:
            rate = f(*a, overhead=overhead, on_tpu=on_tpu)
        except Exception as e:                  # record, keep benching
            print(f"bench {label}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            return
        results.append({"config": label, "rate": rate, "scale": scale})
        print(f"bench {label}: {rate:.3e} pairs/s", file=sys.stderr)

    # demo scale (detail row): tight-cap tables flatter the redundant
    # layout; the layout study (artifacts/hybrid_study.json) shows it
    # loses at study-wide caps, so this is NOT headline-eligible
    run("32^3 S=128 redundant", measure_redundant, 32, 128, 30,
        scale="demo")
    if on_tpu:
        # production scale: the redundancy-vs-indexing tradeoff pair
        run("128^3 S=128 redundant", measure_redundant, 128, 128, 8)
        run("128^3 S=128 indexing", measure_indexing, 128, 128, 8)

    try:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/bench_detail.json", "w") as fh:
            json.dump(results, fh, indent=1)
    except OSError:
        pass

    # headline = best PRODUCTION-scale configuration (VERDICT r3 weak-5:
    # the demo-scale tight-cap redundant rate is kept as a detail row
    # but must not headline -- it does not survive realistic caps)
    prod = [r for r in results if r["scale"] == "production"]
    best = max(prod or results, key=lambda r: r["rate"])
    out = {
        "metric": "p2p_pair_interactions_per_sec_per_chip",
        "value": best["rate"],
        "unit": "pairs/s",
        "vs_baseline": best["rate"] / 1e10,
        "config": best["config"],
    }
    if not prod:
        # no production-scale row ran (non-TPU host): say so explicitly so
        # the demo-scale tight-cap rate can never be read as a production
        # number (ADVICE round 4)
        out["scale"] = "demo"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
