#!/usr/bin/env python
"""MXU-form P2P tile experiment (VERDICT r4 weak-6: the kernel-rate
plateau should be a decision, not a drift).

The production ``_pair_force_tile`` is pure-VPU: per pair it pays the
min-image wrap (9 ops), the direct r^2 (8), the screened factor (~12) and
the f*dx accumulation (~6).  Two of those blocks are bilinear forms the
MXU can absorb:

  r^2_ij = |t_i|^2 + |s_j|^2 - 2 t_i.s_j        (one (3,S)x(3,C) matmul)
  a_i    = sum_j F_ij (s_j - t_i)
         = (F m) @ S3 - rowsum(F m) * t_i       (one (S,C)x(C,3) matmul)

leaving only the screened-factor chain (rsqrt/exp/poly) on the VPU.  The
combined-row layout [x|y|z|m] makes both matmul operands free reshapes of
data already in VMEM -- no transposes.

Caveat measured here: the bilinear r^2 is incompatible with PER-PAIR
min-image wrapping, so this tile requires block-level pre-shifted sources
(the per-leaf-pair image offset is a table-side 6-bit pack, applied once
per source block).  The A/B below therefore runs BOTH tiles open-boundary
(boxsize=None) on the 128^3 production workload -- identical physics,
identical harness (p2p_indexing_rows), only the tile differs.

Usage:  python scripts/bench_mxu_tile.py            # real TPU
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def _pair_force_tile_mxu(tx, ty, tz, sx, sy, sz, sm, eps, rs, boxsize):
    """MXU-form (S, C) tile: bilinear r^2 + matmul accumulation.

    Requires boxsize None (pre-shifted sources).  Returns (ax, ay, az).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax
    from photons_tpu.ops.p2p_pallas import _erfc_exp, _INV_SQRT_PI

    assert boxsize is None, "MXU tile needs block-pre-shifted sources"
    s = tx.shape[0]
    c = sx.shape[0]
    t3 = jnp.concatenate([tx, ty, tz]).reshape(3, s)
    s3 = jnp.concatenate([sx, sy, sz]).reshape(3, c)
    ts = lax.dot_general(t3, s3, (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)   # (S, C) MXU
    t2 = (tx * tx + ty * ty + tz * tz)[:, None]
    s2 = (sx * sx + sy * sy + sz * sz)[None, :]
    r2 = jnp.maximum(t2 + s2 - 2.0 * ts, 0.0)
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
    r = r2 * inv_r
    inv_r3 = inv_r * inv_r * inv_r
    inv_r3 = jnp.where(r < eps, 1.0 / (eps * eps * eps), inv_r3)
    if rs is not None:
        ec, e = _erfc_exp((0.5 / rs) * r)
        inv_r3 = inv_r3 * (ec + (r * (_INV_SQRT_PI / rs)) * e)
    fm = jnp.where(r2 > 0, sm[None, :] * inv_r3, 0.0)          # (S, C)
    acc = lax.dot_general(fm, s3, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # (S, 3) MXU
    tot = jnp.sum(fm, axis=1)
    return (acc[:, 0] - tot * tx, acc[:, 1] - tot * ty,
            acc[:, 2] - tot * tz)


def main():
    import jax
    import jax.numpy as jnp
    from photons_tpu.ops.p2p_pallas import (_pair_force_tile, _leaf_blocks,
                                            neighbor_table)
    from photons_tpu.ops.p2p_pallas_indexing import (p2p_indexing_rows,
                                                     pack_combined_rows)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib
    bench = importlib.import_module("bench")  # repo-root bench.py helpers
    _build_workload = bench._build_workload
    _overhead = bench._overhead
    _time_chained = bench._time_chained

    on_tpu = jax.default_backend() == "tpu"
    cfg, tree, table, n_pairs_leaf = _build_workload(128, 128)
    s = tree.pos.shape[1]
    planes = jnp.moveaxis(tree.pos, -1, 1)
    masses = jnp.where(tree.mask, cfg.particle_mass, 0.0).astype(jnp.float32)
    combined = pack_combined_rows(planes, masses)
    eps, rs = cfg.soften_scale, cfg.split_radius
    overhead = _overhead()

    out = {"n_side": 128, "leaf_size": s, "n_pairs": n_pairs_leaf * s * s,
           "boxsize": None, "backend": "indexing-rows"}
    rows = {}
    for name, tile in (("vpu", _pair_force_tile),
                       ("mxu", _pair_force_tile_mxu)):
        def fn(combined, table, tile=tile):
            return p2p_indexing_rows(
                combined, table, s, eps=eps, rs=rs, boxsize=None,
                pair_tile=tile, interpret=not on_tpu)[:, None, :]

        acc = np.asarray(fn(combined, table)[:, 0, :])
        rows[name] = acc
        per_call = _time_chained(lambda c, t, f=fn: f(c, t),
                                 (combined, table), 30, overhead)
        rate = n_pairs_leaf * s * s / per_call
        out[f"rate_{name}"] = rate
        print(f"{name}: {rate:.3e} pairs/s ({per_call*1e3:.2f} ms/call)",
              file=sys.stderr, flush=True)

    ref, test = rows["vpu"][:, :3 * s], rows["mxu"][:, :3 * s]
    scale = float(np.abs(ref).max())
    out["max_abs_dev_rel"] = float(np.abs(test - ref).max() / scale)
    out["speedup"] = out["rate_mxu"] / out["rate_vpu"]
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/mxu_tile_ab.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
