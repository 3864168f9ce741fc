#!/usr/bin/env python
"""Sub-phase profile of the tree-riding Pallas PM path (pm_from_tree) at
production scale: where do the ~2.5 s at 256^3 actually go?

Stages (ops/fmm_engine.py pm_from_tree):
  origins   brick_origins        per-leaf brick anchor + fits flag
  paint     paint_leaves         Pallas CIC scatter into padded bricks
  fold      fold_halos           halo fold -> global density mesh
  fft       pm_potential         fwd FFT x Green x inv FFT
  grad      gradient_4th         4th-order finite-difference gradient
  pad       pad_periodic x3      ghost planes for readout
  read      read_leaves          Pallas CIC gather of 3 force fields
  total     pm_from_tree         the whole fused stage

Timing: chained scan inside one jit + scalar host read (axon fence, see
bench.py), minus measured round-trip overhead.

Usage:  python scripts/profile_pm.py --n 256 --leaf-size 256
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_chained(fn, args, n_chain, overhead):
    """fn(*args) -> array; first arg must be a float array the chain can
    perturb (prevents XLA hoisting the loop-invariant body)."""
    import jax

    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            probe = out.ravel()[:1].astype(carry.dtype)
            return carry + 0.0 * probe.reshape((1,) * carry.ndim), probe[0]
        carry, last = jax.lax.scan(body, a[0], None, length=n_chain)
        return last.sum()

    float(chained(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append(time.perf_counter() - t0)
    return max(1e-9, (min(times) - overhead) / n_chain)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--leaf-size", type=int, default=256)
    ap.add_argument("--chain", type=int, default=6)
    ap.add_argument("--mesh-mult", type=int, default=1,
                    help="PM mesh side = mesh_mult * n (split-geometry)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.tree.build import build_tree
    from photons_tpu.ops.fmm_engine import pm_from_tree
    from photons_tpu.pm.cic_pallas import (brick_origins, effective_tile,
                                           fold_halos, pad_periodic,
                                           paint_leaves, read_leaves)
    from photons_tpu.pm.solver import (gradient_4th, green_function_traced,
                                       pm_potential)

    n = args.n
    cfg = lcdm_config(n_part=n ** 3, n_side=args.mesh_mult * n,
                      leaf_size=args.leaf_size, dtype="float32")
    pos, _ = ic_zeldovich(cfg, seed=2026, spectral_index="lcdm")
    tree = build_tree(jnp.asarray(pos, jnp.float32), mass=cfg.particle_mass,
                      leaf_size=cfg.leaf_size, lo=0.0, hi=cfg.boxsize)
    # built in-trace: a captured 512^3 gf array inlines ~270 MB of HLO
    # literal (remote compile rejects it, HTTP 413)
    gf = None
    box, n_side = cfg.boxsize, cfg.n_side
    tile = effective_tile(n_side, cfg.cic_tile)

    # stage inputs (materialized once)
    origins, fits = jax.block_until_ready(
        jax.jit(lambda p, m: brick_origins(p, m, n_side, tile, box))(
            tree.pos, tree.mask))
    wts = jnp.where(tree.mask & fits[:, None], 1.0, 0.0).astype(jnp.float32)
    padded = jax.jit(lambda p, w, o: paint_leaves(p, w, o, n_side, tile,
                                                  box))(tree.pos, wts, origins)
    dens = jax.jit(lambda pd: fold_halos(pd, n_side)
                   * (cfg.particle_mass * (n_side / box) ** 3))(padded)
    dens = jax.lax.optimization_barrier(dens.reshape(-1)).reshape(
        n_side, n_side, n_side)
    phi = jax.jit(lambda d: pm_potential(d, green_function_traced(
        cfg.n_side, cfg.boxsize, cfg.split_radius, dtype=d.dtype)))(dens)
    grad = jax.jit(lambda p: gradient_4th(p, box))(phi)
    fields = jax.jit(lambda g: tuple(pad_periodic(g[..., c], n_side)
                                     for c in range(3)))(grad)
    jax.block_until_ready((padded, dens, phi, grad, fields))

    # fence overhead
    f0 = jax.jit(lambda x: (x * 2.0).sum())
    xs = jnp.ones((8, 8))
    float(f0(xs))
    t0 = time.perf_counter()
    for _ in range(5):
        float(f0(xs))
    overhead = (time.perf_counter() - t0) / 5
    print(f"fence overhead {overhead*1e3:.1f} ms", flush=True)

    k = args.chain
    out = {}

    def run(label, fn, *a):
        try:
            dt = time_chained(fn, a, k, overhead)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
            return
        out[label] = dt
        print(f"{label:8s} {dt*1e3:8.1f} ms", flush=True)

    run("origins", lambda p, m: brick_origins(p, m, n_side, tile, box)[0],
        tree.pos, tree.mask)
    run("paint", lambda p, w, o: paint_leaves(p, w, o, n_side, tile, box),
        tree.pos, wts, origins)
    run("fold", lambda pd: fold_halos(pd, n_side), padded)
    run("fft", lambda d: pm_potential(d, green_function_traced(
        cfg.n_side, cfg.boxsize, cfg.split_radius, dtype=d.dtype)), dens)
    run("grad", lambda p: gradient_4th(p, box), phi)
    run("pad", lambda g: pad_periodic(g[..., 0], n_side), grad)
    run("read", lambda p, f0_, f1, f2, o: read_leaves(
        p, (f0_, f1, f2), o, n_side, tile, box),
        tree.pos, fields[0], fields[1], fields[2], origins)
    import functools
    gf_thunk = functools.partial(green_function_traced, cfg.n_side,
                                 cfg.boxsize, cfg.split_radius,
                                 dtype=jnp.float32)
    run("total", lambda p: pm_from_tree(
        build_tree(p, mass=cfg.particle_mass, leaf_size=cfg.leaf_size,
                   lo=0.0, hi=box), cfg, gf_thunk)[0],
        tree.pos.reshape(-1, 3))

    os.makedirs("artifacts", exist_ok=True)
    tag = f"{n}" if args.mesh_mult == 1 else f"{n}_m{args.mesh_mult}"
    with open(f"artifacts/pm_profile_{tag}.json", "w") as fh:
        json.dump({"n": n, "leaf_size": args.leaf_size,
                   "mesh_side": cfg.n_side,
                   "seconds": out}, fh, indent=1)
    print("wrote", f"artifacts/pm_profile_{tag}.json", flush=True)


if __name__ == "__main__":
    main()
