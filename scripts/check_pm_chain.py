#!/usr/bin/env python
"""PM-chain fidelity check at the flagship mesh (512^3).

The uniform-random 256^3 oracle measures 1.26e-3 total where the 16^3/32^3
ladders gave 6.3e-4/8.6e-4 -- all PM-dominated (err_short 3.5e-5,
artifacts/split_geometry_ratios16.json).  The pieces that only engage at a
512 mesh are the z-windowed CIC bricks and the radix-2 FFT splits; this
script compares the production Pallas chain (pm_from_tree, f32, TPU)
against the SAME discrete PM computed by the XLA reference chain in
float64 on CPU (cic_paint -> pm_potential -> gradient_4th ->
cic_read_vector).  Agreement to ~1e-4 of the PM field proves the kernels
faithful and pins the oracle gap as genuine CIC-aliasing discretization;
disagreement localizes a kernel bug worth fixing for free.

Usage:
    python scripts/check_pm_chain.py --n 256          # flagship mesh
    python scripts/check_pm_chain.py --n 64 --cpu     # smoke
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--mesh-mult", type=int, default=2)
    ap.add_argument("--rs-cells", type=float, default=1.75)
    ap.add_argument("--samples", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.ops.fmm_engine import pm_from_tree
    from photons_tpu.pm.solver import green_function
    from photons_tpu.tree.build import build_tree

    n = args.n
    n_side = args.mesh_mult * n
    cfg = lcdm_config(n_part=n ** 3, n_side=n_side, leaf_size=128,
                      dtype="float32", cic_straddler_cap=256)
    cfg = cfg.replace(split_scale=args.rs_cells * cfg.boxsize / n_side)
    L = cfg.boxsize
    rng = np.random.default_rng(args.seed)
    pos = rng.uniform(0, L, (n ** 3, 3))

    # --- production Pallas chain (device) --------------------------------
    t0 = time.perf_counter()
    tree = build_tree(jnp.asarray(pos, jnp.float32), mass=cfg.particle_mass,
                      leaf_size=cfg.leaf_size, lo=0.0, hi=L)
    # in-trace Green thunk: a captured 512^3 half-spectrum is a 270 MB
    # HLO literal, rejected by the axon remote compiler (HTTP 413)
    from functools import partial as _partial

    from photons_tpu.pm.solver import green_function_traced
    gf_t = _partial(green_function_traced, n_side, L, cfg.split_radius,
                    dtype=jnp.float32)
    acc_leaf, fits = jax.jit(
        lambda t: pm_from_tree(t, cfg, gf_t))(tree)
    acc_leaf = np.asarray(acc_leaf, np.float64)
    assert bool(np.asarray(fits)), "straddler overflow"
    perm = np.asarray(tree.perm)
    mask = np.asarray(tree.mask).reshape(-1)
    acc_pallas = np.zeros((n ** 3, 3))
    acc_pallas[perm[mask]] = acc_leaf.reshape(-1, 3)[mask]
    print(f"pallas chain: {time.perf_counter() - t0:.1f}s", flush=True)

    # --- f64 XLA reference chain (host CPU) -------------------------------
    t0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        jax.config.update("jax_enable_x64", True)
        from photons_tpu.pm.mesh import cic_paint, cic_read_vector
        from photons_tpu.pm.solver import gradient_4th, pm_potential
        sample = np.sort(rng.choice(n ** 3, args.samples, replace=False))
        p64 = jnp.asarray(pos, jnp.float64)
        dens = cic_paint(p64, L, n_side) * (
            cfg.particle_mass * (n_side / L) ** 3)
        gf64 = green_function(n_side, L, cfg.split_radius,
                              dtype=jnp.float64)
        phi = pm_potential(dens, gf64)
        grad = gradient_4th(phi, L)
        ref = np.asarray(cic_read_vector(grad, p64[sample], L, n_side))
    print(f"f64 XLA reference: {time.perf_counter() - t0:.1f}s", flush=True)

    d = acc_pallas[sample] - ref
    rms_pm = np.sqrt((ref ** 2).sum(-1).mean())
    rel = np.sqrt((d ** 2).sum(-1).mean()) / rms_pm
    rel_max = np.sqrt((d ** 2).sum(-1)).max() / rms_pm
    print(f"PM-chain diff vs f64 XLA: rms {rel:.3e}  max {rel_max:.3e} "
          f"(of PM rms {rms_pm:.3e})")
    faithful = rel < 3e-4
    print("VERDICT:", "faithful (gap is genuine CIC aliasing)"
          if faithful else "CHAIN BUG -- localizing by stage:")
    if faithful:
        return

    # ---- per-stage localization -----------------------------------------
    import jax.numpy as jnp
    from photons_tpu.pm.cic_pallas import (brick_origins, effective_tile,
                                           fold_halos, pad_periodic,
                                           paint_leaves, read_leaves)
    from photons_tpu.pm.solver import pm_potential

    dens_ref = np.asarray(dens, np.float64)          # from the CPU block
    phi_ref = np.asarray(phi, np.float64)
    grad_ref = np.asarray(grad, np.float64)
    # x64 was enabled for the CPU reference; the Pallas kernels must
    # trace in f32 again (f64 Mosaic conversion recurses)
    jax.config.update("jax_enable_x64", False)

    def rel_of(x, r):
        return float(np.sqrt(((x - r) ** 2).mean())
                     / np.sqrt((r ** 2).mean()))

    # stage P: Pallas brick paint (TPU f32) vs f64 XLA paint
    tile = effective_tile(n_side, cfg.cic_tile)
    origins, fits_p = brick_origins(tree.pos, tree.mask, n_side, tile, L)
    wts = jnp.where(tree.mask & np.asarray(fits_p)[:, None], 1.0,
                    0.0).astype(jnp.float32)
    padded = paint_leaves(tree.pos, wts, origins, n_side, tile, L)
    counts = np.asarray(fold_halos(padded, n_side), np.float64)
    # add the straddler residual exactly as pm_from_tree does
    n_strad = int((~np.asarray(fits_p)).sum())
    if n_strad:
        from photons_tpu.pm.mesh import cic_paint as _cp
        sidx = np.nonzero(~np.asarray(fits_p))[0]
        spos = np.asarray(tree.pos)[sidx].reshape(-1, 3)
        sw = np.asarray(tree.mask)[sidx].reshape(-1).astype(np.float32)
        counts += np.asarray(_cp(jnp.asarray(spos, jnp.float32), L, n_side,
                                 weights=jnp.asarray(sw)), np.float64)
    dens_pallas = counts * (cfg.particle_mass * (n_side / L) ** 3)
    print(f"  stage P (paint):    rel {rel_of(dens_pallas, dens_ref):.3e}"
          f"  (straddlers: {n_strad})")

    # stage F: f32 radix-2 FFT convolution of the REFERENCE density
    phi32 = np.asarray(
        jax.jit(lambda x, g: pm_potential(x, g))(
            jnp.asarray(dens_ref, jnp.float32),
            jnp.asarray(np.asarray(gf_t()), jnp.float32)), np.float64)
    print(f"  stage F (fft conv): rel {rel_of(phi32, phi_ref):.3e}")

    # stage G: f32 gradient of the reference potential
    from photons_tpu.pm.solver import gradient_4th as _g4
    g32 = np.asarray(jax.jit(_g4, static_argnums=1)(
        jnp.asarray(phi_ref, jnp.float32), L), np.float64)
    print(f"  stage G (gradient): rel {rel_of(g32, grad_ref):.3e}")

    # stage R: Pallas z-windowed readout of the reference gradient
    fields = tuple(pad_periodic(jnp.asarray(grad_ref[..., c], jnp.float32),
                                n_side) for c in range(3))
    vals = read_leaves(tree.pos, fields, origins, n_side, tile, L)
    acc_r = np.moveaxis(np.asarray(vals, np.float64), 1, 2)
    acc_read = np.zeros((n ** 3, 3))
    acc_read[perm[mask]] = acc_r.reshape(-1, 3)[mask]
    # straddler rows read through clamped origins -> exclude them (the
    # production path overwrites them via the XLA residual)
    ok = np.ones(n ** 3, bool)
    if n_strad:
        strad_rows = np.asarray(tree.perm).reshape(
            tree.pos.shape[0], -1)[sidx].reshape(-1)
        ok[strad_rows[strad_rows < n ** 3]] = False
    sel = sample[ok[sample]]
    with jax.default_device(cpu):
        ref_r = np.asarray(cic_read_vector(
            jnp.asarray(grad_ref), jnp.asarray(pos[sel]), L, n_side))
    dd = acc_read[sel] - ref_r
    print(f"  stage R (readout):  rel "
          f"{np.sqrt((dd ** 2).sum(-1).mean()) / rms_pm:.3e}"
          f"  max {np.sqrt((dd ** 2).sum(-1)).max() / rms_pm:.3e}")


if __name__ == "__main__":
    main()
