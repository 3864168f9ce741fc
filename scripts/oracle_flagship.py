#!/usr/bin/env python
"""Flagship-scale Ewald oracle: prove the <1e-3 total-force budget at the
PRODUCTION configuration (VERDICT r3 next-2).

The dense oracle (ops/direct.ewald_forces) is O(T*N) with (T, N, 3)
temporaries -- 103 GB at 256^3 -- and its k-space sum at the production
split radius needs ~7e7 modes.  This script evaluates the same exact
periodic force with an ORACLE-SIDE split radius rs_o decoupled from the
solver's split (the total is split-invariant; only the work distribution
between the real-space and k-space halves moves):

  real space   erfc(r/2rs_o)/r^2 over sources within r_cut = 8 rs_o of
               each target (cKDTree prefilter; truncation < 5e-7 of a
               single source term), summed in float64 numpy.
  k space      rho(k) = sum_s exp(-i k.x_s) over ALL N sources, computed
               on the TPU as f32 cos/sin matmul-phases chunked over
               sources with float64 host accumulation across chunks;
               modes |k| rs_o <= 4.4 (Gaussian tail < 4e-9).

Against it: the PRODUCTION f32 engine (fmm_forces + Pallas PM) at the
shipped flagship geometry (mesh 2n, rs = 1.75 cells, tapered+quantized
traversal).  Reference anchors: operator.c:294-307 (erfc-screened M2L),
conv.f90:183-233 (PM Green), initial.c:324-346 (split geometry).

Usage:
    python scripts/oracle_flagship.py --n 256 --targets 256
    python scripts/oracle_flagship.py --n 64 --compare-dense   # self-test
    python scripts/oracle_flagship.py --n 256 --snapshot artifacts/pk256_1.0000.0
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def oracle_total(pos, mass, L, eps, targets, rs_o=None, verbose=True):
    """Exact periodic acceleration at ``targets`` (float64), via an
    oracle-split Ewald sum sized for flagship N.  Returns (T, 3)."""
    from scipy.spatial import cKDTree
    from scipy.special import erfc as np_erfc

    n = pos.shape[0]
    pos = np.asarray(pos, np.float64) % L
    pos_t = pos[targets]
    t = len(targets)
    if rs_o is None:
        # balance: k modes ~ (1.4 L / rs_o)^3, neighbor ball ~ N (8 rs_o/L)^3
        rs_o = L / 40.0
    r_cut = 8.0 * rs_o

    # --- real space: KD-tree ball queries, exact f64 --------------------
    t0 = time.perf_counter()
    tree = cKDTree(pos, boxsize=L)              # periodic tree
    acc_short = np.zeros((t, 3))
    for i in range(t):
        idx = tree.query_ball_point(pos_t[i], r_cut)
        dx = pos[idx] - pos_t[i]
        dx -= L * np.round(dx / L)              # min image (r_cut < L/2)
        r2 = np.einsum("jd,jd->j", dx, dx)
        r = np.sqrt(r2)
        x = 0.5 * r / rs_o
        g = np_erfc(x) + (r / rs_o) / np.sqrt(np.pi) * np.exp(-x * x)
        r_soft = np.maximum(r, eps)
        f = np.where(r2 > 0, mass * g / r_soft ** 3, 0.0)
        acc_short[i] = f @ dx
    if verbose:
        print(f"oracle real-space: rs_o={rs_o:.0f} r_cut={r_cut:.0f} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # --- k space: rho(k) over all sources on the TPU --------------------
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    kmax_phys = 4.4 / rs_o
    k_int = int(np.ceil(kmax_phys * L / (2 * np.pi)))
    ls = np.arange(-k_int, k_int + 1)
    lx, ly, lz = np.meshgrid(ls, ls, ls, indexing="ij")
    lsq = lx ** 2 + ly ** 2 + lz ** 2
    # half-space + conjugate symmetry: rho(-k) = conj(rho(k))
    sel = (lsq > 0) & (lsq <= k_int ** 2) & (
        (lx > 0) | ((lx == 0) & (ly > 0))
        | ((lx == 0) & (ly == 0) & (lz > 0)))
    kvec = (2.0 * np.pi / L) * np.stack(
        [lx[sel], ly[sel], lz[sel]], axis=-1)
    k2 = np.sum(kvec * kvec, axis=-1)
    a_k = (4.0 * np.pi / (L ** 3 * k2)) * np.exp(-k2 * rs_o * rs_o)
    n_modes = kvec.shape[0]

    # integer modes against unit-box coordinates, f32 matmul at HIGHEST:
    # the default TPU matmul precision is bf16 (8-bit mantissa), which on
    # absolute kpc coordinates rounds positions ~L/256 -- an O(1) radian
    # phase error that destroyed the first version of this oracle
    # (measured 0.56 relative RMS against the dense f64 oracle)
    lint = jnp.asarray(np.stack([lx[sel], ly[sel], lz[sel]], axis=-1),
                       jnp.float32)              # (K, 3) integer modes

    @jax.jit
    def rho_chunk(u):                            # u = pos / L in [0, 1)
        ph = (2.0 * np.pi) * jnp.dot(u, lint.T,
                                     precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(jnp.cos(ph), axis=0), jnp.sum(jnp.sin(ph), axis=0)

    rho_c = np.zeros(n_modes)
    rho_s = np.zeros(n_modes)
    chunk = max(128, int(2 ** 30 // max(n_modes, 1)) & ~127)
    for s0 in range(0, n, chunk):
        c, s = rho_chunk(jnp.asarray(pos[s0:s0 + chunk] / L, jnp.float32))
        rho_c += np.asarray(c, np.float64)       # f64 across-chunk sum
        rho_s += np.asarray(s, np.float64)
    # rho(k) = sum exp(-i k x) = rho_c - i rho_s
    rho_k = mass * (rho_c - 1j * rho_s)

    # acc(x_t) = 2 * Re[ sum_{k half-space} A_k rho_k i k e^{i k x_t} ]
    phase_t = np.exp(1j * pos_t @ kvec.T)        # (T, K) f64 -- T is small
    coeff = a_k * rho_k
    acc_long = 2.0 * np.real(phase_t * coeff[None, :] * 1j) @ kvec
    if verbose:
        print(f"oracle k-space: {n_modes} half-modes, k_int={k_int} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    return acc_short + acc_long


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--targets", type=int, default=256)
    ap.add_argument("--seed", type=int, default=2026)
    ap.add_argument("--mesh-mult", type=int, default=2)
    ap.add_argument("--rs-cells", type=float, default=2.0,
                    help="split radius in mesh cells.  2.0 is the "
                         "shipped default: measured 8.44e-4 at the "
                         "256^3 flagship uniform state (the 1.75 "
                         "geometry measured 1.17e-3, over budget)")
    ap.add_argument("--leaf-size", type=int, default=128)
    ap.add_argument("--theta", type=float, default=None,
                    help="MAC opening angle override.  At the shipped "
                         "geometry (theta 0.4, S=128) M2L acceptance is "
                         "geometrically impossible inside the cutoff "
                         "(accept needs d > 5 w_node > cutoff for every "
                         "practical leaf size) -- an M2L-ACTIVE flagship "
                         "point needs small leaves + a loose MAC, e.g. "
                         "--leaf-size 16 --theta 1.0 (VERDICT r3 weak-1 "
                         "trial)")
    ap.add_argument("--rs-oracle", type=float, default=0.0,
                    help="oracle split radius (kpc/h); 0 = L/40")
    ap.add_argument("--open-cap", type=int, default=256)
    ap.add_argument("--p2p-cap", type=int, default=288)
    ap.add_argument("--open-cap-levels", default="224,144,144",
                    help="'' = uniform open cap.  Default = the shipped "
                         "production schedule (run_pk_parity): uniform-"
                         "RANDOM states need fatter caps than the "
                         "Zel'dovich lattice (Poisson density tails: "
                         "n_p2p 5.6M vs 3.3M at 256^3), and the old "
                         "96,64,48 default silently truncated the "
                         "uniform state's frontier (overflow=1)")
    ap.add_argument("--snapshot", default=None,
                    help="Gadget snapshot to load positions from (late-time "
                         "clustered check) instead of the Zel'dovich IC")
    ap.add_argument("--uniform-ic", action="store_true",
                    help="uniform-random positions instead of Zel'dovich: "
                         "the round-3 16^3 ladder's normalization "
                         "(artifacts/split_geometry16.json).  At a "
                         "Zel'dovich IC the net force is a near-cancelling "
                         "residue ~8x smaller than uniform-random's, so "
                         "the same absolute solver error reads ~8x larger "
                         "relative to rms(F) -- measured 5.3e-3 at 32^3 "
                         "IDENTICALLY in f32 and f64 (the floor is the "
                         "split geometry under that normalization, not "
                         "engine precision)")
    ap.add_argument("--a", type=float, default=None,
                    help="scale-factor tag recorded in the artifact")
    ap.add_argument("--compare-dense", action="store_true",
                    help="cross-check against ops/direct.ewald_forces "
                         "(small n only)")
    ap.add_argument("--interlace", default="off",
                    choices=("off", "read", "full"),
                    help="interlaced CIC mode (cfg.pm_interlace).  "
                         "'full' cut the uniform toy ladder 2.6x but "
                         "REGRESSED the flagship Zel'dovich state "
                         "2.19e-3 -> 7.0e-3 (lattice CIC-kink "
                         "pathology); 'read' is safe on every state")
    ap.add_argument("--m2l-cap", type=int, default=64,
                    help="m2l_cap_per_node; the M2L-ACTIVE trial "
                         "(--leaf-size 16 --theta 1.0) needs more than "
                         "the production 64")
    ap.add_argument("--p2p-passes", type=int, default=1,
                    help="segmented near-field multi-pass (cfg.p2p_passes)"
                         ": fits the S=16 flagship p2p table in bounded "
                         "memory (VERDICT r4 next-6)")
    ap.add_argument("--discard-margin", type=float, default=0.0,
                    help="inflate the traversal discard horizon to "
                         "cutoff*(1+margin) (cfg.discard_margin).  0.11 "
                         "covers one leaf shell at the 256^3 flagship -- "
                         "the Zel'dovich-IC truncation lever (VERDICT r4 "
                         "missing-4)")
    ap.add_argument("--exact-mac", action="store_true",
                    help="engine A/B: disable quantized MAC + tapered caps")
    ap.add_argument("--dtype", default="float32",
                    help="engine dtype (float32 = production; float64 "
                         "isolates f32 engine noise from split-geometry "
                         "error)")
    ap.add_argument("--p2p-backend", default="indexing",
                    help="'indexing' = production Pallas kernel; 'jnp' "
                         "for float64/CPU runs (dense -- small n only)")
    ap.add_argument("--cpu", action="store_true",
                    help="run the engine on CPU (float64 A/B; the oracle "
                         "k-space then also runs on CPU)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.ops.fmm_engine import fmm_forces
    from photons_tpu.pm.solver import green_function

    n = args.n
    n_side = args.mesh_mult * n
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    cfg = lcdm_config(
        n_part=n ** 3, n_side=n_side, leaf_size=args.leaf_size,
        dtype=args.dtype, open_cap_per_node=args.open_cap,
        p2p_neighbor_cap=args.p2p_cap, m2l_cap_per_node=args.m2l_cap,
        # pre-sized like the production run (run_pk_parity): uniform-
        # random states have MORE Hilbert straddlers than the lattice;
        # the default 8 overflows and the XLA residual path then leaves
        # garbage PM rows for the un-absorbed straddler leaves
        cic_straddler_cap=256)
    levels = (tuple(int(x) for x in args.open_cap_levels.split(","))
              if args.open_cap_levels else None)
    cfg = cfg.replace(
        split_scale=args.rs_cells * cfg.boxsize / n_side,
        open_cap_levels=None if args.exact_mac else levels,
        traversal_quantized=not args.exact_mac,
        pm_interlace=args.interlace,
        discard_margin=args.discard_margin,
        p2p_passes=args.p2p_passes,
        **({"open_angle": args.theta} if args.theta else {}))
    L = cfg.boxsize

    a_tag = args.a
    if args.snapshot:
        from photons_tpu.io.gadget import read_gadget
        head, pos, _ = read_gadget(args.snapshot)
        pos = np.asarray(pos, np.float64)
        if a_tag is None:
            a_tag = 1.0 / (1.0 + head.redshift)
        print(f"positions from {args.snapshot} (z={head.redshift:.2f}, "
              f"N={len(pos)})", flush=True)
    elif args.uniform_ic:
        rng0 = np.random.default_rng(args.seed)
        pos = rng0.uniform(0, L, (n ** 3, 3))
        if a_tag is None:
            a_tag = 0.0                        # not a cosmological state
    else:
        pos, _ = ic_zeldovich(cfg, seed=args.seed, spectral_index="lcdm")
        pos = np.asarray(pos, np.float64)
        if a_tag is None:
            a_tag = cfg.initial_scale_factor

    rng = np.random.default_rng(args.seed)
    tgt = np.sort(rng.choice(n ** 3, size=args.targets, replace=False))

    # --- production engine total force at the targets --------------------
    # the PRODUCTION program: sorted fused forces with the Pallas-CIC PM
    # riding the FMM tree (the same executable run_pk_parity steps with).
    # The unsorted engine + XLA-CIC pm_accel alternative wedged its 256^3
    # compile >45 min through the axon tunnel (the XLA CIC corner-scatter
    # at a 512^3 mesh), the exact failure mode VERDICT r3 weak-1 warns
    # about -- sorted fused is both faster and the config under test.
    t0 = time.perf_counter()
    dt_dev = jnp.dtype(cfg.dtype)
    pos_dev = jnp.asarray(pos, dt_dev)
    use_pallas_cic = (args.p2p_backend != "jnp"
                      and jax.default_backend() == "tpu")
    if use_pallas_cic:
        from functools import partial

        from photons_tpu.pm.solver import green_function_traced
        gf_t = partial(green_function_traced, n_side, L, cfg.split_radius,
                       dtype=dt_dev)
        cfg_s = cfg.replace(sorted_state=True)
        (acc_s, acc_pm_s, pos_sorted, perm), diag = jax.jit(
            lambda p: fmm_forces(p, cfg_s, p2p_backend=args.p2p_backend,
                                 pm_gf=gf_t, layout="sorted"))(pos_dev)
        inv = np.empty(n ** 3, np.int64)
        inv[np.asarray(perm)] = np.arange(n ** 3)
        rows = inv[tgt]
        engine = (np.asarray(acc_s, np.float64)[rows]
                  + np.asarray(acc_pm_s, np.float64)[rows])
    else:
        acc_s, diag = jax.jit(lambda p: fmm_forces(
            p, cfg, p2p_backend=args.p2p_backend))(pos_dev)
        from photons_tpu.pm import pm_accel
        gf = green_function(n_side, L, cfg.split_radius, dtype=dt_dev)
        acc_pm = pm_accel(pos_dev, gf, mass=cfg.particle_mass,
                          boxsize=L, n_side=n_side)
        engine = (np.asarray(acc_s, np.float64)[tgt]
                  + np.asarray(acc_pm, np.float64)[tgt])
    print(f"engine forces: {time.perf_counter() - t0:.1f}s  "
          f"n_p2p={int(diag['n_p2p'])} overflow={int(diag['overflow'])} "
          f"cic_overflow={int(diag.get('cic_overflow', 0))}", flush=True)
    assert not bool(diag["overflow"])
    assert not bool(diag.get("cic_overflow", False)), \
        "CIC straddler overflow: PM rows beyond cic_straddler_cap are " \
        "garbage -- raise the cap"

    # --- oracle -----------------------------------------------------------
    exact = oracle_total(pos, cfg.particle_mass, L, cfg.soften_scale, tgt,
                         rs_o=args.rs_oracle or None)
    rms = float(np.sqrt((exact ** 2).sum(-1).mean()))
    err = float(np.sqrt(((engine - exact) ** 2).sum(-1).mean()) / rms)
    err_max = float(np.sqrt(((engine - exact) ** 2).sum(-1)).max() / rms)

    out = {
        "n": n, "n_side": n_side, "rs_cells": args.rs_cells,
        "split_radius": cfg.split_radius, "cutoff": cfg.cutoff_radius,
        "a": a_tag, "targets": args.targets, "seed": args.seed,
        "source": (args.snapshot or
                   ("uniform" if args.uniform_ic else "zeldovich-ic")),
        "quantized_mac": not args.exact_mac,
        "interlace": args.interlace,
        "discard_margin": args.discard_margin,
        "m2l_cap": args.m2l_cap, "p2p_passes": args.p2p_passes,
        "theta": args.theta or cfg.open_angle,
        "leaf_size": args.leaf_size,
        "open_cap": args.open_cap, "p2p_cap": args.p2p_cap,
        "open_cap_levels": (None if args.exact_mac or levels is None
                            else list(levels)),
        "err_total_rms": err, "err_total_max": err_max,
        "force_rms": rms,
        "n_p2p": int(diag["n_p2p"]), "n_m2l": int(diag["n_m2l"]),
    }

    if args.compare_dense:
        from photons_tpu.ops.direct import ewald_forces
        k_max = int(np.ceil(5.5 * L / (2 * np.pi * cfg.split_radius))) + 1
        dense = ewald_forces(pos, cfg.particle_mass, L, cfg.split_radius,
                             cfg.soften_scale, n_images=1, k_max=k_max,
                             targets=tgt)
        x_err = float(np.sqrt(((exact - dense) ** 2).sum(-1).mean()) / rms)
        out["oracle_vs_dense_rms"] = x_err
        print(f"oracle vs dense cross-check: {x_err:.2e}")

    path = args.out or f"artifacts/split_geometry{n}.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = []
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
        rows = prev if isinstance(prev, list) else [prev]
    rows.append(out)
    with open(path, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k in ("a", "err_total_rms", "err_total_max",
                               "n_p2p")}))
    print(f"err_total_rms = {err:.2e} ({'PASS' if err < 1e-3 else 'FAIL'} "
          f"vs 1e-3 budget); wrote {path}")


if __name__ == "__main__":
    main()
