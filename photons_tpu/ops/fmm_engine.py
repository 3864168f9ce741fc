"""FMM short-range force engine: tree build -> traversal -> P2P + M2L ->
L2L -> L2P, as one jitted computation.

This is the TPU re-architecture of the reference's per-step FMM sequence
(fmm_prepare -> fmm_task -> fmm_ext, fmm.c:745-1145):

- tree build + upward pass: ``photons_tpu.tree.build`` (fmm_prepare)
- interaction lists: ``photons_tpu.ops.traversal`` (walk_task_p2p/m2l)
- M2L: batched kernel evaluation + segment-sum per level (task_compute_m2l,
  fmm.c:913-945)
- L2L downward sweep (walk_l2l, operator.c:498-528)
- L2P per leaf (operator.c:197-251)
- P2P: selectable backend -- 'jnp' dense reference, or the Pallas kernels
  in ``photons_tpu.ops.p2p_pallas`` ('indexing' / 'redundant' layouts
  mirroring the two GPU variants).

Periodic boundary uses minimum-image displacements throughout (exact for
cutoff < L/2), replacing the reference's 27 ring passes (fmm.c:1083-1106).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from photons_tpu.config import SimConfig
from photons_tpu.ops import multipoles as mp
from photons_tpu.ops.kernels import pair_accel
from photons_tpu.ops.traversal import InteractionLists, dual_tree_traversal
from photons_tpu.tree.build import (Tree, _next_pow2, build_tree,
                                    tree_from_sorted)


from photons_tpu.ops.kernels import min_image as _min_image


def apply_m2l_pair(tree: Tree, lists: InteractionLists,
                   src_centers, src_moments,
                   split_radius: Optional[float],
                   boxsize: Optional[float], locals_per_level=None):
    """Evaluate M2L interactions from a (possibly remote) source tree into
    the target tree's per-level local expansions.

    The traversal's per-target tables give each node exclusive ownership of
    its row, so accumulation is a dense gather + reduce over the table's
    short axis -- no scatter-add (the reference instead loops m2l() per
    task, task_compute_m2l fmm.c:913-945; the remote form is
    task_compute_m2l_ext, remotes.c:637-667).

    Returns a list of (2^d, 20) local-expansion arrays per depth.
    """
    if locals_per_level is None:
        locals_per_level = [jnp.zeros_like(m) for m in tree.moments]
    # the m2l kernel's derivative table materializes an
    # (n_nodes*cap, 84) intermediate (84 = monomials to degree 6 for the
    # octupole Taylor contraction): 23.6 GB at a 2^20-node leaf level
    # with cap 64 (measured compile OOM at 512^3 S=128 and 256^3 S=16;
    # XLA allocates it even under the any-accept lax.cond).  Chunk the
    # TARGET-node axis so each slice's pair rows stay <= 2^22
    # ((2^22, 84) f32 = 1.4 GB), like the P2M leaf-axis chunking.
    row_budget = 1 << 22
    for lvl, (tbl, cnt) in enumerate(zip(lists.m2l, lists.m2l_counts)):
        d = lvl + 1                                  # tables start at depth 1
        n_nodes, cap = tbl.shape
        chunk = max(1, min(n_nodes, row_budget // max(cap, 1)))

        def level_block(tbl_c, centers_c):
            valid = tbl_c >= 0
            safe = jnp.maximum(tbl_c, 0)
            disp = _min_image(centers_c[:, None, :] - src_centers[d][safe],
                              boxsize)
            m_src = jnp.where(valid[..., None], src_moments[d][safe], 0.0)
            # guard the padded rows against r = 0 in the kernel
            disp = jnp.where(valid[..., None], disp, 1.0)
            dl = mp.m2l(m_src.reshape(-1, mp.NMULTI),
                        disp.reshape(-1, 3),
                        split_radius=split_radius).reshape(
                tbl_c.shape[0], cap, -1)
            return jnp.sum(jnp.where(valid[..., None], dl, 0.0), axis=1)

        # round the chunk down to a divisor of the (power-of-two) node
        # count so the chunks scan: lax.scan's loop-carried sequencing
        # bounds the live derivative temp to ONE chunk, where the earlier
        # unrolled optimization_barrier loop only stopped re-fusion, not
        # re-ordering (see the P2M note in tree/build.py)
        while chunk < n_nodes and n_nodes % chunk:
            chunk //= 2
        if chunk >= n_nodes:
            add = level_block(tbl, tree.centers[d])
        else:
            nc = n_nodes // chunk
            ctr = tree.centers[d]

            # centers go per-axis (3-minor scan inputs lane-pad 42x;
            # see the P2M note in tree/build.py)
            def _m2l_chunk(_, xs, f=level_block):
                tb, cx, cy, cz = xs
                return None, f(tb, jnp.stack([cx, cy, cz], axis=-1))

            _, add = jax.lax.scan(
                _m2l_chunk, None,
                (tbl.reshape(nc, chunk, cap),)
                + tuple(ctr[:, a].reshape(nc, chunk) for a in range(3)))
            add = add.reshape(n_nodes, -1)
        locals_per_level[d] = locals_per_level[d] + add
    return locals_per_level


def apply_m2l(tree: Tree, lists: InteractionLists,
              split_radius: Optional[float], boxsize: Optional[float]):
    """Local-walk M2L: source tree == target tree."""
    return apply_m2l_pair(tree, lists, tree.centers, tree.moments,
                          split_radius, boxsize)


def downward_l2l(tree: Tree, locals_per_level):
    """Push local expansions down: child L += shift(parent L) (walk_l2l)."""
    for d in range(tree.depth):
        parent_l = locals_per_level[d]               # (2^d, 20)
        child_c = tree.centers[d + 1].reshape(-1, 2, 3)
        parent_c = tree.centers[d][:, None, :]
        disp = child_c - parent_c
        shifted = mp.l2l(parent_l[:, None, :], disp)  # (2^d, 2, 20)
        locals_per_level[d + 1] = locals_per_level[d + 1] + \
            shifted.reshape(-1, mp.NMULTI)
    return locals_per_level


def leaf_l2p(tree: Tree, leaf_locals):
    """Evaluate leaf local expansions at the particles -> (nleaf, S, 3).

    lax.scan over 64K-leaf chunks: l2p's monomial table is
    (nleaf, S, 20) -- 10 GB at a 2^20-leaf 512^3 tree (measured compile
    OOM).  An unrolled optimization_barrier loop stops re-fusion but not
    re-ordering (the 512^3 dump showed several chunk temps in flight);
    scan's loop-carried sequencing bounds the live temp to one chunk."""
    n_leaf, s = tree.pos.shape[:2]
    chunk = 1 << 16

    if n_leaf <= chunk or n_leaf % chunk:
        dx = tree.pos - tree.centers[-1][:, None, :]
        acc = mp.l2p(leaf_locals, dx)
        return jnp.where(tree.mask[:, :, None], acc, 0.0)
    nc = n_leaf // chunk

    # per-axis 2-D scan xs + per-axis ys: (…, 3)-minor arrays at a scan
    # boundary get lane-padded 42x (64 GB at 512^3, measured -- see the
    # P2M note in tree/build.py); the in-body stack/slice pairs fuse away
    def block(_, xs):
        lloc, px, py, pz, cx, cy, cz, msk = xs
        dx = jnp.stack([px - cx[:, None], py - cy[:, None],
                        pz - cz[:, None]], axis=-1)
        acc = mp.l2p(lloc, dx)
        acc = jnp.where(msk[:, :, None], acc, 0.0)
        return None, (acc[:, :, 0], acc[:, :, 1], acc[:, :, 2])

    _, (ax, ay, az) = jax.lax.scan(
        block, None,
        (leaf_locals.reshape(nc, chunk, -1),)
        + tuple(tree.pos[:, :, a].reshape(nc, chunk, s) for a in range(3))
        + tuple(tree.centers[-1][:, a].reshape(nc, chunk) for a in range(3))
        + (tree.mask.reshape(nc, chunk, s),))
    return jnp.stack([ax.reshape(n_leaf, s), ay.reshape(n_leaf, s),
                      az.reshape(n_leaf, s)], axis=-1)


def p2p_jnp(tree: Tree, lists: InteractionLists, mass: float, eps: float,
            split_radius: Optional[float], boxsize: Optional[float]):
    """Dense jnp P2P over the neighbor table -> per-particle acc
    (nleaf, S, 3).

    Functional reference for the Pallas kernels: gathers each target leaf's
    source blocks through the table (the 'Redundant' data layout, in XLA),
    computes masked S x S interaction tiles, and reduces over the table
    axis -- each target row is exclusively owned, so no scatter-add.
    """
    table = lists.p2p                                 # (nleaf, K)
    n_leaf, s = tree.pos.shape[:2]
    k = table.shape[1]
    valid = table >= 0
    safe = jnp.maximum(table, 0)

    pos_s = tree.pos[safe]                            # (nleaf, K, S, 3)
    m_s = jnp.where(tree.mask[safe] & valid[..., None], mass, 0.0)

    # (nleaf, K, S_t, S_s, 3): target index broadcasts over the table axis
    dx = _min_image(pos_s[:, :, None, :, :] - tree.pos[:, None, :, None, :],
                    boxsize)
    r2 = jnp.sum(dx * dx, axis=-1)
    acc = jnp.sum(pair_accel(dx, r2, m_s[:, :, None, :], eps, split_radius),
                  axis=(1, 3))
    return acc


def p2p_stage(tree: Tree, lists: InteractionLists, cfg: SimConfig,
              p2p_backend: str = "jnp", leaf_active=None):
    """The near-field kernel alone on one interaction table.

    Factored out of fmm_apply so the segmented multi-pass (cfg.p2p_passes)
    can run extra p2p_cap-wide segments without repeating M2L/L2L/L2P --
    the reference's LEN_TASK flush loop re-enters ONLY its P2P kernels the
    same way (2_Redundant/src/fmm.c:377-418).  Returns (acc_leaf
    (nleaf, S, 3), kernel-side neighbor overflow flag)."""
    mass = cfg.particle_mass
    rs = cfg.split_radius if cfg.longshort else None
    box = cfg.boxsize if cfg.periodic else None
    nbr_overflow = jnp.asarray(False)
    if p2p_backend == "jnp":
        acc_p2p = p2p_jnp(tree, lists, mass, cfg.soften_scale, rs, box)
        if leaf_active is not None:
            acc_p2p = jnp.where(leaf_active[:, None, None], acc_p2p, 0.0)
    elif p2p_backend == "hybrid":
        from photons_tpu.ops.p2p_pallas import p2p_hybrid
        acc_p2p, nbr_overflow = p2p_hybrid(
            tree, lists, mass, cfg.soften_scale, rs, box,
            k_threshold=cfg.p2p_hybrid_threshold, leaf_active=leaf_active,
            cutoff=cfg.traversal_cutoff if cfg.longshort else None)
    elif p2p_backend in ("indexing", "redundant"):
        from photons_tpu.ops.p2p_pallas import p2p_pallas
        acc_p2p, nbr_overflow = p2p_pallas(
            tree, lists, mass, cfg.soften_scale, rs, box,
            layout=p2p_backend, leaf_active=leaf_active,
            cutoff=cfg.traversal_cutoff if cfg.longshort else None)
    else:
        raise ValueError(f"unknown p2p backend {p2p_backend!r}")
    return acc_p2p, nbr_overflow


def fmm_apply(tree: Tree, lists: InteractionLists, cfg: SimConfig,
              p2p_backend: str = "jnp", leaf_active=None, extra_leaf=None,
              extra_acc_leaf=None, layout: str = "original"):
    """Force evaluation given precomputed interaction lists (the compute
    half of fmm_task, fmm.c:947-1024): M2L + L2L + L2P + P2P, scattered
    back to the pre-sort particle order.

    ``lists`` may come from the jitted traversal (fmm_forces) or from the
    native host walk (pipeline.PipelinedSimulation -- the dual-buffer
    walk/compute split of the reference, fmm.c:378-400).

    ``leaf_active``: optional (nleaf,) mask gating P2P TARGET rows (block
    timestepping: only leaves holding a particle whose KDK block closes at
    this substep need forces -- the active_particle surface of
    inc/adaptive.h).  Inactive rows are skipped by the redundant kernel
    (zeroed chunk counts -> pl.when skips the tile) and zeroed elsewhere;
    sources always remain the full tree.

    Returns (acc (n_leaf*S, 3) in original order incl. padding slots,
    diag dict).
    """
    mass = cfg.particle_mass
    rs = cfg.split_radius if cfg.longshort else None
    box = cfg.boxsize if cfg.periodic else None

    # The M2L -> L2L -> L2P chain runs only when the traversal emitted
    # any M2L task.  In the uniform TreePM regime the MAC accept is
    # geometrically impossible (BENCH_NOTES: needs theta > 1.1) and
    # n_m2l == 0 for the whole early run -- the cond skips ~0.3 s/step
    # of cap-padded batch evaluation until clustering activates it.
    def _with_m2l(_):
        lpl = apply_m2l(tree, lists, rs, box)
        lpl = downward_l2l(tree, lpl)
        return leaf_l2p(tree, lpl[-1])

    acc_leaf = jax.lax.cond(sum(lists.m2l_counts) > 0, _with_m2l,
                            lambda _: jnp.zeros_like(tree.pos), None)

    acc_p2p, nbr_overflow = p2p_stage(tree, lists, cfg, p2p_backend,
                                      leaf_active)
    acc_leaf = acc_leaf + acc_p2p
    if extra_acc_leaf is not None:
        # segmented-multi-pass partial sums (cfg.p2p_passes > 1): the
        # extra p2p_cap-wide segments' near-field acc, same leaf shape
        acc_leaf = acc_leaf + extra_acc_leaf

    # scatter back to the original particle order (perm: sorted -> original);
    # mask so invalid (padding) slots always carry zero acceleration.
    # layout='sorted' skips the scatter entirely: the caller keeps its
    # state in tree order (cfg.sorted_state), so the leaf-order results
    # ARE the answer -- a TPU row scatter at 16.7M rows costs ~1.4 s.
    from photons_tpu.ops.traversal import OVF_P2P
    diag = {
        "n_p2p": lists.p2p_count,
        "n_m2l": sum(lists.m2l_counts),
        "overflow": lists.overflow | nbr_overflow,
        # which cap tripped (OVF_OPEN/OVF_M2L/OVF_P2P): the kernel's own
        # neighbor-chunk overflow is a p2p-row condition, so recovery
        # grows only p2p_neighbor_cap for it.  NOTE: at this call site
        # p2p_pallas runs without a kernel-side neighbor_cap, so
        # nbr_overflow is constantly False -- the OVF_P2P mapping is live
        # only for callers that configure a tighter kernel cap (the
        # traversal's own p2p_cap overflow arrives via lists.overflow_bits)
        "overflow_bits": lists.overflow_bits
        | jnp.where(nbr_overflow, OVF_P2P, 0),
    }
    if layout == "sorted":
        flat = jnp.where(tree.mask[..., None], acc_leaf, 0.0).reshape(-1, 3)
        if extra_leaf is not None:
            eflat = jnp.where(tree.mask[..., None], extra_leaf,
                              0.0).reshape(-1, extra_leaf.shape[-1])
            return (flat, eflat), diag
        return flat, diag
    if extra_leaf is not None:
        acc_all, extra_all = scatter_leaf_values(tree, acc_leaf, extra_leaf)
        return (acc_all, extra_all), diag
    return scatter_leaf_values(tree, acc_leaf), diag


def scatter_leaf_values(tree: Tree, *leaf_vals):
    """Scatter leaf-order (nleaf, S, C) values to the pre-sort order.

    Multiple arrays are scattered through ONE fused (N, sum C) scatter --
    a TPU permutation scatter at 16.7M rows costs ~1.4 s, so sharing it
    between the short-range and PM results matters.
    Returns one (N', C) array or a tuple matching the inputs."""
    cat = (leaf_vals[0] if len(leaf_vals) == 1
           else jnp.concatenate(leaf_vals, axis=-1))
    c = cat.shape[-1]
    flat = jnp.where(tree.mask[..., None], cat, 0.0).reshape(-1, c)
    out = jnp.zeros((tree.perm.shape[0], c), flat.dtype).at[tree.perm].set(
        flat)
    if len(leaf_vals) == 1:
        return out
    splits = []
    o = 0
    for v in leaf_vals:
        splits.append(out[:, o:o + v.shape[-1]])
        o += v.shape[-1]
    return tuple(splits)


def pm_from_tree(tree: Tree, cfg: SimConfig, gf, interpret=None):
    """PM acceleration at the tree's particles via the Pallas CIC kernels.

    ``gf`` may be the (n, n, n//2+1) Green's-function array or a zero-arg
    thunk building it in-trace (green_function_traced) -- a captured array
    is inlined into the HLO constant pool, which at 512^3 exceeds the axon
    remote compiler's request limit (HTTP 413).

    Reuses the engine's Hilbert leaf blocking -- the sort that XLA-side
    ``pm_accel_pallas`` would redo, and the unsort scatter it would add,
    are already paid by the FMM pipeline (the caller co-scatters the
    result through scatter_leaf_values).

    Returns (acc_pm_leaf (nleaf, S, 3), fits_all).
    """
    from photons_tpu.pm.cic_pallas import (brick_origins, fold_halos,
                                           pad_periodic, paint_leaves,
                                           read_leaves)
    from photons_tpu.pm.solver import gradient_4th

    from photons_tpu.pm.cic_pallas import effective_tile
    from photons_tpu.pm.mesh import cic_paint, cic_read_vector
    box = cfg.boxsize
    n_side = cfg.n_side
    tile = effective_tile(n_side, cfg.cic_tile)
    k_cap = min(int(cfg.cic_straddler_cap), tree.n_leaf)

    def paint_counts(pos_s):
        """Pallas leaf-brick paint of (possibly shifted) leaf positions,
        with the straddler XLA residual.  Returns (counts, fits_ok,
        (n_strad, sidx, gate, spos)) -- aux drives the readout fix.

        Residual straddler path (NEXT.md round-3 lead): a few leaves' SFC
        segments cross major Hilbert transitions, so their CIC footprint
        exceeds any practical brick tile.  Instead of a recompile
        recovery (tile growth, then cic_backend='xla'), route up to
        cfg.cic_straddler_cap such leaves through XLA scatter/gather --
        the compacted-residual fallback the kernel docstring assumes
        (pm/cic_pallas.py).  Only > cap straddlers still flag
        cic_overflow."""
        origins, fits = brick_origins(pos_s, tree.mask, n_side, tile, box)
        wts = jnp.where(tree.mask & fits[:, None], 1.0, 0.0).astype(
            pos_s.dtype)
        padded = paint_leaves(pos_s, wts, origins, n_side, tile, box,
                              interpret=interpret)
        counts = fold_halos(padded, n_side)
        n_strad = jnp.sum(~fits)
        if k_cap > 0:
            sval, sidx = jax.lax.top_k((~fits).astype(jnp.int32), k_cap)
            gate = sval > 0                               # (K,)
            spos = pos_s[sidx]                            # (K, S, 3)
            sw = (tree.mask[sidx] & gate[:, None]).reshape(-1).astype(
                pos_s.dtype)
            spos_flat = spos.reshape(-1, 3)
            counts = jax.lax.cond(
                n_strad > 0,
                lambda c: c + cic_paint(spos_flat, box, n_side,
                                        weights=sw).astype(c.dtype),
                lambda c: c, counts)
            fits_ok = n_strad <= k_cap
        else:
            fits_ok = jnp.all(fits)
        return counts, fits_ok, fits, origins

    def to_dens_k(counts):
        dens = counts * (cfg.particle_mass * (n_side / box) ** 3)
        # layout firewall: the sliced view of the Pallas output can carry
        # a non-major layout that the TPU fft thunk misreads (values
        # verified correct, fft output garbage).  A barriered
        # flatten/reshape forces a standard-layout materialization.
        dens = jax.lax.optimization_barrier(dens.reshape(-1)).reshape(
            n_side, n_side, n_side)
        return rfft3(dens)

    from photons_tpu.pm.solver import (gradient_fd4_k, interlace_mode,
                                       interlace_phase_mul, irfft3, rfft3,
                                       spectral_gradient)

    il_mode = interlace_mode(cfg.pm_interlace)
    counts, fits_all, fits0, origins = paint_counts(tree.pos)
    dk = to_dens_k(counts)
    rdt = dk.real.dtype
    half = 0.5 * box / n_side
    if il_mode == "full":
        # interlaced CIC paint: second paint at +cell/2, aligned in k and
        # averaged -- cancels odd CIC alias images (the +H/2 positions
        # stay unwrapped: the mesh's HALO margin covers the spill and
        # fold_halos wraps it, while the straddler XLA paint wraps by
        # jnp.mod).  NOT part of "read" mode: the shifted paint parks
        # displaced-lattice states on the CIC kink and regresses their
        # force error 3x (config.pm_interlace)
        counts2, fits2, _, _ = paint_counts(tree.pos + half)
        dk = 0.5 * (dk + interlace_phase_mul(to_dens_k(counts2), n_side))
        fits_all = jnp.logical_and(fits_all, fits2)
    if callable(gf):
        gf = gf()
    conv_k = dk * gf.astype(rdt)

    def grad_fields(ck):
        if cfg.pm_gradient in ("fd4k", "spectral"):
            if cfg.pm_gradient == "fd4k":
                gfs = gradient_fd4_k(ck, box, n_side, rdt)
            else:
                g4 = spectral_gradient(ck, box, n_side, rdt)
                gfs = tuple(g4[..., c] for c in range(3))
            # layout firewall (same reason as the dens barrier above, in
            # the other direction): fft-thunk outputs can carry a
            # non-major layout that the Pallas read kernels misread in
            # SOME jit contexts -- the standalone PM-chain check measured
            # 0.3 rms garbage while the full engine graph was fine
            return tuple(
                jax.lax.optimization_barrier(g.reshape(-1)).reshape(g.shape)
                for g in gfs)
        phi = irfft3(ck, n_side, rdt)
        grad = gradient_4th(phi, box)
        return tuple(grad[..., c] for c in range(3))

    def read_at(gfields, pos_r, origins_r, fits_r):
        """One Pallas readout pass + the straddler XLA overwrite.

        Straddler rows (``~fits_r``) read garbage through their clamped
        brick origin: overwrite them with an XLA trilinear readout of
        the same grad field.  where+set keeps non-straddler rows
        bit-identical (gate selects the original row) and, unlike a
        delta-add, stays robust if a garbage row ever carries NaN/Inf
        (ADVICE round 2).  Returns (acc_leaf, ok) with ok False when
        more than k_cap leaves straddle."""
        fields = tuple(pad_periodic(g, n_side) for g in gfields)
        # pass positions in their native dtype: the kernels compute CIC
        # weights in the input dtype, so paint and readout agree on cell
        # rounding (an f32 downcast here silently degraded readout
        # coords in f64 runs)
        vals = read_leaves(pos_r, fields, origins_r,
                           n_side, tile, box, interpret=interpret)
        acc_leaf0 = jnp.moveaxis(vals, 1, 2).astype(tree.pos.dtype)
        n_strad_r = jnp.sum(~fits_r)
        if k_cap == 0:
            return acc_leaf0, jnp.all(fits_r)
        sval_r, sidx_r = jax.lax.top_k((~fits_r).astype(jnp.int32), k_cap)
        gate_r = sval_r > 0
        spos_r = pos_r[sidx_r]

        def _fix(acc_leaf):
            svals = jnp.concatenate(
                [cic_read_vector(g[..., None], spos_r.reshape(-1, 3), box,
                                 n_side) for g in gfields],
                axis=-1).reshape(k_cap, -1, 3)
            new = jnp.where(gate_r[:, None, None],
                            svals.astype(acc_leaf.dtype), acc_leaf[sidx_r])
            return acc_leaf.at[sidx_r].set(new)
        acc_leaf = jax.lax.cond(n_strad_r > 0, _fix, lambda a: a, acc_leaf0)
        return acc_leaf, n_strad_r <= k_cap

    # readout straddler set = the unshifted paint's (identical origins)
    acc_pm_leaf, _ok0 = read_at(grad_fields(conv_k), tree.pos, origins,
                                fits0)
    if il_mode in ("read", "full"):
        # interlaced readout: the same force spectrum sampled on the
        # +H/2-shifted grid, read in that grid's frame (pos - H/2) and
        # averaged -- cancels the READOUT window's odd alias images,
        # which dominate once the paint is interlaced (pm_accel notes:
        # 2.19e-3 plain / 1.86e-3 paint-only / 8.4e-4 full on the 32^3
        # ladder).  Shifted-read footprints can move by one cell, so
        # they get their own brick origins AND their own straddler set
        # (a leaf may fit unshifted but straddle shifted).
        pos_shift = tree.pos - half
        origins2, fits_r2 = brick_origins(pos_shift, tree.mask, n_side,
                                          tile, box)
        acc2, ok2 = read_at(grad_fields(interlace_phase_mul(conv_k, n_side)),
                            pos_shift, origins2, fits_r2)
        acc_pm_leaf = 0.5 * (acc_pm_leaf + acc2)
        fits_all = jnp.logical_and(fits_all, ok2)
    if il_mode == "read":
        # momentum projection (see pm_accel): read-only interlacing's
        # window asymmetry injects a spurious uniform force; remove the
        # mass-weighted mean over VALID particles so total momentum is
        # conserved exactly again (equal masses)
        m3 = tree.mask[..., None]
        mean = (jnp.sum(jnp.where(m3, acc_pm_leaf, 0.0), axis=(0, 1))
                / jnp.maximum(jnp.sum(tree.mask), 1))
        acc_pm_leaf = jnp.where(m3, acc_pm_leaf - mean, acc_pm_leaf)
    return acc_pm_leaf, fits_all


def fmm_forces(pos, cfg: SimConfig, p2p_backend: str = "jnp", valid=None,
               active=None, pm_gf=None, layout: str = "original",
               return_lists: bool = False):
    """Full short-range FMM acceleration in the original particle order.

    ``valid``: optional liveness mask (capacity-padded sharded inputs);
    invalid slots contribute no mass and get zero acceleration.
    ``active``: optional (N,) mask -- only forces ON active particles are
    needed (block timestepping); a leaf is computed iff it holds an active
    particle, and inactive particles' returned forces are unspecified.
    ``pm_gf``: optional Green's function -- compute the PM long-range
    acceleration too, on the SAME tree (Pallas CIC kernels; one shared
    unsort scatter).  Changes the return to ((acc, acc_pm), diag).
    ``layout='sorted'``: skip the unsort scatter and return everything in
    the tree's space-filling-curve order (cfg.sorted_state stepping) --
    the return becomes ((acc, [acc_pm,] pos_sorted, perm), diag) with all
    arrays length N and ``perm`` mapping sorted slot -> input slot.
    Requires ``valid=None`` (padding must occupy the sorted tail).
    ``return_lists`` (sorted layout only): append the InteractionLists to
    the returned tuple, for list-reuse stepping (fmm_forces_reuse).

    Returns (acc (N,3), diag dict of scalars).
    """
    n = pos.shape[0]
    cutoff = cfg.traversal_cutoff if cfg.longshort else None
    box = cfg.boxsize if cfg.periodic else None
    lo, hi = (0.0, cfg.boxsize)
    if cutoff is not None and cfg.list_reuse > 1:
        # Verlet skin: accept pairs within cutoff*(1+skin) so the lists
        # stay complete while every particle has drifted < skin*cutoff/2
        # since this rebuild (enforced by fmm_forces_reuse's monitor)
        cutoff = cutoff * (1.0 + cfg.verlet_skin)

    tree = build_tree(pos, mass=cfg.particle_mass, leaf_size=cfg.leaf_size,
                      lo=lo, hi=hi, valid=valid)
    from photons_tpu.ops.traversal import expand_open_caps
    depth = _next_pow2(-(-n // cfg.leaf_size)).bit_length() - 1
    passes = max(1, int(getattr(cfg, "p2p_passes", 1)))
    tr = dual_tree_traversal(
        tree, theta=cfg.open_angle, cutoff=cutoff, boxsize=box,
        open_cap=cfg.open_cap_per_node, m2l_cap=cfg.m2l_cap_per_node,
        p2p_cap=cfg.p2p_neighbor_cap,
        adjacency_eps=1e-9 * cfg.boxsize,
        open_caps=expand_open_caps(cfg.open_cap_levels, depth,
                                   cfg.open_cap_per_node),
        quant_bounds=(lo, hi) if cfg.traversal_quantized else None,
        return_leaf_cand=passes > 1)
    if passes > 1:
        lists, (leaf_cand, leaf_mask) = tr
    else:
        lists = tr

    leaf_active = None
    if active is not None:
        n_pad = tree.perm.shape[0] - n
        active_pad = jnp.concatenate(
            [active, jnp.zeros((n_pad,), bool)]) if n_pad else active
        leaf_active = jnp.any(
            (active_pad[tree.perm].reshape(tree.n_leaf, tree.leaf_size)
             & tree.mask), axis=1)

    # segmented multi-pass near field (cfg.p2p_passes > 1): the leaf rows
    # wider than p2p_cap are processed in extra p2p_cap-wide segments from
    # the CACHED candidate rows -- one walk total (the reference's
    # LEN_TASK flush loop, 2_Redundant/src/fmm.c:921,377-418, as a
    # space-slice; VERDICT r4 missing-5 + weak-4).  Segment-0 truncation
    # is then EXPECTED: OVF_P2P is re-derived as "rows extend beyond
    # passes * p2p_cap", so elastic recovery adds passes, not capacity.
    acc_seg = None
    if passes > 1:
        import dataclasses as _dc

        from photons_tpu.ops.traversal import OVF_P2P, p2p_segment_table
        acc_seg = jnp.zeros_like(tree.pos)
        more = jnp.asarray(False)
        for s_i in range(1, passes):
            tbl, _cnt, more_s = p2p_segment_table(
                leaf_cand, leaf_mask, cfg.p2p_neighbor_cap, s_i)
            lists_s = _dc.replace(lists, p2p=tbl, p2p_count=_cnt,
                                  overflow=jnp.asarray(False),
                                  overflow_bits=jnp.zeros((), jnp.int32))
            acc_si, nbr_ovf = p2p_stage(tree, lists_s, cfg, p2p_backend,
                                        leaf_active)
            acc_seg = acc_seg + acc_si
            more = more_s | nbr_ovf
        bits = ((lists.overflow_bits & ~OVF_P2P)
                | jnp.where(more, OVF_P2P, 0))
        lists = _dc.replace(lists, overflow=bits != 0, overflow_bits=bits)

    if layout == "sorted":
        if valid is not None:
            raise ValueError("layout='sorted' requires valid=None "
                             "(padding must occupy the sorted tail)")
        pos_sorted = tree.pos.reshape(-1, 3)[:n]
        perm = tree.perm[:n]
        tail = (lists,) if return_lists else ()
        if pm_gf is not None:
            acc_pm_leaf, fits = pm_from_tree(tree, cfg, pm_gf)
            (acc_s, acc_pm_s), diag = fmm_apply(
                tree, lists, cfg, p2p_backend=p2p_backend,
                leaf_active=leaf_active, extra_leaf=acc_pm_leaf,
                extra_acc_leaf=acc_seg, layout="sorted")
            diag = dict(diag)
            diag["cic_overflow"] = ~fits
            return (acc_s[:n], acc_pm_s[:n], pos_sorted, perm) + tail, diag
        acc_s, diag = fmm_apply(tree, lists, cfg, p2p_backend=p2p_backend,
                                leaf_active=leaf_active,
                                extra_acc_leaf=acc_seg, layout="sorted")
        return (acc_s[:n], pos_sorted, perm) + tail, diag

    if pm_gf is not None:
        acc_pm_leaf, fits = pm_from_tree(tree, cfg, pm_gf)
        (acc_all, acc_pm_all), diag = fmm_apply(
            tree, lists, cfg, p2p_backend=p2p_backend,
            leaf_active=leaf_active, extra_leaf=acc_pm_leaf,
            extra_acc_leaf=acc_seg)
        diag = dict(diag)
        # distinct key: elastic recovery must grow cfg.cic_tile for this,
        # not the traversal caps (growing those cannot fix a CIC overflow)
        diag["cic_overflow"] = ~fits
        return (acc_all[:n], acc_pm_all[:n]), diag

    acc_all, diag = fmm_apply(tree, lists, cfg, p2p_backend=p2p_backend,
                              leaf_active=leaf_active,
                              extra_acc_leaf=acc_seg)
    return acc_all[:n], diag


def fmm_forces_reuse(pos_sorted, lists: InteractionLists, pos_ref,
                     cfg: SimConfig, p2p_backend: str = "jnp", pm_gf=None,
                     active=None):
    """Force evaluation on CACHED interaction lists (Verlet list reuse,
    cfg.list_reuse > 1).

    ``pos_sorted`` must still be in the space-filling-curve order of the
    rebuild step that produced ``lists`` (cfg.sorted_state keeps it so --
    reuse steps never re-sort), and ``pos_ref`` is the position array of
    that rebuild step.  Only the AABB/center/width geometry and the
    multipoles are refreshed from the moved positions
    (:func:`tree_from_sorted`); the traversal tables are reused as-is.

    Correctness: the rebuild accepted every pair within
    cutoff*(1+verlet_skin), so the tables remain a superset of the true
    in-cutoff pair set while every particle has drifted less than
    skin/2 = verlet_skin*cutoff/2.  An on-device drift monitor reports
    ``skin_overflow`` in the diag; the driver treats it like a capacity
    overflow (roll back, rebuild, replay).  Listed pairs beyond the true
    cutoff merely add their (erfc-damped, ~zero) contribution.

    Returns ((acc, [acc_pm]) sorted order length N, diag).
    """
    n = pos_sorted.shape[0]
    leaf = cfg.leaf_size
    n_leaf = _next_pow2(-(-n // leaf))
    n_pad = n_leaf * leaf - n
    dtype = pos_sorted.dtype

    drift = _min_image(pos_sorted - pos_ref,
                       cfg.boxsize if cfg.periodic else None)
    drift2 = jnp.max(jnp.sum(drift * drift, axis=-1))
    skin = cfg.verlet_skin * cfg.cutoff_radius
    skin_overflow = drift2 > (0.5 * skin) ** 2

    if n_pad:
        pos_sorted = jnp.concatenate(
            [pos_sorted, jnp.zeros((n_pad, 3), dtype)])
    leaf_pos = pos_sorted.reshape(n_leaf, leaf, 3)
    leaf_mask = (jnp.arange(n_leaf * leaf) < n).reshape(n_leaf, leaf)
    tree = tree_from_sorted(leaf_pos, leaf_mask,
                            jnp.arange(n_leaf * leaf, dtype=jnp.int32),
                            cfg.particle_mass)

    leaf_active = None
    if active is not None:
        # active is already in the (frozen) sorted order: leaf rows gate
        # directly (block substeps reuse the macro-open lists;
        # active_particle surface of inc/adaptive.h)
        if n_pad:
            active = jnp.concatenate([active, jnp.zeros((n_pad,), bool)])
        leaf_active = jnp.any(active.reshape(n_leaf, leaf) & leaf_mask,
                              axis=1)

    if pm_gf is not None:
        acc_pm_leaf, fits = pm_from_tree(tree, cfg, pm_gf)
        (acc_s, acc_pm_s), diag = fmm_apply(
            tree, lists, cfg, p2p_backend=p2p_backend,
            leaf_active=leaf_active, extra_leaf=acc_pm_leaf,
            layout="sorted")
        diag = dict(diag)
        diag["cic_overflow"] = ~fits
        diag["skin_overflow"] = skin_overflow
        return (acc_s[:n], acc_pm_s[:n]), diag
    acc_s, diag = fmm_apply(tree, lists, cfg, p2p_backend=p2p_backend,
                            leaf_active=leaf_active, layout="sorted")
    diag = dict(diag)
    diag["skin_overflow"] = skin_overflow
    return (acc_s[:n],), diag


def make_fmm_force_fn(cfg: SimConfig, p2p_backend: str = "jnp"):
    """Closure over the config; jits inside the caller's step function."""
    def force_fn(pos):
        return fmm_forces(pos, cfg, p2p_backend=p2p_backend)
    return force_fn
