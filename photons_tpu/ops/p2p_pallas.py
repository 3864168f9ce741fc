"""Pallas TPU P2P kernels -- the near-field pair-interaction hot loop.

Two selectable data layouts, re-creating the reference's two GPU variants
(the subject of the redundancy study, arXiv:2403.01596) as TPU kernels:

- **redundant** (mirrors ComputeP2PDualNaive/SelfInteractions,
  ``2_Redundant/src/photoNs_CUDA.cu:225-466``): every target leaf's
  neighbor particles are pre-gathered (duplicated) into a dense
  (nleaf, 3, K*S) source stream by one XLA gather -- the kernel streams
  fully coalesced (S, 128) tiles with **zero indirection**, trading K-fold
  memory redundancy for pure sequential HBM traffic.

- **indexing** (mirrors ComputeP2PIndexing,
  ``1_Indexing/src/photoNs_CUDA.cu:250-387``): particle planes live once
  in HBM; the kernel reads the scalar-prefetched neighbor table and
  DMA-gathers each (3, S) source block on the fly, double-buffered so the
  gather latency hides behind compute -- **no memory redundancy**.

Both consume the per-target-leaf neighbor table built from the traversal's
P2P pair list; accumulation happens in VMEM across the stream (the
reference instead wrote per-task results and scatter-added on the host,
fmm.c:893-908 -- on TPU the revisited output block IS the accumulator).

Physics: softened Newtonian with the Ewald short-range damping g(r)
(see ops/kernels.py; applied here unlike the reference GPU kernels --
SURVEY.md quirk 2.6-2), minimum-image periodic displacements, self and
padded pairs masked by r2 > 0 / zero mass.

Layout notes (TPU tiling): positions are stored as coordinate *planes*
(..., 3, S) so interaction tiles are (S_targets, 128_sources) -- full VPU
lanes.  S = leaf_size; the source stream is chunked in 128-particle lanes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)
LANES = 128


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _erfc_exp(x):
    """(erfc(x), exp(-x^2)) via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7).

    Mosaic has no erf/erfc primitive; this rational form costs one exp +
    a fused polynomial on the VPU and shares the Gaussian with the damping
    term -- faster than a libm-grade erfc even where one exists.
    """
    t = 1.0 / (1.0 + 0.3275911 * x)
    e = jnp.exp(-x * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * e, e


def _pair_force_tile(tx, ty, tz, sx, sy, sz, sm, eps, rs, boxsize):
    """(S, C) interaction tile: returns (ax, ay, az) each (S,).

    tx/ty/tz (S,); sx/sy/sz/sm (C,).  Lanes = C sources.  rsqrt-based:
    one rsqrt + one divide (inside the rational erfc) per lane.
    """
    dx = sx[None, :] - tx[:, None]
    dy = sy[None, :] - ty[:, None]
    dz = sz[None, :] - tz[:, None]
    if boxsize is not None:
        dx = dx - boxsize * jnp.round(dx * (1.0 / boxsize))
        dy = dy - boxsize * jnp.round(dy * (1.0 / boxsize))
        dz = dz - boxsize * jnp.round(dz * (1.0 / boxsize))
    r2 = dx * dx + dy * dy + dz * dz
    inv_r = jax.lax.rsqrt(jnp.maximum(r2, 1e-30))
    r = r2 * inv_r
    inv_r3 = inv_r * inv_r * inv_r
    inv_r3 = jnp.where(r < eps, 1.0 / (eps * eps * eps), inv_r3)
    if rs is not None:
        ec, e = _erfc_exp((0.5 / rs) * r)
        inv_r3 = inv_r3 * (ec + (r * (_INV_SQRT_PI / rs)) * e)
    f = jnp.where(r2 > 0, sm[None, :] * inv_r3, 0.0)
    return (jnp.sum(f * dx, axis=1), jnp.sum(f * dy, axis=1),
            jnp.sum(f * dz, axis=1))


# ---------------------------------------------------------------------------
# neighbor table from the traversal pair list
# ---------------------------------------------------------------------------

def neighbor_table(pairs, n_leaf: int, cap: int):
    """(P, 2) padded pair list -> per-target table (n_leaf, cap), -1 padded.

    Also returns an overflow flag (any leaf with more than ``cap``
    partners).  This is the analogue of the reference's per-leaf
    maxNeighbors=1000 assumption (fmm.c:774).
    """
    tgt, src = pairs[:, 0], pairs[:, 1]
    valid = tgt >= 0
    tgt_c = jnp.where(valid, tgt, n_leaf)
    order = jnp.argsort(tgt_c, stable=True)
    tgt_s = tgt_c[order]
    src_s = jnp.where(valid, src, -1)[order]
    start = jnp.searchsorted(tgt_s, tgt_s, side="left")
    slot = jnp.arange(tgt_s.shape[0]) - start
    table = jnp.full((n_leaf + 1, cap), -1, jnp.int32)
    table = table.at[tgt_s, jnp.minimum(slot, cap - 1)].set(
        jnp.where(slot < cap, src_s, -1), mode="drop")
    counts = jnp.bincount(jnp.where(valid, tgt_c, n_leaf), length=n_leaf + 1)
    overflow = jnp.max(counts[:n_leaf]) > cap
    return table[:n_leaf], overflow


# target block width (sublane factor of the tile): smaller culls more
# pair volume but pays more per-row/per-block overhead.  Measured at
# 256^3/S=256 on a v5e: RT=64 LOSES 3.4 s/step net (the kept-block DMA
# count explodes 3M -> 18M and per-copy overhead eats the 0.556x volume
# cut), so the row-refined layout is OFF by default; the default cull is
# the QUAD mode below, which keeps one DMA per leaf pair and skips
# sub-tiles at compute time.  Env-overridable for hardware A/B
# (PHOTONS_REFINE_TARGET=128|64|32, 0 disables).
import os as _os
REFINE_TARGET = int(_os.environ.get("PHOTONS_REFINE_TARGET", "0"))
REFINE_SOURCE = 128      # source block width (must fill the 128 lanes)

# QUAD sub-tile culling (quad_masks): "ft,fs" target x source blocks per
# leaf-pair tile, mask-gated at compute time with full-leaf DMAs.
# Also measured a net LOSS at 256^3/S=256 (13.3 vs 8.4 s/step: the 8
# per-block pl.when sub-tiles and their vector-slice relayouts cost more
# than the 0.556x compute cut), so OFF by default; both cull layouts
# stay env-gated for future hardware.  "0" disables.
_quad_env = _os.environ.get("PHOTONS_P2P_QUAD", "0")
P2P_QUAD = (tuple(int(x) for x in _quad_env.split(","))
            if _quad_env not in ("0", "") else None)


def _block_geometry(tree, f: int):
    """Tight AABBs of the f equal blocks of each leaf along the SFC
    order: centers (f*nleaf, 3), full widths, and particle counts."""
    n_leaf, s = tree.pos.shape[:2]
    w = s // f
    p = tree.pos.reshape(n_leaf * f, w, 3)
    m = tree.mask.reshape(n_leaf * f, w)
    big = jnp.asarray(jnp.finfo(tree.pos.dtype).max, tree.pos.dtype)
    bmin = jnp.min(jnp.where(m[..., None], p, big), axis=1)
    bmax = jnp.max(jnp.where(m[..., None], p, -big), axis=1)
    cnt = jnp.sum(m, axis=1)
    nonempty = (cnt > 0)[:, None]
    c = jnp.where(nonempty, 0.5 * (bmin + bmax), 0.0)
    wd = jnp.where(nonempty, bmax - bmin, 0.0)
    return c, wd, cnt


def refine_table(tree, table, cutoff: float, boxsize, cap: int,
                 ft: int = 2, fs: int = 2):
    """Refine the per-leaf neighbor table to sub-leaf block granularity,
    culling (target block, source block) pairs whose tight AABBs lie
    wholly beyond the cutoff.

    The traversal's discard test (gap^2 >= cutoff^2) runs at leaf
    granularity with grid-cell bounds; with large compute leaves (S=256:
    leaf width ~ 1.1x the cutoff at 256^3) most of each listed (S x S)
    tile is out of range.  Splitting each leaf into ft target blocks and
    fs source blocks along the space-filling-curve order (blocks are
    spatially compact) keeps full 128-lane tiles (source blocks stay
    >= 128 wide; target blocks become the tile's sublane factor, free to
    shrink) while the finer granularity -- and the TIGHT particle AABBs,
    strictly smaller than the traversal's grid cells -- culls the corner
    volume on both factors.  Measured on uniform 64^3 (S=256): kept pair
    volume 0.67x at (2,2), 0.56x at (4,2), 0.47x at (8,2).  The
    reference has no analogue (its GPU kernel computes every listed leaf
    pair in full).

    table (nleaf, K) leaf indices -> (ft*nleaf, cap) source-block
    indices into the (fs*nleaf, S/fs) blocked particle arrays (row =
    target block), plus an overflow flag (some row kept > cap).
    """
    from jax import lax

    n_leaf = tree.pos.shape[0]
    tc, twd, tcnt = _block_geometry(tree, ft)
    sc, swd, scnt = _block_geometry(tree, fs)

    # candidate source blocks per TARGET block: the fs blocks of every
    # leaf listed for its parent leaf (same candidates for all ft halves)
    k = table.shape[1]
    valid = table >= 0
    safe = jnp.maximum(table, 0)
    cand = (safe[:, :, None] * fs
            + jnp.arange(fs, dtype=table.dtype)).reshape(n_leaf, fs * k)
    cand = jnp.repeat(cand, ft, axis=0)                  # (ft*nleaf, fs*k)
    cvalid = jnp.repeat(jnp.repeat(valid, fs, axis=1), ft, axis=0)

    # per-axis scalar gathers: each produces a 2-D (rows, fs*k) f32 array
    # with full-lane minor dim.  (A single packed (rows*cols, 7) row
    # gather is NOT cheaper here: the 7-wide minor dim lane-pads to 128
    # on TPU -- an 18x memory blowup, 24 GB at 256^3.)
    gap2 = 0.0
    for ax in range(3):
        d = tc[:, None, ax] - sc[:, ax][cand]
        if boxsize is not None:
            d = d - boxsize * jnp.round(d * (1.0 / boxsize))
        g = jnp.maximum(jnp.abs(d)
                        - 0.5 * (twd[:, None, ax] + swd[:, ax][cand]), 0.0)
        gap2 = gap2 + g * g
    keep = (cvalid & (scnt[cand] > 0) & (tcnt[:, None] > 0)
            & (gap2 < cutoff * cutoff))

    big = jnp.iinfo(jnp.int32).max
    keyed = jnp.where(keep, cand.astype(jnp.int32), big)
    packed = lax.sort(keyed, dimension=1)[:, :cap]
    packed = jnp.where(packed == big, -1, packed)
    counts = jnp.sum(keep, axis=1)
    return packed, jnp.any(counts > cap)


def halve_table(tree, table, cutoff: float, boxsize, cap: int):
    """Half-leaf refinement on both sides (refine_table at ft=fs=2)."""
    return refine_table(tree, table, cutoff, boxsize, cap, ft=2, fs=2)


def quad_masks(tree, table, cutoff: float, boxsize, ft: int = 4,
               fs: int = 2):
    """Sub-tile cull masks at full-leaf DMA granularity.

    For every (target leaf, listed source leaf) pair, an ft*fs-bit mask
    whose bit (ti*fs + sj) says target block ti and source block sj are
    within the cutoff of each other (tight particle AABBs).  The kernel
    keeps ONE combined-row DMA per leaf pair -- the refine_table layout
    instead multiplied the DMA count by ~6x, which cost more than its
    0.556x compute cut (BENCH_NOTES) -- and gates each (S/ft x S/fs)
    sub-tile on its bit, skipping the same out-of-range corner volume at
    compute time only.

    Returns (table', masks) both (nleaf, K): entries whose mask is zero
    are dropped and rows re-packed (table' <= table).
    """
    from jax import lax

    n_leaf = tree.pos.shape[0]
    tc, twd, tcnt = _block_geometry(tree, ft)    # (ft*nleaf, ...)
    sc, swd, scnt = _block_geometry(tree, fs)

    k = table.shape[1]
    valid = table >= 0
    safe = jnp.maximum(table, 0)

    # target-side geometry needs no gather (pure reshape/slice); source
    # gathers are hoisted out of the target loop: fs * 7 row gathers total
    tcr = tc.reshape(n_leaf, ft, 3)
    twr = twd.reshape(n_leaf, ft, 3)
    tcn = tcnt.reshape(n_leaf, ft)

    mask = jnp.zeros((n_leaf, k), jnp.int32)
    for sj in range(fs):
        cand = safe * fs + sj                    # (nleaf, k) source blocks
        sg = [sc[:, ax][cand] for ax in range(3)]
        sw = [swd[:, ax][cand] for ax in range(3)]
        scn = scnt[cand] > 0
        for ti in range(ft):
            gap2 = 0.0
            for ax in range(3):
                d = tcr[:, ti, ax][:, None] - sg[ax]
                if boxsize is not None:
                    d = d - boxsize * jnp.round(d * (1.0 / boxsize))
                g = jnp.maximum(
                    jnp.abs(d) - 0.5 * (twr[:, ti, ax][:, None] + sw[ax]),
                    0.0)
                gap2 = gap2 + g * g
            hit = (valid & (gap2 < cutoff * cutoff)
                   & scn & (tcn[:, ti] > 0)[:, None])
            mask = mask | (hit.astype(jnp.int32) << (ti * fs + sj))

    # drop entries whose mask is empty (whole tile out of range on tight
    # bounds); paired stable sort keeps (entry, mask) columns aligned
    keep = mask > 0
    key = jnp.where(keep, 0, 1).astype(jnp.int32)
    ent = jnp.where(keep, safe, -1).astype(jnp.int32)
    _, packed_e, packed_m = lax.sort(
        (key, ent, mask), dimension=1, is_stable=True, num_keys=1)
    return packed_e, packed_m


# ---------------------------------------------------------------------------
# redundant layout
# ---------------------------------------------------------------------------

def pack_redundant(planes, masses, table, leaf_size: int, centers=None,
                   boxsize=None):
    """Gather the packed per-target source stream (the 'collect' phase,
    2_Redundant/src/remotes.c:64-97 done as one XLA gather).

    planes (nleaf, 3, S), masses (nleaf, S), table (nleaf, K) ->
    src_planes (nleaf, 3, K*S), src_mass (nleaf, K*S), K*S padded to LANES.

    With ``centers`` (nleaf, 3): positions are stored *relative to the
    target leaf center* (wrapped toward it at pack time), which removes the
    float32 cancellation of forming small pair separations from absolute
    box coordinates.  The kernel still applies a per-pair minimum-image
    wrap: Morton-chunk AABBs can exceed half the box near octant
    boundaries, so a single per-leaf image choice is not always valid.
    """
    n_leaf, k = table.shape
    s = leaf_size
    safe = jnp.where(table >= 0, table, 0)
    src_p = planes[safe]                                # (nleaf, K, 3, S)
    src_m = jnp.where((table >= 0)[..., None], masses[safe], 0.0)
    if centers is not None:
        c = centers[:, None, :, None]                   # (nleaf, 1, 3, 1)
        src_p = src_p - c
        if boxsize is not None:
            src_p = src_p - boxsize * jnp.round(src_p / boxsize)
    src_p = jnp.moveaxis(src_p, 2, 1).reshape(n_leaf, 3, k * s)
    src_m = src_m.reshape(n_leaf, 1, k * s)
    ks_pad = -(-k * s // LANES) * LANES - k * s
    if ks_pad:
        src_p = jnp.pad(src_p, ((0, 0), (0, 0), (0, ks_pad)))
        src_m = jnp.pad(src_m, ((0, 0), (0, 0), (0, ks_pad)))
    return src_p, src_m


def _redundant_kernel(cnt_ref, tgt_ref, src_ref, sm_ref, out_ref, *,
                      eps, rs, boxsize):
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(k < cnt_ref[i])
    def _():
        tx, ty, tz = tgt_ref[0, 0, :], tgt_ref[0, 1, :], tgt_ref[0, 2, :]
        sx, sy, sz = src_ref[0, 0, :], src_ref[0, 1, :], src_ref[0, 2, :]
        ax, ay, az = _pair_force_tile(
            tx, ty, tz, sx, sy, sz, sm_ref[0, 0, :], eps, rs, boxsize)
        out_ref[0, 0, :] += ax
        out_ref[0, 1, :] += ay
        out_ref[0, 2, :] += az


def p2p_redundant(planes, masses, src_planes, src_mass, *, eps: float,
                  rs: Optional[float], boxsize: Optional[float] = None,
                  chunk_counts=None,
                  interpret: Optional[bool] = None):
    """Streaming kernel over the pre-packed source stream.

    planes (nleaf, 3, S) target coordinates (may be leaf-center-relative
    when the stream was packed that way -- displacements are min-image
    wrapped in-kernel either way, since Morton-chunk AABBs can span more
    than half the box near octant boundaries); chunk_counts (nleaf,) = used
    128-lane chunks per leaf (dead chunks are skipped: no compute, and the
    clamped index map avoids re-fetching).  Returns (nleaf, 3, S).
    """
    n_leaf, _, s = planes.shape
    ks = src_planes.shape[-1]
    chunk = LANES
    n_chunks = ks // chunk
    if chunk_counts is None:
        chunk_counts = jnp.full((n_leaf,), n_chunks, jnp.int32)
    kernel = partial(_redundant_kernel, eps=eps, rs=rs, boxsize=boxsize)

    def clamp_k(i, k, cnt):
        return jnp.minimum(k, jnp.maximum(cnt[i] - 1, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_leaf, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 3, s), lambda i, k, cnt: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, chunk),
                         lambda i, k, cnt: (i, 0, clamp_k(i, k, cnt)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk),
                         lambda i, k, cnt: (i, 0, clamp_k(i, k, cnt)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, s), lambda i, k, cnt: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_leaf, 3, s), planes.dtype),
        interpret=_interpret_default() if interpret is None else interpret,
    )(chunk_counts.astype(jnp.int32), planes, src_planes, src_mass)


# ---------------------------------------------------------------------------
# indexing layout (kernel in p2p_pallas_indexing.py)
# ---------------------------------------------------------------------------

def _leaf_blocks(planes, masses, f: int):
    """Split (nleaf, 3, S) planes + (nleaf, S) masses into the f
    SFC-order blocks per leaf: ((f*nleaf, 3, S/f), (f*nleaf, S/f))."""
    n_leaf, _, s = planes.shape
    w = s // f
    bp = jnp.moveaxis(planes.reshape(n_leaf, 3, f, w), 2, 1)
    return bp.reshape(n_leaf * f, 3, w), masses.reshape(n_leaf * f, w)


def p2p_indexing(planes, masses, table, *, eps: float, rs: Optional[float],
                 boxsize: Optional[float], interpret: Optional[bool] = None,
                 refine: Optional[tuple] = None,
                 quad: Optional[tuple] = None, masks=None):
    """Gather-through-the-index kernel: source blocks DMA'd from HBM inside
    the kernel through the neighbor table (no data duplication).

    planes (nleaf, 3, S), masses (nleaf, S), table (nleaf, K) ->
    (nleaf, 3, S) accelerations.

    ``refine``: optional (ft, fs) -- the table holds sub-leaf source
    block indices (from :func:`refine_table`, shape (ft*nleaf, K)); the
    kernel then runs one grid row per TARGET BLOCK with (S/ft, S/fs)
    tiles -- the cutoff-culled fine-granularity stream, sources at full
    128-lane width.
    """
    from photons_tpu.ops.p2p_pallas_indexing import (
        p2p_indexing_rows, pack_combined_rows)

    n_leaf, _, s = planes.shape
    interp = _interpret_default() if interpret is None else interpret
    if refine is not None:
        ft, fs = refine
        st, ss = s // ft, s // fs
        tp, tm = _leaf_blocks(planes, masses, ft)
        sp, sm = (tp, tm) if fs == ft else _leaf_blocks(planes, masses, fs)
        rows = p2p_indexing_rows(
            pack_combined_rows(tp, tm), table, st, eps=eps, rs=rs,
            boxsize=boxsize, pair_tile=_pair_force_tile, interpret=interp,
            combined_src=pack_combined_rows(sp, sm), s_src=ss)
        acc = rows[:, :3 * st].reshape(n_leaf, ft, 3, st)
        return jnp.moveaxis(acc, 1, 2).reshape(n_leaf, 3, s)
    combined = pack_combined_rows(planes, masses)
    rows = p2p_indexing_rows(
        combined, table, s, eps=eps, rs=rs, boxsize=boxsize,
        pair_tile=_pair_force_tile, interpret=interp,
        quad=quad, masks=masks)
    return rows[:, :3 * s].reshape(n_leaf, 3, s)


# ---------------------------------------------------------------------------
# engine entry
# ---------------------------------------------------------------------------

def p2p_prepare(tree, lists, mass: float,
                boxsize: Optional[float], layout: str = "redundant",
                neighbor_cap: Optional[int] = None, leaf_active=None,
                cutoff: Optional[float] = None):
    """The 'collect' phase (dtime_p2p_collect analogue): build the kernel's
    input layout from the tree + neighbor table.  Returns a dict of arrays
    consumed by :func:`p2p_compute`."""
    n_leaf, s = tree.pos.shape[:2]
    # the traversal emits the per-leaf neighbor table directly (rows are
    # front-packed, -1 padded); truncation there is already surfaced via
    # lists.overflow.  Optionally tighten/lane-align the column count.
    table = lists.p2p
    overflow = jnp.asarray(False)
    if neighbor_cap is not None and neighbor_cap < table.shape[1]:
        overflow = jnp.any(table[:, neighbor_cap:] >= 0)
        table = table[:, :neighbor_cap]

    planes = jnp.moveaxis(tree.pos, -1, 1)              # (nleaf, 3, S)
    masses = jnp.where(tree.mask, mass, 0.0).astype(tree.pos.dtype)

    if layout == "redundant":
        centers = tree.centers[-1]
        src_planes, src_mass = pack_redundant(planes, masses, table, s,
                                              centers=centers,
                                              boxsize=boxsize)
        tgt_rel = planes - centers[:, :, None]
        used = jnp.sum(table >= 0, axis=1) * s
        chunk_counts = -(-used // LANES)
        if leaf_active is not None:
            # block timestepping: inactive target rows are skipped by the
            # kernel's pl.when (zero used chunks -> no tile compute)
            chunk_counts = jnp.where(leaf_active, chunk_counts, 0)
        return {"layout": layout, "tgt": tgt_rel, "masses": masses,
                "src_planes": src_planes, "src_mass": src_mass,
                "chunk_counts": chunk_counts, "overflow": overflow}
    elif layout == "indexing":
        if leaf_active is not None:
            # inactive rows: empty the table row (entries -1 -> the kernel
            # masks the sources; row DMA still runs but computes nothing)
            table = jnp.where(leaf_active[:, None], table, -1)
        refine = quad = masks = None
        if cutoff is not None and s >= 2 * LANES:
            if REFINE_TARGET > 0:
                # row-refined layout (A/B only -- loses on DMA count):
                # sources stay 128-lane blocks; targets shrink to the
                # REFINE_TARGET sublane factor.  cap = fs*K keeps every
                # candidate, so no new truncation.
                ft, fs = s // REFINE_TARGET, s // REFINE_SOURCE
                table, _ = refine_table(tree, table, cutoff, boxsize,
                                        cap=fs * table.shape[1],
                                        ft=ft, fs=fs)
                refine = (ft, fs)
            elif P2P_QUAD is not None:
                # default cull: full-leaf DMAs, mask-gated sub-tiles
                quad = P2P_QUAD
                table, masks = quad_masks(tree, table, cutoff, boxsize,
                                          ft=quad[0], fs=quad[1])
        if quad is None:
            # pad the table row so that [count | entries] lane-aligns
            # (SMEM DMA granularity: 128 int32 = 512 B; the kernel embeds
            # the per-row count as element 0).  In quad mode the row is
            # [count | entries | masks] -- odd total, so the rows helper's
            # final zero-pad handles alignment.
            k_pad = (-(-(table.shape[1] + 1) // LANES) * LANES
                     - 1 - table.shape[1])
            if k_pad:
                table = jnp.pad(table, ((0, 0), (0, k_pad)),
                                constant_values=-1)
        return {"layout": layout, "planes": planes, "masses": masses,
                "table": table, "overflow": overflow, "refine": refine,
                "quad": quad, "masks": masks}
    raise ValueError(f"unknown P2P layout {layout!r}")


def p2p_compute(prepared, eps: float, rs: Optional[float],
                boxsize: Optional[float],
                interpret: Optional[bool] = None):
    """The kernel phase (dtime_p2p_self analogue) over a prepared layout.

    Returns per-particle acc (nleaf, S, 3)."""
    if prepared["layout"] == "redundant":
        acc = p2p_redundant(prepared["tgt"], prepared["masses"],
                            prepared["src_planes"], prepared["src_mass"],
                            eps=eps, rs=rs, boxsize=boxsize,
                            chunk_counts=prepared["chunk_counts"],
                            interpret=interpret)
    else:
        acc = p2p_indexing(prepared["planes"], prepared["masses"],
                           prepared["table"], eps=eps, rs=rs,
                           boxsize=boxsize, interpret=interpret,
                           refine=prepared.get("refine"),
                           quad=prepared.get("quad"),
                           masks=prepared.get("masks"))
    return jnp.moveaxis(acc, 1, -1)                     # (nleaf, S, 3)


def p2p_hybrid(tree, lists, mass: float, eps: float, rs: Optional[float],
               boxsize: Optional[float], k_threshold: int = 64,
               interpret: Optional[bool] = None, leaf_active=None,
               cutoff: Optional[float] = None):
    """K-bucketed hybrid of the two reference layouts (VERDICT r3 next-8).

    The redundant stream wins on uniform neighbor balls (pure streaming,
    no in-kernel gather) but its pre-gathered (nleaf, 3, K*S) source
    copies scale with the WIDEST row: the packaged merger's Plummer cores
    push K past HBM (measured 19.3 GB at p2p_cap 384, leaf 64 -- the
    config the round-3 study could not run).  The indexing kernel gathers
    through the table in-kernel, so its task list is index-only but every
    row pays DMA latency.  Bucketing by the MEASURED row count K gets
    both: leaves with <= k_threshold neighbors take the redundant stream
    (whose pack is now bounded by k_threshold, not the cap), hot leaves
    take the indexing path.  The reference bounds the same blowup by
    flushing LEN_TASK=16384-task batches (2_Redundant/src/fmm.c:921) --
    a time slice where this is a space slice, which TPU prefers: one
    kernel launch per bucket instead of a flush loop.
    """
    import dataclasses as _dc
    table = lists.p2p
    rowcount = jnp.sum(table >= 0, axis=1)
    low = rowcount <= k_threshold
    act_lo = low if leaf_active is None else (low & leaf_active)
    act_hi = (~low) if leaf_active is None else ((~low) & leaf_active)
    # low rows keep all their (<= k_threshold) entries; high rows are
    # blanked so the pack gathers nothing for them
    tbl_lo = jnp.where(low[:, None], table[:, :k_threshold], -1)
    acc_lo, ovf_lo = p2p_pallas(tree, _dc.replace(lists, p2p=tbl_lo),
                                mass, eps, rs, boxsize, layout="redundant",
                                interpret=interpret, leaf_active=act_lo)
    acc_hi, ovf_hi = p2p_pallas(tree, lists, mass, eps, rs, boxsize,
                                layout="indexing", interpret=interpret,
                                leaf_active=act_hi, cutoff=cutoff)
    return acc_lo + acc_hi, ovf_lo | ovf_hi


def p2p_pallas(tree, lists, mass: float, eps: float, rs: Optional[float],
               boxsize: Optional[float], layout: str = "redundant",
               neighbor_cap: Optional[int] = None,
               interpret: Optional[bool] = None, leaf_active=None,
               cutoff: Optional[float] = None):
    """P2P via a Pallas kernel -> per-particle acc (nleaf, S, 3).

    Drop-in replacement for ops.fmm_engine.p2p_jnp (= prepare + compute;
    split out so the phase profiler can time collect vs kernel separately,
    the reference's dtime_p2p_collect / dtime_p2p_self distinction).

    ``cutoff``: enables sub-leaf block culling for the indexing layout
    when S >= 256 (see refine_table).
    """
    prepared = p2p_prepare(tree, lists, mass, boxsize, layout=layout,
                           neighbor_cap=neighbor_cap,
                           leaf_active=leaf_active, cutoff=cutoff)
    acc = p2p_compute(prepared, eps, rs, boxsize, interpret=interpret)
    return acc, prepared["overflow"]
