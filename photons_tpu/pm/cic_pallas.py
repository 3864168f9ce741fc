"""Pallas TPU kernels for CIC mass assignment and force readout.

The reference's CIC loops (partmesh.c:881-951 paint, :1256-1550 readout)
become XLA scatter/gather in the straightforward port -- and TPU scatters
and row gathers run near memory-latency-per-element speed: measured 1.46 s
(paint) + 2.67 s (readout) per step at 256^3, over 4 s of a 14 s step.

These kernels exploit the engine's Hilbert leaf blocking (SURVEY.md 7
"scatter-add contention -> Pallas accumulation by target tile"): particles
arrive as (nleaf, S) spatially-compact blocks, so each leaf touches a
small (T, T, full-z) brick of the mesh.  Per leaf:

  1. DMA the brick from the (halo-padded) mesh in HBM to VMEM,
  2. build per-axis CIC weight matrices Wx (S, T), Wy (S, T), Wz (S, nz)
     -- each row has two adjacent nonzeros (1-f, f) placed by iota
     comparison, no scatter anywhere,
  3. accumulate the separable outer product via ONE MXU matmul:
     brick += (Wx (x) Wy)^T . Wz, shape (T*T, nz),
  4. DMA the brick back.

The grid iterates leaves sequentially ("arbitrary" semantics), so the
read-modify-write brick updates never race.  Readout is the transpose:
gather the gradient brick, M = brick . Wz^T, then a row-wise contraction
with (Wx (x) Wy).

Axis layout: every axis carries a HALO-cell periodic margin
(folded/padded outside the kernels).  x/y are the brick-sliced dims; z is
the lane dimension, sliced to a _z_tile-cell WINDOW at a 128-aligned
origin (Mosaic accepts dynamic lane-dim DMA offsets only with a
pl.multiple_of(., 128) hint).  A 256-lane window at a 128-aligned origin
contains any leaf footprint up to 127 z cells wherever it falls -- at a
512^3 mesh this cuts the per-brick DMA + contraction width from 640
padded lanes to 256 (2.5x on both HBM traffic and MXU flops; meshes
<= 248 use the whole padded axis as before).

Readout double-buffers the brick DMA across gradient components AND grid
steps, so every contraction overlaps the next fetch.  (Lane-fusing the
three components into one (npx, npy, 3*npz) field would halve the DMA
count further, but its (2, t, t, 3*npz) scratch exceeds the ~16 MB
scoped-VMEM budget at t=32 when the kernel is co-scheduled inside the
full step program -- measured compile failure at 256^3.)  Paint stays
single-buffered: consecutive Hilbert leaves touch overlapping bricks, so
prefetching the next brick before the current read-modify-write lands
would race.

Leaves whose AABB exceeds the T-cell brick (rare: underdense regions at
late times) are detected and handled by the caller's XLA fallback on a
compacted residual subset; the kernels clamp their indices so the flag is
the only effect.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 4        # cells of periodic margin on each face (CIC reaches 1)

# MXU passes for the f32 brick contractions: HIGHEST = 6-pass bf16
# emulation (exact f32); DEFAULT = single-pass bf16 (Mosaic's Pallas
# lowering supports only these two).  Env-switchable for A/B timing on
# hardware; DEFAULT needs an accuracy gate before adoption (bf16-rounded
# CIC weights cost ~2e-3 relative on the PM component).
import os as _os
_DOT_PRECISION = getattr(
    jax.lax.Precision,
    _os.environ.get("PHOTONS_CIC_PRECISION", "HIGHEST").upper(),
    jax.lax.Precision.HIGHEST)


def effective_tile(n_side: int, tile: int) -> int:
    """Clamp the brick tile to the padded mesh (small test meshes)."""
    logical = n_side + 2 * HALO
    return min(tile, (logical // 8) * 8)


def _mesh_dims(n_side: int):
    """Padded mesh dims: every axis carries the 2H periodic halo; y
    rounds to the 8-sublane tile and z to the 128-lane tile.

    z used to be halo-free (wrap in the weight matrix, full-z bricks),
    but at a 512^3 mesh the full-z column made every brick DMA and MXU
    contraction 640 lanes wide -- ~1 TB of DMA and ~66 Tflop per read
    pass.  Bricks are now z-WINDOWED (_z_tile cells at a 128-aligned
    origin), which needs real z ghost planes like x/y."""
    logical = n_side + 2 * HALO
    npx = logical
    npy = -(-logical // 8) * 8
    npz = -(-logical // 128) * 128
    return logical, npx, npy, npz


def _mesh_dims3(lx: int, ly: int, lz: int):
    """Padded dims for a non-cubic logical extent (sharded PM patches:
    (px, py, n_side) with the decomposed x/y axes smaller than the
    mesh).  Same halo/tiling rules as :func:`_mesh_dims`."""
    npx = lx + 2 * HALO
    npy = -(-(ly + 2 * HALO) // 8) * 8
    npz = -(-(lz + 2 * HALO) // 128) * 128
    return npx, npy, npz


def _z_tile(n_side: int) -> int:
    """Brick z-window size: Mosaic requires 128-aligned dynamic lane
    offsets, so a 256-cell window at a 128-aligned origin contains any
    leaf footprint up to 127 z cells regardless of where it falls."""
    _, _, _, npz = _mesh_dims(n_side)
    return min(256, npz)


def _z_tile_of(npz: int) -> int:
    return min(256, npz)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


MAX_PREFETCH_ROWS = 1 << 17
"""Max leaf rows per kernel call: the per-leaf packed origins ride the
scalar-prefetch channel into SMEM (1 MB), so 512^3-scale leaf counts
(1M at S=128) must be row-chunked (measured: a 4 MB SMEM demand fails
AOT compilation)."""


def _z_weights(coord, inv_delta, oz, tz: int, wts=None):
    """Window-relative z CIC weight matrix (S, tz).

    ``coord`` is the HALO-shifted z coordinate (like x/y); ``oz`` the
    brick's 128-aligned padded z origin.  No wrap: the mesh carries real
    z ghost planes (fold_halos / pad_periodic), so rows are simply
    (1-f) at i-oz and f at i-oz+1, clipped into the window (out-of-window
    rows belong to non-fitting leaves whose results are discarded)."""
    u = coord * inv_delta - 0.5
    c = jnp.floor(u)
    f = (u - c).astype(coord.dtype)
    i0 = jnp.clip(c.astype(jnp.int32) - oz, 0, tz - 2)
    iota = jax.lax.broadcasted_iota(jnp.int32, (coord.shape[0], tz), 1)
    w = jnp.where(iota == i0[:, None], (1.0 - f)[:, None], 0.0)
    w = w + jnp.where(iota == i0[:, None] + 1, f[:, None], 0.0)
    if wts is not None:
        w = w * wts[:, None]
    return w


def _xy_weights(px, py, inv_delta, ox, oy, t: int):
    """(S, t*t) separable CIC weights W[s, i*t+j] = Wx[s,i] * Wy[s,j].

    Built directly at 2-D resolution via integer iota decomposition --
    Mosaic rejects the (S, t, t) -> (S, t*t) shape cast."""
    def parts(coord, origin):
        u = coord * inv_delta - 0.5
        c = jnp.floor(u)
        f = (u - c).astype(coord.dtype)
        return jnp.clip(c.astype(jnp.int32) - origin, 0, t - 2), f

    ix, fx = parts(px, ox)
    iy, fy = parts(py, oy)
    iota = jax.lax.broadcasted_iota(jnp.int32, (px.shape[0], t * t), 1)
    row = iota // t
    col = iota - row * t
    wxb = jnp.where(row == ix[:, None], (1.0 - fx)[:, None], 0.0) \
        + jnp.where(row == ix[:, None] + 1, fx[:, None], 0.0)
    wyb = jnp.where(col == iy[:, None], (1.0 - fy)[:, None], 0.0) \
        + jnp.where(col == iy[:, None] + 1, fy[:, None], 0.0)
    return wxb * wyb


_DN_CONTRACT_0 = (((0,), (0,)), ((), ()))    # (S, A)^T . (S, B) -> (A, B)
_DN_CONTRACT_1 = (((1,), (1,)), ((), ()))    # (A, K) . (B, K)^T -> (A, B)


def _unpack_origin(packed):
    ox = packed >> 20
    oy = pl.multiple_of(((packed >> 10) & 0x3FF) * 8, 8)
    oz = pl.multiple_of((packed & 0x3FF) * 128, 128)
    return ox, oy, oz


def _paint_kernel(origins, px_ref, py_ref, pz_ref, wt_ref, mesh_ref,
                  out_ref, brick, sem_in, sem_out, *,
                  t: int, tz: int, inv_delta: float):
    i = pl.program_id(0)
    ox, oy, oz = _unpack_origin(origins[i])

    cp_in = pltpu.make_async_copy(
        out_ref.at[pl.ds(ox, t), pl.ds(oy, t), pl.ds(oz, tz)], brick, sem_in)
    cp_in.start()

    xy = _xy_weights(px_ref[0, 0, :], py_ref[0, 0, :], inv_delta, ox, oy, t)
    # window-relative z weights; they carry the particle masses
    wz = _z_weights(pz_ref[0, 0, :], inv_delta, oz, tz,
                    wts=wt_ref[0, 0, :])

    # (t*t, tz) = sum_s xy[s, :] (x) wz[s, :] -- one MXU contraction
    add = jax.lax.dot_general(xy, wz, _DN_CONTRACT_0,
                              preferred_element_type=jnp.float32,
                              precision=_DOT_PRECISION)
    cp_in.wait()
    for r in range(t):                       # row-sliced: no 3-D reshape
        brick[r] += add[r * t:(r + 1) * t, :].astype(brick.dtype)
    cp_out = pltpu.make_async_copy(
        brick, out_ref.at[pl.ds(ox, t), pl.ds(oy, t), pl.ds(oz, tz)],
        sem_out)
    cp_out.start()
    cp_out.wait()


def paint_leaves(leaf_pos, leaf_wts, origins, n_side: int, tile: int,
                 boxsize: float, interpret: Optional[bool] = None,
                 dims: Optional[Tuple[int, int, int]] = None,
                 cell_units: bool = False):
    """Accumulate leaf-blocked particles onto a halo-padded mesh.

    leaf_pos (nleaf, S, 3) absolute positions (padding slots anywhere,
    weight 0); leaf_wts (nleaf, S); origins (nleaf,) packed int32 brick
    corners in PADDED cell coordinates.  Returns (npx, npy, npz) f32
    with periodic halos on every axis (see _mesh_dims).

    ``dims``: logical (lx, ly, lz) extents for a non-cubic buffer
    (sharded PM patches); default the full (n, n, n) mesh.
    ``cell_units``: positions are already CELL-CENTER coordinates
    (i0 + frac + 0.5, e.g. patch-frame after a mod-n shift) -- the
    wrappers then use delta=1, which keeps the caller's integer cell
    shift exact instead of round-tripping through * delta.
    """
    n_leaf, s = leaf_wts.shape
    if n_leaf > MAX_PREFETCH_ROWS:
        # the per-leaf origin array rides the scalar-prefetch channel:
        # SMEM is 1 MB, so >256K leaves cannot prefetch in one call
        # (512^3 at S=128 has 1M leaves -- measured 4 MB SMEM demand).
        # Chunk the TARGET rows; each call paints its own mesh, summed.
        out = None
        for c0 in range(0, n_leaf, MAX_PREFETCH_ROWS):
            c1 = c0 + MAX_PREFETCH_ROWS
            part = paint_leaves(leaf_pos[c0:c1], leaf_wts[c0:c1],
                                origins[c0:c1], n_side, tile, boxsize,
                                interpret=interpret, dims=dims,
                                cell_units=cell_units)
            out = part if out is None else out + part
        return out
    if dims is None:
        _, npx, npy, npz = _mesh_dims(n_side)
    else:
        npx, npy, npz = _mesh_dims3(*dims)
    tz = _z_tile_of(npz)
    delta = 1.0 if cell_units else boxsize / n_side
    kernel = functools.partial(_paint_kernel, t=tile, tz=tz,
                               inv_delta=1.0 / delta)

    # all axes shifted so padded cell index = floor(u) + HALO >= 0
    shift = HALO * delta
    # (nleaf, 1, S) pages: (1, 1, S) blocks satisfy the (8, 128) tiling
    # rule through dim equality (same trick as the indexing P2P kernel)
    px = (leaf_pos[:, :, 0] + shift)[:, None, :]
    py = (leaf_pos[:, :, 1] + shift)[:, None, :]
    pz = (leaf_pos[:, :, 2] + shift)[:, None, :]
    wts3 = leaf_wts[:, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_leaf,),
        in_specs=[
            pl.BlockSpec((1, 1, s), lambda i, o: (i, 0, 0)),    # px
            pl.BlockSpec((1, 1, s), lambda i, o: (i, 0, 0)),    # py
            pl.BlockSpec((1, 1, s), lambda i, o: (i, 0, 0)),    # pz
            pl.BlockSpec((1, 1, s), lambda i, o: (i, 0, 0)),    # weights
            pl.BlockSpec(memory_space=pl.ANY),         # mesh (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((tile, tile, tz), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    mesh0 = jnp.zeros((npx, npy, npz), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npx, npy, npz), jnp.float32),
        input_output_aliases={5: 0},     # mesh0 (after scalar prefetch) -> out
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret_default() if interpret is None else interpret,
    )(origins, px, py, pz, wts3, mesh0)


def _read_kernel(origins, px_ref, py_ref, pz_ref, gx_ref, gy_ref, gz_ref,
                 out_ref, bricks, sems, *, t: int, tz: int,
                 inv_delta: float, num_leaves: int):
    i = pl.program_id(0)
    g_refs = (gx_ref, gy_ref, gz_ref)

    def fetch(slot, idx, c):
        ox, oy, oz = _unpack_origin(origins[idx])
        return pltpu.make_async_copy(
            g_refs[c].at[pl.ds(ox, t), pl.ds(oy, t), pl.ds(oz, tz)],
            bricks.at[slot], sems.at[slot])

    @pl.when(i == 0)
    def _():
        fetch(0, 0, 0).start()

    # weight build overlaps the in-flight brick DMA
    ox, oy, oz = _unpack_origin(origins[i])
    xy = _xy_weights(px_ref[0, 0, :], py_ref[0, 0, :], inv_delta, ox, oy, t)
    wz = _z_weights(pz_ref[0, 0, :], inv_delta, oz, tz)

    # per-component double-buffered pipeline: while component c's brick
    # is contracted, component c+1's (or the next leaf's first) brick is
    # in flight.  (A single lane-fused 3-component brick halves the DMA
    # count but its (2, t, t, 3*npz) scratch blows the ~16 MB scoped-VMEM
    # budget at t=32 when co-scheduled inside the step program.)
    for c in range(3):
        slot = (3 * i + c) % 2
        if c < 2:
            fetch((slot + 1) % 2, i, c + 1).start()
        else:
            @pl.when(i + 1 < num_leaves)
            def _():
                fetch((slot + 1) % 2, i + 1, 0).start()
        fetch(slot, i, c).wait()
        # (t*t, tz) via sublane concat (Mosaic rejects the 3-D reshape);
        # then one window-width MXU dot: C[s, z] = sum_ij xy[s,ij] brick[ij,z]
        flat = jnp.concatenate([bricks[slot, r] for r in range(t)], axis=0)
        cz = jax.lax.dot_general(xy, flat, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_DOT_PRECISION)
        out_ref[0, c, :] = jnp.sum(cz * wz, axis=1).astype(out_ref.dtype)


def read_leaves(leaf_pos, padded_fields, origins, n_side: int, tile: int,
                boxsize: float, interpret: Optional[bool] = None,
                dims: Optional[Tuple[int, int, int]] = None,
                cell_units: bool = False):
    """Trilinear readout of three padded scalar fields at leaf particles.

    padded_fields: tuple of three (npx, npy, npz) arrays (gradient
    components, from :func:`pad_periodic`).  Brick DMAs are double-
    buffered across components and leaves, so every contraction overlaps
    the next fetch.  Returns (nleaf, 3, S) values in leaf order.
    ``dims`` / ``cell_units``: see :func:`paint_leaves`.
    """
    n_leaf, s = leaf_pos.shape[:2]
    if n_leaf > MAX_PREFETCH_ROWS:
        # see paint_leaves: the origin scalar-prefetch caps the rows per
        # call; readout rows are independent, so chunk + concatenate
        return jnp.concatenate(
            [read_leaves(leaf_pos[c0:c0 + MAX_PREFETCH_ROWS],
                         padded_fields,
                         origins[c0:c0 + MAX_PREFETCH_ROWS], n_side, tile,
                         boxsize, interpret=interpret, dims=dims,
                         cell_units=cell_units)
             for c0 in range(0, n_leaf, MAX_PREFETCH_ROWS)], axis=0)
    if dims is None:
        _, npx, npy, npz = _mesh_dims(n_side)
    else:
        npx, npy, npz = _mesh_dims3(*dims)
    tz = _z_tile_of(npz)
    delta = 1.0 if cell_units else boxsize / n_side
    kernel = functools.partial(_read_kernel, t=tile, tz=tz,
                               inv_delta=1.0 / delta, num_leaves=n_leaf)
    shift = HALO * delta
    px = (leaf_pos[:, :, 0] + shift)[:, None, :]
    py = (leaf_pos[:, :, 1] + shift)[:, None, :]
    pz = (leaf_pos[:, :, 2] + shift)[:, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_leaf,),
        in_specs=[
            pl.BlockSpec((1, 1, s), lambda i, o: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, o: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, o: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, s), lambda i, o: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tile, tile, tz), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_leaf, 3, s), leaf_pos.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret_default() if interpret is None else interpret,
    )(origins, px, py, pz, *padded_fields)


# ---------------------------------------------------------------------------
# host-level helpers: origins, halo fold/pad, residual fallback
# ---------------------------------------------------------------------------

def brick_origins(leaf_pos, leaf_mask, n_side: int, tile: int,
                  boxsize: float,
                  dims: Optional[Tuple[int, int, int]] = None,
                  cell_units: bool = False):
    """Brick corners (padded x/y cell coords) + per-leaf fits-in-brick mask.

    A leaf fits when its CIC footprint (min cell .. max cell + 1, both
    axes) spans at most ``tile`` cells.  Non-fitting leaves keep a clamped
    origin (the kernel's clamped writes are then DISCARDED by painting
    them with zero weight; the caller routes them to the XLA fallback).
    ``dims`` / ``cell_units``: see :func:`paint_leaves`.
    """
    delta = 1.0 if cell_units else boxsize / n_side
    if dims is None:
        _, npx, npy, npz = _mesh_dims(n_side)
    else:
        npx, npy, npz = _mesh_dims3(*dims)
    tz = _z_tile_of(npz)
    u = leaf_pos / delta - 0.5
    c = jnp.floor(u).astype(jnp.int32) + HALO          # padded cell coords
    big = jnp.iinfo(jnp.int32).max
    cmin = jnp.min(jnp.where(leaf_mask[:, :, None], c, big), axis=1)
    cmax = jnp.max(jnp.where(leaf_mask[:, :, None], c, -big), axis=1)
    any_p = jnp.any(leaf_mask, axis=1)
    cmin = jnp.where(any_p[:, None], cmin, 0)
    cmax = jnp.where(any_p[:, None], cmax, 0)
    lim = jnp.asarray([npx - tile, npy - tile, npz - tz], jnp.int32)
    origin = jnp.clip(cmin, 0, lim[None, :])
    # Mosaic DMA slice alignment on tiled HBM axes: dim 1 (y, sublane)
    # must be 8-aligned, dim 2 (z, lane) 128-aligned; dim 0 is untiled
    origin = origin.at[:, 1].set((origin[:, 1] // 8) * 8)
    origin = origin.at[:, 2].set((origin[:, 2] // 128) * 128)
    # the brick must cover every touched cell (cmin .. cmax + 1)
    span = jnp.asarray([tile, tile, tz], jnp.int32)
    fits = jnp.all(cmax + 1 - origin <= span[None, :] - 1, axis=1) | ~any_p
    # pack (ox, oy/8, oz/128) into one int32: a 3-column SMEM prefetch
    # operand lane-pads 3 -> 128; a 1-D vector stays compact.  Bit budget
    # (meshes to ~4000): ox 12 bits, oy/8 10 bits, oz/128 10 bits.
    packed = ((origin[:, 0] << 20) | ((origin[:, 1] // 8) << 10)
              | (origin[:, 2] // 128))
    return packed, fits


def fold_halos(padded, n_side: int):
    """Fold the periodic halos of a painted padded mesh -> (n,)^3."""
    h, n = HALO, n_side
    logical = n + 2 * h
    m = padded[:logical, :logical, :logical]
    for ax in range(3):
        lo = jax.lax.slice_in_dim(m, 0, h, axis=ax)
        hi = jax.lax.slice_in_dim(m, n + h, n + 2 * h, axis=ax)
        core = jax.lax.slice_in_dim(m, h, n + h, axis=ax)
        core = _add_at(core, hi, 0, h, ax)
        core = _add_at(core, lo, n - h, n, ax)
        m = core
    return m


def _add_at(arr, add, lo, hi, ax):
    sl = [slice(None)] * arr.ndim
    sl[ax] = slice(lo, hi)
    return arr.at[tuple(sl)].add(add)


def pad_periodic(field, n_side: int):
    """Periodic halo pad of an (n,)^3 field on every axis, zero-extended
    to the Mosaic-tiled mesh dims."""
    logical, npx, npy, npz = _mesh_dims(n_side)
    f = jnp.pad(field, ((HALO, HALO),) * 3, mode="wrap")
    return jnp.pad(f, ((0, npx - logical), (0, npy - logical),
                       (0, npz - logical)))
