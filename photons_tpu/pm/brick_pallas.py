"""Pallas CIC paint/readout for brick-local sharded PM patches.

The sharded engine's PM (pm/brick.py; reference partmesh.c:840-1251
local meshes) painted with per-particle XLA corner scatters and read
with row gathers -- the latency-bound ops the single-chip engine
replaced with leaf-brick MXU kernels (pm/cic_pallas.py, measured 2.5x
on the PM phase at 256^3).  This module reuses those kernels inside
``shard_map``:

  * owned particles are leaf-blocked by a PATCH-FRAME Hilbert sort (the
    FMM tree's blocking covers owned+ghost bodies in the global frame,
    so PM keeps its own argsort -- ghosts must not paint mass);
  * coordinates reach the kernels as exact CELL-CENTER units: the
    patch shift is a mod-n INTEGER cell shift plus the unchanged CIC
    fraction, so no float roundtrip can flip a cell assignment
    (cic_pallas ``cell_units=True``);
  * the paint buffer is the HALO-extended patch: x/y rims are NOT
    folded periodically -- they are real neighbor-owned rows that
    ``fold_patch``'s mod-n routing ships to their owners; only z (the
    undecomposed axis) wraps;
  * blocks whose CIC footprint exceeds the brick tile (SFC-transition
    straddlers, or wrap-around rows when a patch spans the full axis)
    route through the existing per-particle XLA paint/readout
    (pm/brick.py), mirroring the single-chip residual path
    (ops/fmm_engine.pm_from_tree).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from photons_tpu.pm.cic_pallas import (HALO, brick_origins, paint_leaves,
                                       read_leaves)
from photons_tpu.tree.morton import hilbert_keys


def cell_frame(pos, ox, oy, n_side: int, delta):
    """Patch-frame cell-center coordinates (exact integer shift).

    Returns (coord (N, 3), l (N, 3) int32 patch-frame cells): coord =
    l + frac + 0.5 with l = mod(floor(pos/delta - 0.5) - origin, n) so
    the kernels recover the cell and CIC fraction exactly (z keeps its
    global cell index; the z axis is undecomposed)."""
    u = pos / delta - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    f = (u - jnp.floor(u)).astype(pos.dtype)
    l = jnp.stack([jnp.mod(i0[:, 0] - ox, n_side),
                   jnp.mod(i0[:, 1] - oy, n_side),
                   jnp.mod(i0[:, 2], n_side)], axis=1)
    coord = l.astype(pos.dtype) + f + 0.5
    return coord, l


def pm_blocks(coord, valid, n_side: int, block: int):
    """Hilbert-sorted fixed-size blocks of the patch-frame coordinates.

    Invalid slots sort to the tail (max key); a partial tail block is
    padded with masked slots.  Returns (coord_blk (B, S, 3),
    mask_blk (B, S), perm (cap,)) with perm mapping sorted slot ->
    input slot (the readout unsort)."""
    cap = coord.shape[0]
    keys = hilbert_keys(coord, 0.0, float(n_side))
    keys = jnp.where(valid, keys, jnp.iinfo(jnp.int32).max)
    perm = jnp.argsort(keys)
    n_pad = (-cap) % block
    coord_s = coord[perm]
    val_s = valid[perm]
    if n_pad:
        coord_s = jnp.concatenate(
            [coord_s, jnp.full((n_pad, 3), 0.5, coord.dtype)])
        val_s = jnp.concatenate([val_s, jnp.zeros((n_pad,), bool)])
    nblk = (cap + n_pad) // block
    return (coord_s.reshape(nblk, block, 3),
            val_s.reshape(nblk, block), perm)


def _fold_z(padded, n_side: int):
    """Fold the periodic z halos of a painted padded patch; keep the x/y
    rims (they are the extended patch -- fold_patch routes them)."""
    h, n = HALO, n_side
    core = padded[:, :, h:h + n]
    core = core.at[:, :, :h].add(padded[:, :, n + h:n + 2 * h])
    core = core.at[:, :, n - h:].add(padded[:, :, :h])
    return core


def paint_patch_pallas(pos, valid, scale, boxsize: float, n_side: int,
                       ox, oy, px: int, py: int, tile: int, block: int,
                       straddler_cap: int,
                       interpret: Optional[bool] = None):
    """CIC-paint onto the HALO-extended patch via the leaf-brick kernels.

    Returns (patch_ext (px+2H, r8(py+2H), n) f32 at origin
    (ox-H, oy-H), blocks (coord_blk, mask_blk, perm, origins, sidx,
    gate) for the readout to reuse, overflow flag).  ``scale`` is the
    per-particle paint weight (mass * (n/L)^3)."""
    from photons_tpu.pm.brick import paint_patch as xla_paint_patch
    delta = boxsize / n_side
    dims = (px, py, n_side)
    coord, _ = cell_frame(pos, ox, oy, n_side, delta)
    coord_blk, mask_blk, perm = pm_blocks(coord, valid, n_side, block)
    nblk = coord_blk.shape[0]

    origins, fits = brick_origins(coord_blk, mask_blk, n_side, tile,
                                  boxsize, dims=dims, cell_units=True)
    wts = jnp.where(mask_blk & fits[:, None], scale, 0.0).astype(
        jnp.float32 if coord_blk.dtype == jnp.float32 else coord_blk.dtype)
    padded = paint_leaves(coord_blk, wts.astype(coord_blk.dtype), origins,
                          n_side, tile, boxsize, interpret=interpret,
                          dims=dims, cell_units=True)
    patch_ext = _fold_z(padded, n_side)

    # residual straddler path (pm_from_tree parity): up to straddler_cap
    # non-fitting blocks go through the per-corner-mod XLA scatters,
    # which also handle full-axis wrap-around rows correctly
    k_cap = min(int(straddler_cap), nblk)
    n_strad = jnp.sum(~fits)
    sidx = jnp.zeros((max(k_cap, 1),), jnp.int32)
    gate = jnp.zeros((max(k_cap, 1),), bool)
    lost = jnp.asarray(False)
    if k_cap > 0:
        sval, sidx = lax.top_k((~fits).astype(jnp.int32), k_cap)
        gate = sval > 0
        # absolute positions of the straddler blocks' particles: undo the
        # sort through perm (pad rows map to slot 0, weight 0)
        cap = pos.shape[0]
        slot = sidx[:, None] * block + jnp.arange(block)[None, :]
        src = jnp.where(slot < cap, slot, 0)
        pidx = perm[src.reshape(-1)]
        w_res = (mask_blk[sidx] & gate[:, None] & (slot < cap)).reshape(-1)
        spos = pos[pidx]

        def _add(p):
            resid, lost_r = xla_paint_patch(
                jnp.where(w_res[:, None], spos, 0.0),
                w_res.astype(pos.dtype) * scale,
                boxsize, n_side, ox, oy, px, py)
            return (p.at[HALO:HALO + px, HALO:HALO + py, :]
                    .add(resid.astype(p.dtype)), lost_r)
        patch_ext, lost = lax.cond(
            n_strad > 0, _add, lambda p: (p, jnp.asarray(False)), patch_ext)
        overflow = n_strad > k_cap
        blocks = (coord_blk, mask_blk, perm, origins, sidx, gate,
                  pidx, w_res)
    else:
        overflow = n_strad > 0
        blocks = (coord_blk, mask_blk, perm, origins, sidx, gate,
                  jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool))
    return patch_ext, blocks, overflow | lost


def read_patch_pallas(grads, pos, blocks, boxsize: float, n_side: int,
                      ox, oy, px: int, py: int, tile: int,
                      interpret: Optional[bool] = None):
    """Trilinear readout of the three patch-frame gradient components at
    the blocked particles; straddler rows re-read through the XLA path.

    ``grads``: three (px, py, n) patch-frame arrays (gradient_patch
    output).  Returns (cap, 3) accelerations in the ORIGINAL slot order.
    """
    from photons_tpu.pm.brick import read_patch_vector
    (coord_blk, mask_blk, perm, origins, sidx, gate, pidx, w_res) = blocks
    nblk, block = mask_blk.shape
    dims = (px, py, n_side)
    h = HALO
    _, npx, npy, npz = _padded_dims(px, py, n_side)

    field = jnp.zeros((3, npx, npy, npz), jnp.float32)
    g = jnp.stack([gr.astype(jnp.float32) for gr in grads])
    field = field.at[:, h:h + px, h:h + py, h:h + n_side].set(g)
    # z wraps (undecomposed axis); x/y margins stay zero -- in-patch
    # particles never read them (need_x <= px guarantees corners < px) --
    # EXCEPT when the patch spans the full axis (1-device axis): then the
    # seam block's upper CIC corner reads the wrapped rows
    field = field.at[:, h:h + px, h:h + py, :h].set(g[..., n_side - h:])
    field = field.at[:, h:h + px, h:h + py,
                     h + n_side:h + n_side + h].set(g[..., :h])
    if px == n_side:
        field = field.at[:, :h].set(field[:, n_side:n_side + h])
        field = field.at[:, h + n_side:h + n_side + h].set(field[:, h:2 * h])
    if py == n_side:
        field = field.at[:, :, :h].set(field[:, :, n_side:n_side + h])
        field = field.at[:, :, h + n_side:h + n_side + h].set(
            field[:, :, h:2 * h])

    vals = read_leaves(coord_blk, (field[0], field[1], field[2]), origins,
                       n_side, tile, boxsize, interpret=interpret,
                       dims=dims, cell_units=True)    # (nblk, 3, S)
    flat = jnp.moveaxis(vals, 1, 2).reshape(-1, 3)    # sorted-slot order

    k_cap = sidx.shape[0] if pidx.shape[0] else 0
    if k_cap and pidx.shape[0]:
        svals = read_patch_vector(grads, pos[pidx], boxsize, n_side,
                                  ox, oy, px, py).astype(flat.dtype)
        svals = jnp.where(w_res[:, None], svals, 0.0)
        slot = (sidx[:, None] * block
                + jnp.arange(block)[None, :]).reshape(-1)
        keep = jnp.repeat(gate, block)
        new = jnp.where(keep[:, None], svals, flat[slot])
        flat = flat.at[slot].set(new)

    cap = pos.shape[0]
    out = jnp.zeros((cap, 3), pos.dtype)
    out = out.at[perm].set(flat[:cap].astype(pos.dtype))
    return out


def _padded_dims(px: int, py: int, n_side: int):
    from photons_tpu.pm.cic_pallas import _mesh_dims3
    npx, npy, npz = _mesh_dims3(px, py, n_side)
    return (px + 2 * HALO, npx, npy, npz)
