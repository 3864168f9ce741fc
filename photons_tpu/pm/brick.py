"""Brick-local particle-mesh: patch paint, rim fold, ghost-plane readout.

TPU-native equivalent of the reference's *local* PM meshes
(partmesh.c:840-1251): each rank paints CIC mass onto a bounding-box
local mesh and ships only owned cells to the pencil owners, instead of
holding the full n^3 mesh.  Round 1 of this rebuild painted the FULL
mesh on every shard and psum_scatter'd it -- O(n^3) memory and collective
volume per device.  This module restores the reference's O(n^3/D) scaling
with static shapes:

  * each shard paints into a fixed-capacity *patch* -- its (rebalanced)
    spatial brick extended by a static margin, full z -- with a dynamic
    cell-aligned origin (lax gathers handle the traced origin);
  * patch rims fold onto the uniform mesh-brick owners with one
    ``ppermute`` hop per covered ring offset, axis-by-axis (separable:
    O(hops_x + hops_y) transfers, not O(hops_x * hops_y));
  * after the pencil Poisson solve, the reverse exchange gathers the
    potential over the patch plus the fd4 stencil margin, the gradient is
    a sliced (non-wrapping) stencil in x/y and a periodic roll in z, and
    the CIC readout gathers from the local patch only.

Capacity violations (a rebalanced brick outgrowing its patch, or painted
mass owned farther than the hop set reaches) raise the standard overflow
flag -> elastic recovery, like every other static capacity in the engine.

All functions run inside ``shard_map`` over the 2-D (x, y) process grid.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_CORNERS = [(cx, cy, cz) for cx in (0, 1) for cy in (0, 1) for cz in (0, 1)]


def patch_geometry(n_side: int, d_axis: int, factor: float,
                   margin: int = 4) -> int:
    """Static patch size (cells) along one decomposed axis.

    ``factor`` is the allowed brick growth under load rebalancing (the
    reference's kd splits drift the same way, domains.c:86-144); +margin
    covers the CIC corner and the fd4 stencil ghost planes."""
    loc = n_side // d_axis
    if d_axis == 1:
        return n_side
    return min(n_side, int(-(-loc * factor // 1)) + margin)


def _ring_offsets(d: int, hmax: int):
    return [k for k in range(1, d) if min(k, d - k) <= hmax]


def paint_patch(pos, weights, boxsize: float, n_side: int,
                ox, oy, px: int, py: int):
    """CIC-paint local particles onto the (px, py, n) patch.

    ox/oy: traced global cell indices of patch row/col 0.  Corner-by-corner
    1-D scatters (see pm.mesh._corner for the tiling rationale).  Returns
    (patch, out_of_patch) where the flag marks any weighted corner falling
    outside the patch (painted mass would be lost -> capacity overflow)."""
    delta = boxsize / n_side
    u = pos / delta - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    f = (u - jnp.floor(u)).astype(pos.dtype)

    patch = jnp.zeros(px * py * n_side, pos.dtype)
    lost = jnp.asarray(False)
    for cx, cy, cz in _CORNERS:
        rx = jnp.mod(i0[:, 0] + cx - ox, n_side)
        ry = jnp.mod(i0[:, 1] + cy - oy, n_side)
        iz = jnp.mod(i0[:, 2] + cz, n_side)
        w = ((f[:, 0] if cx else 1.0 - f[:, 0])
             * (f[:, 1] if cy else 1.0 - f[:, 1])
             * (f[:, 2] if cz else 1.0 - f[:, 2])) * weights
        inside = (rx < px) & (ry < py)
        lost |= jnp.any(~inside & (w != 0))
        idx = jnp.where(inside, (rx * py + ry) * n_side + iz, px * py * n_side)
        patch = lax.optimization_barrier(
            patch.at[idx].add(jnp.where(inside, w, 0.0), mode="drop"))
    return patch.reshape(px, py, n_side), lost


def _fold_axis(buf, orig, n_side: int, hmax: int, axis_name: str):
    """Fold the leading patch axis onto its uniform brick owners.

    buf (p, ...) with traced global origin ``orig``; every device keeps
    rows [idx*loc, (idx+1)*loc).  Returns ((loc, ...), overflow) -- the
    flag marks nonzero patch rows whose owner is beyond the hop set."""
    d = lax.axis_size(axis_name)
    p = buf.shape[0]
    loc = n_side // d
    tail = (None,) * (buf.ndim - 1)

    if d == 1:
        out = jnp.zeros((loc,) + buf.shape[1:], buf.dtype)
        g = jnp.mod(orig + jnp.arange(p), n_side)
        return out.at[g].add(buf), jnp.asarray(False)

    me = lax.axis_index(axis_name)
    my0 = me * loc
    rows = jnp.arange(loc)

    def take_from(rbuf, rorig):
        rel = jnp.mod(my0 + rows - rorig, n_side)
        ok = rel < p
        got = jnp.take(rbuf, jnp.minimum(rel, p - 1), axis=0)
        return jnp.where(ok[(slice(None),) + tail], got, 0)

    out = take_from(buf, orig)
    for k in _ring_offsets(d, hmax):
        perm = [(i, (i + k) % d) for i in range(d)]
        rbuf = lax.ppermute(buf, axis_name, perm)
        rorig = lax.ppermute(orig, axis_name, perm)
        out = out + take_from(rbuf, rorig)

    # unserved mass check: every nonzero row's owner must be a served hop
    owner = jnp.mod(orig + jnp.arange(p), n_side) // loc
    dist = jnp.minimum(jnp.mod(owner - me, d), jnp.mod(me - owner, d))
    nonzero = jnp.any(buf.reshape(p, -1) != 0, axis=1)
    overflow = jnp.any((dist > hmax) & nonzero)
    return out, overflow


def _expand_axis(brick, orig, p: int, need, n_side: int, hmax: int,
                 axis_name: str):
    """Gather patch rows [orig, orig+p) of a uniformly-bricked axis.

    Reverse of :func:`_fold_axis`: the potential lives on uniform bricks
    (loc rows per device); collect my patch's rows from ring neighbors.
    ``need``: traced count of rows actually read (the brick extent + fd4
    margin) -- unserved rows beyond it are dead patch slack, not errors."""
    d = lax.axis_size(axis_name)
    loc = brick.shape[0]
    tail = (None,) * (brick.ndim - 1)
    g = jnp.mod(orig + jnp.arange(p), n_side)

    if d == 1:
        return jnp.take(brick, g, axis=0), jnp.asarray(False)

    me = lax.axis_index(axis_name)

    def take_from(rbrick, ridx):
        rel = g - ridx * loc
        ok = (rel >= 0) & (rel < loc)
        got = jnp.take(rbrick, jnp.clip(rel, 0, loc - 1), axis=0)
        return jnp.where(ok[(slice(None),) + tail], got, 0)

    out = take_from(brick, me)
    for k in _ring_offsets(d, hmax):
        perm = [(i, (i + k) % d) for i in range(d)]
        rbrick = lax.ppermute(brick, axis_name, perm)
        out = out + take_from(rbrick, (me - k) % d)

    owner = g // loc
    dist = jnp.minimum(jnp.mod(owner - me, d), jnp.mod(me - owner, d))
    bad = jnp.any((dist > hmax) & (jnp.arange(p) < need))
    return out, bad


def fold_patch(patch, ox, oy, n_side: int, hx: int, hy: int,
               ax: str, ay: str):
    """Patch -> uniform (nx_loc, ny_loc, n) brick, axis-by-axis."""
    xfold, ovx = _fold_axis(patch, ox, n_side, hx, ax)
    yfirst = jnp.moveaxis(xfold, 1, 0)
    yfold, ovy = _fold_axis(yfirst, oy, n_side, hy, ay)
    return jnp.moveaxis(yfold, 0, 1), ovx | ovy


def expand_phi(phi_brick, ox, oy, px: int, py: int, need_x, need_y,
               n_side: int, hx: int, hy: int, ax: str, ay: str):
    """Uniform potential brick -> (px, py, n) patch with ghost planes."""
    xpatch, badx = _expand_axis(phi_brick, ox, px, need_x, n_side, hx, ax)
    yfirst = jnp.moveaxis(xpatch, 1, 0)
    ypatch, bady = _expand_axis(yfirst, oy, py, need_y, n_side, hy, ay)
    return jnp.moveaxis(ypatch, 0, 1), badx | bady


def gradient_patch(phi, boxsize: float, n_side: int):
    """4th-order gradient on a patch: sliced stencil in x/y (the ghost
    planes make the interior exact), periodic roll in z.  Input
    (px+4, py+4, n) -> three (px, py, n) components (separate arrays: a
    trailing length-3 axis tile-pads 42x on TPU, pm.mesh notes).

    Matches pm.solver.gradient_4th / partmesh.c:1318-1383 exactly."""
    inv2d = 0.5 * n_side / boxsize
    f1, f2 = 4.0 / 3.0, 1.0 / 6.0
    gx = (f1 * (phi[3:-1, 2:-2, :] - phi[1:-3, 2:-2, :])
          - f2 * (phi[4:, 2:-2, :] - phi[:-4, 2:-2, :])) * inv2d
    gy = (f1 * (phi[2:-2, 3:-1, :] - phi[2:-2, 1:-3, :])
          - f2 * (phi[2:-2, 4:, :] - phi[2:-2, :-4, :])) * inv2d
    core = phi[2:-2, 2:-2, :]
    gz = (f1 * (jnp.roll(core, -1, 2) - jnp.roll(core, 1, 2))
          - f2 * (jnp.roll(core, -2, 2) - jnp.roll(core, 2, 2))) * inv2d
    return gx, gy, gz


def read_patch_vector(grads: Tuple, pos, boxsize: float, n_side: int,
                      ox, oy, px: int, py: int):
    """CIC-gather the per-cell gradient components at particle positions.

    grads: three (px, py, n) arrays; positions outside the patch gather
    zero (they were already flagged by paint_patch)."""
    delta = boxsize / n_side
    u = pos / delta - 0.5
    i0 = jnp.floor(u).astype(jnp.int32)
    f = (u - jnp.floor(u)).astype(pos.dtype)
    flats = [g.reshape(-1) for g in grads]
    out = jnp.zeros((pos.shape[0], 3), pos.dtype)
    for cx, cy, cz in _CORNERS:
        rx = jnp.mod(i0[:, 0] + cx - ox, n_side)
        ry = jnp.mod(i0[:, 1] + cy - oy, n_side)
        iz = jnp.mod(i0[:, 2] + cz, n_side)
        w = ((f[:, 0] if cx else 1.0 - f[:, 0])
             * (f[:, 1] if cy else 1.0 - f[:, 1])
             * (f[:, 2] if cz else 1.0 - f[:, 2]))
        inside = (rx < px) & (ry < py)
        idx = jnp.where(inside, (rx * py + ry) * n_side + iz, 0)
        w = jnp.where(inside, w, 0.0)
        vec = jnp.stack([fl[idx] for fl in flats], axis=1)
        out = lax.optimization_barrier(out + vec * w[:, None])
    return out
