"""Ghost-particle halo exchange over the device ring.

TPU-native equivalent of the reference's remote ring (fmm_remote,
remotes.c:740-809): instead of shipping MAC-pruned trees + bodies with
MPI Isend/Recv, each shard ships fixed-capacity buffers of its particles
that lie within the cutoff radius of a neighbor's slab, via
``lax.ppermute`` hops over the ICI ring.

Under the Ewald split (-DLONGSHORT) every interaction beyond
``cutoff_radius`` is discarded by the MAC (fmm.c:306-314), so ghost
*bodies* within the cutoff are exactly sufficient -- no remote multipoles
needed.  Periodic wrap is free: ghosts keep their absolute coordinates and
the force kernels apply minimum-image displacements.

Completeness is checked geometrically: if any unserved hop distance could
still be within the cutoff, a ``halo_insufficient`` flag is raised
(analogue of the reference's task-overflow guards, remotes.c:163-165).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pack(pos, sel, cap: int):
    """Compact selected rows into a (cap, 3) buffer + validity (cap,)."""
    idx = jnp.cumsum(sel) - 1
    dest = jnp.where(sel, idx, cap)
    buf = jnp.zeros((cap, 3), pos.dtype).at[dest].set(pos, mode="drop")
    val = jnp.zeros((cap,), bool).at[dest].set(sel, mode="drop")
    count = jnp.sum(sel)
    return buf, val, count > cap


def _slab_distance(x, lo, hi, boxsize):
    """Min-image distance from coordinate x to the slab [lo, hi)."""
    center = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo)
    d = x - center
    d = d - boxsize * jnp.round(d / boxsize)
    return jnp.maximum(jnp.abs(d) - half, 0.0)


def gather_ghosts(pos, valid, bounds, cutoff: float, boxsize: float,
                  ghost_cap: int, n_hops: int, axis: str):
    """Collect neighbor-shard particles within ``cutoff`` of my slab.

    bounds: replicated (D+1,) slab boundaries.  Returns
    (ghost_pos (2*n_hops*cap, 3), ghost_valid, overflow, halo_insufficient).
    """
    d_size = lax.axis_size(axis)
    me = lax.axis_index(axis)

    ghost_pos = []
    ghost_val = []
    overflow = jnp.asarray(False)

    # unique ring offsets only: for small rings +h and -h can name the SAME
    # neighbor (d=2: me+1 == me-1 mod 2), which would deliver the ghost
    # buffer twice and double-count its forces
    offsets = [k for k in range(1, d_size)
               if min(k, d_size - k) <= n_hops]
    for k in offsets:
        tgt = (me + k) % d_size                 # shard we send to
        lo, hi = bounds[tgt], bounds[tgt + 1]
        near = valid & (_slab_distance(pos[:, 0], lo, hi, boxsize)
                        < cutoff)
        buf, val, ovf = _pack(pos, near, ghost_cap)
        overflow |= ovf
        perm = [(i, (i + k) % d_size) for i in range(d_size)]
        ghost_pos.append(lax.ppermute(buf, axis, perm))
        ghost_val.append(lax.ppermute(val, axis, perm))

    # geometric completeness: the first unserved hop must be beyond cutoff
    if n_hops < d_size - 1:
        h = n_hops + 1
        checks = []
        for sign in (+1, -1):
            src = (me + sign * h) % d_size
            lo_s, hi_s = bounds[src], bounds[src + 1]
            lo_m, hi_m = bounds[me], bounds[me + 1]
            # distance between the two slabs (min-image)
            c_s, c_m = 0.5 * (lo_s + hi_s), 0.5 * (lo_m + hi_m)
            gap = jnp.abs(c_s - c_m)
            gap = jnp.minimum(gap, boxsize - gap)
            gap = gap - 0.5 * (hi_s - lo_s) - 0.5 * (hi_m - lo_m)
            checks.append(gap < cutoff)
        halo_insufficient = checks[0] | checks[1]
    else:
        halo_insufficient = jnp.asarray(False)

    return (jnp.concatenate(ghost_pos), jnp.concatenate(ghost_val),
            overflow, halo_insufficient)


def _brick_near(pos, xb_lo, xb_hi, yb_lo, yb_hi, cutoff, boxsize, valid):
    """Mask of particles within ``cutoff`` (Euclidean) of an (x, y) brick."""
    gx = _slab_distance(pos[:, 0], xb_lo, xb_hi, boxsize)
    gy = _slab_distance(pos[:, 1], yb_lo, yb_hi, boxsize)
    return valid & (gx * gx + gy * gy < cutoff * cutoff)


def gather_ghosts_2d(pos, valid, xbounds, ybounds, cutoff: float,
                     boxsize: float, ghost_cap: int, hops_x: int,
                     hops_y: int, ax: str, ay: str):
    """2-D brick halo: collect neighbor-brick particles within ``cutoff``.

    Scan-carried serpentine ring with O(1) program size in grid size and
    hop count (the round-2 per-offset unroll compiled one ppermute pair
    per offset -- a compile wall at large grids; the far field got the
    same rewrite in round 2, parallel/farfield.py; VERDICT r2 next-9).

    Each shard packs its boundary SKIN once -- every particle within
    ``cutoff`` of its own brick boundary.  The skin is sufficient for any
    receiver at any hop distance, since for a particle inside its brick
    dist(p, other brick) >= dist(p, own boundary).  The carry then walks
    the (2*hops_x+1) x (2*hops_y+1) offset neighborhood boustrophedon:
    unit x-hops inside a row (inner scan), one static x-rewind + unit
    y-hop between rows (outer scan) -- five distinct ppermutes total.
    Receivers filter arriving skins against their own brick, so delivered
    ghosts match the per-offset formulation exactly; offsets that alias
    on small grids (+h == -h mod d) and the self offset are masked by a
    static per-stage flag so no ghost is ever delivered twice
    (remotes.c:740-809 parity: the reference ring also visits each rank
    once).
    """
    import numpy as np

    dx = lax.axis_size(ax)
    dy = lax.axis_size(ay)
    ix = lax.axis_index(ax)
    iy = lax.axis_index(ay)
    xlo, xhi = xbounds[ix], xbounds[ix + 1]
    ylo, yhi = ybounds[iy], ybounds[iy + 1]

    # ---- pack my boundary skin once -------------------------------------
    def _deep_interior(p, lo, hi):
        return (p - lo > cutoff) & (hi - p > cutoff)
    sel = valid & ~(_deep_interior(pos[:, 0], xlo, xhi)
                    & _deep_interior(pos[:, 1], ylo, yhi))
    buf, val, overflow = _pack(pos, sel, ghost_cap)
    # carry validity inside the buffer's 4th column: one ppermute per hop
    # instead of two
    carry0 = jnp.concatenate([buf, val[:, None].astype(buf.dtype)], axis=1)

    # ---- static stage bookkeeping ----------------------------------------
    sx = 2 * hops_x + 1
    sy = 2 * hops_y + 1
    seen = set()
    use = np.zeros((sy, sx), bool)
    served = np.zeros((dx, dy), bool)
    served[0, 0] = True
    for r in range(sy):
        for c in range(sx):
            off = ((hops_x - c) % dx, (hops_y - r) % dy)
            if off == (0, 0) or off in seen:
                continue                    # self / small-grid alias
            seen.add(off)
            use[r, c] = True
            served[off[0], off[1]] = True

    perm_pre_x = [(i, (i - hops_x) % dx) for i in range(dx)]
    perm_pre_y = [(i, (i - hops_y) % dy) for i in range(dy)]
    perm_x1 = [(i, (i + 1) % dx) for i in range(dx)]
    perm_y1 = [(i, (i + 1) % dy) for i in range(dy)]
    perm_xrw = [(i, (i - sx) % dx) for i in range(dx)]

    def near_mine(b):
        gx = _slab_distance(b[:, 0], xlo, xhi, boxsize)
        gy = _slab_distance(b[:, 1], ylo, yhi, boxsize)
        return gx * gx + gy * gy < cutoff * cutoff

    # position the carry at offset (+hops_x, +hops_y): I hold the skin of
    # shard (ix+hx, iy+hy); each unit hop decrements the offset
    carry = lax.ppermute(carry0, ax, perm_pre_x)
    carry = lax.ppermute(carry, ay, perm_pre_y)

    def inner(c, u):
        v = (c[:, 3] > 0.5) & u & near_mine(c)
        out = (c[:, :3], v)
        return lax.ppermute(c, ax, perm_x1), out

    def outer(c, use_row):
        c, outs = lax.scan(inner, c, use_row)
        c = lax.ppermute(c, ax, perm_xrw)      # back to ox = +hops_x
        c = lax.ppermute(c, ay, perm_y1)       # next row: oy -= 1
        return c, outs

    _, (gpos, gval) = lax.scan(outer, carry, jnp.asarray(use))
    # gpos: (sy, sx, cap, 3); keep only the used stages (static slice)
    used_idx = np.nonzero(use.reshape(-1))[0]
    cap = ghost_cap
    if len(used_idx):
        ghost_pos = gpos.reshape(sy * sx, cap, 3)[used_idx].reshape(-1, 3)
        ghost_val = gval.reshape(sy * sx, cap)[used_idx].reshape(-1)
    else:
        ghost_pos = jnp.zeros((0, 3), pos.dtype)
        ghost_val = jnp.zeros((0,), bool)

    # geometric completeness: every unserved offset's brick must lie fully
    # beyond the cutoff of mine (checked against the worst pair of bricks
    # at that offset, since bounds are shared grid lines).  Vectorized over
    # the whole (dx, dy) offset grid so program size stays O(1) in D.
    if not served.all():
        ssx = (ix + jnp.arange(dx)) % dx                      # (dx,)
        ssy = (iy + jnp.arange(dy)) % dy                      # (dy,)
        gx = _gap(xbounds[ix], xbounds[ix + 1],
                  xbounds[ssx], xbounds[ssx + 1], boxsize)    # (dx,)
        gy = _gap(ybounds[iy], ybounds[iy + 1],
                  ybounds[ssy], ybounds[ssy + 1], boxsize)    # (dy,)
        within = (gx[:, None] ** 2 + gy[None, :] ** 2) < cutoff * cutoff
        bad = jnp.any(within & ~jnp.asarray(served))
        # any() over the grid: one brick pair within reach flags everyone
        bad = lax.pmax(bad.astype(jnp.int32), (ax, ay)).astype(bool)
    else:
        bad = jnp.asarray(False)

    return ghost_pos, ghost_val, overflow, bad


def _gap(lo_a, hi_a, lo_b, hi_b, boxsize):
    """Min-image gap between two intervals."""
    ca, cb = 0.5 * (lo_a + hi_a), 0.5 * (lo_b + hi_b)
    d = jnp.abs(ca - cb)
    d = jnp.minimum(d, boxsize - d)
    return jnp.maximum(d - 0.5 * (hi_a - lo_a) - 0.5 * (hi_b - lo_b), 0.0)
