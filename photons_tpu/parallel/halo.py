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

    for h in range(1, n_hops + 1):
        for sign in (+1, -1):
            tgt = (me + sign * h) % d_size          # shard we send to
            lo, hi = bounds[tgt], bounds[tgt + 1]
            near = valid & (_slab_distance(pos[:, 0], lo, hi, boxsize)
                            < cutoff)
            buf, val, ovf = _pack(pos, near, ghost_cap)
            overflow |= ovf
            perm = [(i, (i + sign * h) % d_size) for i in range(d_size)]
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
