"""Cloud-in-cell mass assignment and force readout.

The reference paints CIC weights about *cell centers*: the home cell is
i = floor(x/delta), the offset from its center picks the neighbor ii = i+-1,
and the weights are (1-|w|, |w|) (partmesh.c:881-951).  That is standard CIC
expressed around cell centers; here it is one vectorized scatter-add
(paint) / gather (readout) over the periodic mesh -- no ghost zones needed,
wrap is modular index arithmetic.

The density normalization (N_side/L)^3 -- mass to density -- mirrors
partmesh.c:954-964.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cic_base(pos, boxsize: float, n_side: int):
    """Home cell (N, 3) int32 and the +1-neighbor weight fractions (N, 3)."""
    delta = boxsize / n_side
    u = pos / delta - 0.5                       # offset in cell-center units
    i0 = jnp.floor(u)
    f = u - i0                                  # (N, 3) weight of i0+1
    return i0.astype(jnp.int32), f


def _corner(i0, f, n_side: int, cx: int, cy: int, cz: int):
    """One CIC corner: flattened cell ids (N,) and weights (N,).

    Corner-by-corner (a static 8-iteration loop in the callers) keeps every
    intermediate 1-D: a materialized (N, 8) / (N, 8, 3) gather blows up
    16-42x under TPU (8,128) tile padding -- at 256^3 a single such fused
    intermediate is 24 GB, past a v5e's whole HBM.
    """
    ix = jnp.mod(i0[:, 0] + cx, n_side)
    iy = jnp.mod(i0[:, 1] + cy, n_side)
    iz = jnp.mod(i0[:, 2] + cz, n_side)
    idx = (ix * n_side + iy) * n_side + iz
    w = ((f[:, 0] if cx else 1.0 - f[:, 0])
         * (f[:, 1] if cy else 1.0 - f[:, 1])
         * (f[:, 2] if cz else 1.0 - f[:, 2]))
    return idx, w


_CORNERS = [(cx, cy, cz) for cx in (0, 1) for cy in (0, 1) for cz in (0, 1)]


def cic_paint(pos, boxsize: float, n_side: int, weights=None):
    """Scatter particle weights onto the periodic mesh -> (n,n,n) array."""
    i0, f = _cic_base(pos, boxsize, n_side)
    mesh = jnp.zeros(n_side**3, pos.dtype)
    for c in _CORNERS:
        idx, w = _corner(i0, f, n_side, *c)
        if weights is not None:
            w = w * weights
        # barrier: keep the 8 corner scatters as separate (N,)-shaped
        # steps -- see cic_read_vector
        mesh = jax.lax.optimization_barrier(mesh.at[idx].add(w))
    return mesh.reshape(n_side, n_side, n_side)


def cic_read_vector(field, pos, boxsize: float, n_side: int):
    """Gather a per-cell vector field (n,n,n,3) at particle positions.

    This is the reference's per-axis CIC interpolation of the 8 surrounding
    gradient values (partmesh.c:1385-1392 and the dp[0..7] blocks).

    The optimization barrier between corner accumulations stops XLA from
    batching several corner gathers into one concatenated fusion output --
    a (3N, 3) buffer whose forced (8,128) tile padding is 24 GB at 256^3,
    past a whole v5e HBM.  Eight sequential (N, 3) gathers compute the
    same thing in eight 200 MB steps.
    """
    i0, f = _cic_base(pos, boxsize, n_side)
    flat = field.reshape(n_side**3, -1)
    out = jnp.zeros((pos.shape[0], flat.shape[1]), pos.dtype)
    for c in _CORNERS:
        idx, w = _corner(i0, f, n_side, *c)
        out = jax.lax.optimization_barrier(out + flat[idx] * w[:, None])
    return out
