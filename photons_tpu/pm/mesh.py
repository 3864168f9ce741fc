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


def _cic_cells_weights(pos, boxsize: float, n_side: int):
    """8 periodic cell indices and CIC weights per particle.

    Returns (idx, w): idx int32 (N, 8) flattened cell ids, w (N, 8).
    """
    delta = boxsize / n_side
    u = pos / delta - 0.5                       # offset in cell-center units
    i0 = jnp.floor(u)
    f = (u - i0)[..., None]                     # (N, 3, 1) weight of i0+1
    i0 = i0.astype(jnp.int32)

    # per-axis (cell, weight) pairs: (i0, 1-f), (i0+1, f)
    cells = jnp.stack([i0, i0 + 1], axis=-1)    # (N, 3, 2)
    cells = jnp.mod(cells, n_side)
    wts = jnp.concatenate([1.0 - f, f], axis=-1)  # (N, 3, 2)

    # outer product over the 3 axes -> 8 corners
    corner = jnp.arange(8)
    cx, cy, cz = corner // 4, (corner // 2) % 2, corner % 2
    idx = (cells[:, 0, cx] * n_side + cells[:, 1, cy]) * n_side + cells[:, 2, cz]
    w = wts[:, 0, cx] * wts[:, 1, cy] * wts[:, 2, cz]
    return idx, w


def cic_paint(pos, boxsize: float, n_side: int, weights=None):
    """Scatter particle weights onto the periodic mesh -> (n,n,n) array."""
    idx, w = _cic_cells_weights(pos, boxsize, n_side)
    if weights is not None:
        w = w * weights[:, None]
    mesh = jnp.zeros(n_side**3, pos.dtype)
    mesh = mesh.at[idx.reshape(-1)].add(w.reshape(-1))
    return mesh.reshape(n_side, n_side, n_side)


def cic_read_vector(field, pos, boxsize: float, n_side: int):
    """Gather a per-cell vector field (n,n,n,3) at particle positions.

    This is the reference's per-axis CIC interpolation of the 8 surrounding
    gradient values (partmesh.c:1385-1392 and the dp[0..7] blocks).
    """
    idx, w = _cic_cells_weights(pos, boxsize, n_side)
    flat = field.reshape(n_side**3, -1)
    vals = flat[idx]                            # (N, 8, C)
    return jnp.sum(vals * w[..., None], axis=1)
