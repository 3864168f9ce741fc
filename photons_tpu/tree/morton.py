"""Morton (Z-order) keys and spatial sorting.

The reference builds a kd-tree by recursive in-place mean-split partition
(bksort_inplace, fmm.c:29-77).  On TPU the equivalent spatial-coherence
primitive is a single vectorized sort by Morton key: contiguous index
ranges of the sorted array are spatially compact, so fixed-size chunks of
the sorted order play the role of kd leaves -- with fully static shapes.

Keys are 30-bit (10 bits per axis, int32): grid up to 1024^3 leaf cells,
ample for the leaf counts involved (leaves = N / leaf_size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MORTON_BITS = 10  # per axis


def _expand_bits(v):
    """Spread the low 10 bits of v so consecutive bits are 3 apart
    (standard magic-number bit interleave, int32)."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_keys(pos, lo, hi):
    """int32 Morton keys for positions in the box [lo, hi)^3."""
    n_cells = 1 << MORTON_BITS
    scale = n_cells / (hi - lo)
    q = jnp.clip(((pos - lo) * scale).astype(jnp.int32), 0, n_cells - 1)
    return (_expand_bits(q[..., 0]) << 2) | (_expand_bits(q[..., 1]) << 1) \
        | _expand_bits(q[..., 2])


def hilbert_keys(pos, lo, hi):
    """int32 Hilbert keys (Skilling's transform, vectorized).

    Z-order has long jumps at octant boundaries: an equal-count chunk of
    the sorted order that straddles one gets an AABB spanning a large
    fraction of the box, which explodes its interaction list (measured:
    max/mean partner count 2075/231 at 64^3).  The Hilbert curve has no
    jumps -- consecutive cells are always face neighbors -- so every chunk
    stays compact.  Transform from Skilling, "Programming the Hilbert
    curve" (AIP Conf. Proc. 707, 2004), vectorized over particles.
    """
    n_cells = 1 << MORTON_BITS
    scale = n_cells / (hi - lo)
    q = jnp.clip(((pos - lo) * scale).astype(jnp.int32), 0, n_cells - 1)
    x0, x1, x2 = q[..., 0], q[..., 1], q[..., 2]

    # axes -> transpose: inverse-undo sweep from the top bit down
    for k in range(MORTON_BITS - 1, 0, -1):
        qb = 1 << k
        p = qb - 1
        for xi_idx in (0, 1, 2):
            xi = (x0, x1, x2)[xi_idx]
            cond = (xi & qb) > 0
            if xi_idx == 0:
                x0 = jnp.where(cond, x0 ^ p, x0)
            else:
                t = (x0 ^ xi) & p
                x0_new = jnp.where(cond, x0 ^ p, x0 ^ t)
                xi_new = jnp.where(cond, xi, xi ^ t)
                x0 = x0_new
                if xi_idx == 1:
                    x1 = xi_new
                else:
                    x2 = xi_new

    # Gray encode
    x1 = x1 ^ x0
    x2 = x2 ^ x1
    t = jnp.zeros_like(x2)
    for k in range(MORTON_BITS - 1, 0, -1):
        qb = 1 << k
        t = jnp.where((x2 & qb) > 0, t ^ (qb - 1), t)
    x0, x1, x2 = x0 ^ t, x1 ^ t, x2 ^ t

    # transpose -> key: interleave MSB-first (x0 highest)
    return (_expand_bits(x0) << 2) | (_expand_bits(x1) << 1) \
        | _expand_bits(x2)


def morton_sort(pos, lo, hi, n_pad: int = 0, valid=None,
                curve: str = "hilbert"):
    """Sort positions by space-filling-curve key; returns (sorted_pos, perm).

    ``curve``: 'hilbert' (default -- compact equal-count chunks everywhere)
    or 'morton' (Z-order; cheaper keys but jumpy chunks at octant
    boundaries).  ``n_pad`` extra slots are appended with key = int32 max
    so padding sorts to the end (empty tail leaves).  ``valid`` marks live
    slots of an already-padded array (sharded capacity padding): invalid
    slots also get the max key.
    """
    keys = (hilbert_keys if curve == "hilbert" else morton_keys)(pos, lo, hi)
    maxkey = jnp.iinfo(jnp.int32).max
    if valid is not None:
        keys = jnp.where(valid, keys, maxkey)
    if n_pad:
        keys = jnp.concatenate(
            [keys, jnp.full((n_pad,), maxkey, jnp.int32)])
        pos = jnp.concatenate([pos, jnp.zeros((n_pad, 3), pos.dtype)])
    perm = jnp.argsort(keys)
    return pos[perm], perm
