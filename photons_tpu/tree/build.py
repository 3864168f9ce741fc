"""Balanced binary tree over Morton-sorted, fixed-capacity leaf blocks.

TPU-native replacement for the reference's recursive kd-tree
(build_localtree, fmm.c:176-263): instead of pointer-chasing mean splits,
particles are Morton-sorted once and chunked into ``leaf_size``-particle
leaves (the sorted order makes chunks spatially compact, like kd leaves,
which are also contiguous ranges of a spatial sort).  Above the leaves sits
a perfect binary tree of depth D = log2(nleaf); every per-level quantity is
a dense array, so the build is a handful of vectorized reductions -- no
recursion, fully static shapes, jit-compatible.

Node geometry uses particle AABBs (tighter than the reference's geometric
split boxes; the MAC remains valid).  Leaf occupancy masks handle the tail
padding; empty nodes carry count 0 and zero multipoles.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from photons_tpu.ops.multipoles import NMULTI, m2m, p2m
from photons_tpu.tree.morton import morton_sort


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Tree:
    """Per-level arrays: index 0 = root level (1 node), -1 = leaf level.

    pos      (nleaf, S, 3)  leaf-blocked sorted positions
    mask     (nleaf, S)     particle validity
    perm     (nleaf*S,)     sorted-slot -> original-index (>= N for padding)
    centers  tuple of (2^d, 3)
    widths   tuple of (2^d, 3)   full AABB extents (reference convention)
    counts   tuple of (2^d,)     particles per node
    moments  tuple of (2^d, 20)  multipole expansions about the centers
    """

    pos: jax.Array
    mask: jax.Array
    perm: jax.Array
    centers: Tuple[jax.Array, ...]
    widths: Tuple[jax.Array, ...]
    counts: Tuple[jax.Array, ...]
    moments: Tuple[jax.Array, ...]

    @property
    def n_leaf(self) -> int:
        return self.pos.shape[0]

    @property
    def leaf_size(self) -> int:
        return self.pos.shape[1]

    @property
    def depth(self) -> int:
        return len(self.centers) - 1


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


@partial(jax.jit, static_argnames=("leaf_size", "mass", "lo", "hi"))
def build_tree(pos, mass: float, leaf_size: int, lo: float, hi: float,
               valid=None) -> Tree:
    """Morton sort + leaf blocking + upward (P2M, M2M) pass.

    The upward pass fuses the reference's fmm_prepare sequence: p2m for
    every leaf (fmm.c:782-783) then walk_m2m (operator.c:165-194), as
    vmapped batched ops per level.

    ``valid``: optional liveness mask for capacity-padded inputs (sharded
    mode); invalid slots sort to the tail and carry zero mass.
    """
    n = pos.shape[0]
    n_leaf = _next_pow2(-(-n // leaf_size))
    n_pad = n_leaf * leaf_size - n

    sorted_pos, perm = morton_sort(pos, lo, hi, n_pad, valid=valid)
    if valid is None:
        mask = (jnp.arange(n_leaf * leaf_size) < n)
    else:
        valid_pad = jnp.concatenate(
            [valid, jnp.zeros((n_pad,), bool)]) if n_pad else valid
        mask = valid_pad[perm]

    leaf_pos = sorted_pos.reshape(n_leaf, leaf_size, 3)
    leaf_mask = mask.reshape(n_leaf, leaf_size)
    return tree_from_sorted(leaf_pos, leaf_mask, perm, mass)


@partial(jax.jit, static_argnames=("mass",))
def tree_from_sorted(leaf_pos, leaf_mask, perm, mass: float) -> Tree:
    """Upward pass over an already-sorted leaf blocking.

    The second half of :func:`build_tree`, callable on its own for
    list-reuse stepping (cfg.list_reuse): when the sort is frozen between
    traversal rebuilds, only the AABBs/centers/widths and multipoles need
    refreshing from the moved positions -- the sort and the interaction
    lists are reused as-is."""
    n_leaf, leaf_size = leaf_pos.shape[:2]
    pos = leaf_pos

    big = jnp.asarray(jnp.finfo(pos.dtype).max, pos.dtype)
    pmin = jnp.min(jnp.where(leaf_mask[..., None], leaf_pos, big), axis=1)
    pmax = jnp.max(jnp.where(leaf_mask[..., None], leaf_pos, -big), axis=1)
    counts_leaf = jnp.sum(leaf_mask, axis=1)
    nonempty = (counts_leaf > 0)[:, None]
    center_leaf = jnp.where(nonempty, 0.5 * (pmin + pmax), 0.0)
    width_leaf = jnp.where(nonempty, pmax - pmin, 0.0)

    masses = jnp.where(leaf_mask, mass, 0.0).astype(pos.dtype)
    # chunk the leaf axis: p2m expands (nleaf, S, NMULTI) monomials --
    # 10.7 GB at 512^3 / S=128 (1M leaves), the build_tree OOM at that
    # scale.  lax.scan over 64K-leaf chunks: the earlier unrolled
    # optimization_barrier loop stopped XLA re-fusing the chunks but NOT
    # re-ordering them -- the 512^3 OOM dump showed the scheduler holding
    # FIVE chunk temps (6.25 GB) in flight.  scan's loop-carried
    # sequencing bounds the live monomial temp to ONE chunk.
    _P2M_CHUNK = 1 << 16
    if n_leaf > _P2M_CHUNK and n_leaf % _P2M_CHUNK == 0:
        nc = n_leaf // _P2M_CHUNK
        s = leaf_pos.shape[1]

        # scan xs must be PER-AXIS 2-D blocks: a (nc, chunk, S, 3) input
        # gets a lane-minor 3-axis layout at the scan boundary, whose
        # (8,128) tiling pads 42x -- a 64 GB copy at 512^3 (measured).
        # The in-body stack feeds monomials(), which slices the axis
        # right back off, so nothing 3-minor materializes.
        def _p2m_chunk(_, xs):
            px, py, pz, cx, cy, cz, ms = xs
            dx = jnp.stack([px - cx[:, None], py - cy[:, None],
                            pz - cz[:, None]], axis=-1)
            return None, p2m(dx, ms)

        _, m_leaf = jax.lax.scan(
            _p2m_chunk, None,
            tuple(leaf_pos[:, :, ax].reshape(nc, _P2M_CHUNK, s)
                  for ax in range(3))
            + tuple(center_leaf[:, ax].reshape(nc, _P2M_CHUNK)
                    for ax in range(3))
            + (masses.reshape(nc, _P2M_CHUNK, s),))
        m_leaf = m_leaf.reshape(n_leaf, m_leaf.shape[-1])
    else:
        m_leaf = p2m(leaf_pos - center_leaf[:, None, :], masses)

    centers = [center_leaf]
    widths = [width_leaf]
    counts = [counts_leaf]
    moments = [m_leaf]
    mins, maxs = pmin, pmax

    depth = n_leaf.bit_length() - 1
    for _ in range(depth):
        mins2 = mins.reshape(-1, 2, 3)
        maxs2 = maxs.reshape(-1, 2, 3)
        cnt2 = counts[0].reshape(-1, 2)
        ne = (cnt2 > 0)[..., None]
        mins = jnp.min(jnp.where(ne, mins2, big), axis=1)
        maxs = jnp.max(jnp.where(ne, maxs2, -big), axis=1)
        cnt = jnp.sum(cnt2, axis=1)
        nonempty = (cnt > 0)[:, None]
        center = jnp.where(nonempty, 0.5 * (mins + maxs), 0.0)
        width = jnp.where(nonempty, maxs - mins, 0.0)

        child_m = moments[0].reshape(-1, 2, NMULTI)
        child_c = centers[0].reshape(-1, 2, 3)
        # shift both children to the parent center and sum (walk_m2m)
        d = center[:, None, :] - child_c
        m_parent = jnp.sum(m2m(child_m, d), axis=1)

        centers.insert(0, center)
        widths.insert(0, width)
        counts.insert(0, cnt)
        moments.insert(0, m_parent)

    return Tree(pos=leaf_pos, mask=leaf_mask, perm=perm,
                centers=tuple(centers), widths=tuple(widths),
                counts=tuple(counts), moments=tuple(moments))
