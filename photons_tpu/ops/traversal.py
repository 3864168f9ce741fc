"""Vectorized dual-tree traversal (interaction-list construction).

The reference walks the tree pair recursively on the host
(walk_task_p2p / walk_task_m2l, fmm.c:402-534,562-705), emitting P2P tasks
for leaf pairs that keep failing the MAC and M2L tasks for accepted pairs.
On TPU the same partition of the interaction set is computed as a
**level-synchronized frontier sweep**: the frontier at depth d holds all
still-open (target, source) node pairs at that depth; each sweep expands
every pair into its 4 child pairs, classifies them with the vectorized MAC,
appends accepted pairs to that level's M2L list, and carries open pairs
down.  Open pairs at the leaf level are the P2P list.  Everything is
fixed-capacity + masked, so the whole traversal jits and differentiates.

MAC semantics follow ``acceptance`` (fmm.c:266-325) exactly:

  w      = (w_i + w_j)/2 per axis (full widths)
  gap    = max(|dist| - w, 0) per axis
  open     if sum(gap) < eps                  (adjacent boxes)
  discard  if sum(gap^2) >= cutoff^2          (PM takes over; -DLONGSHORT)
  open     if |dist|^2 > cutoff^2             (force-refine near the cutoff)
  accept   if (2 max(w))^2 < theta^2 |dist|^2
  open     otherwise

Periodic improvement over the reference: displacements are wrapped with the
minimum-image convention (valid because cutoff < L/2), so ONE traversal
covers all 26 periodic images instead of the reference's 27 ring passes
(fmm.c:1083-1106).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from photons_tpu.tree.build import Tree


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class InteractionLists:
    """Padded interaction lists; invalid slots hold index -1.

    m2l        tuple over depths 1..D of (cap_d, 2) int32 pair arrays
    m2l_counts tuple of scalars (valid pairs per depth)
    p2p        (cap_p2p, 2) int32 leaf pairs (includes the diagonal)
    p2p_count  scalar
    overflow   bool -- any capacity exceeded (results incomplete; enlarge
               caps and recompile, SURVEY.md section 7 'hard parts')
    """

    m2l: Tuple[jax.Array, ...]
    m2l_counts: Tuple[jax.Array, ...]
    p2p: jax.Array
    p2p_count: jax.Array
    overflow: jax.Array


def acceptance_flags(dist, w_t, w_s, count_t, count_s, theta: float,
                     cutoff: Optional[float], adjacency_eps: float):
    """Vectorized MAC: returns int flags 1=accept, 0=open, -1=discard."""
    w = 0.5 * (w_t + w_s)
    gap = jnp.maximum(jnp.abs(dist) - w, 0.0)
    gap_sum = jnp.sum(gap, axis=-1)
    dm2 = jnp.sum(gap * gap, axis=-1)
    dd2 = jnp.sum(dist * dist, axis=-1)
    wmax2 = 2.0 * jnp.max(w, axis=-1)

    accept = (wmax2 * wmax2) < (theta * theta) * dd2
    flags = jnp.where(accept, 1, 0)
    if cutoff is not None:
        c2 = cutoff * cutoff
        flags = jnp.where(dd2 > c2, 0, flags)       # force-open near cutoff
        flags = jnp.where(dm2 >= c2, -1, flags)     # fully beyond: discard
    flags = jnp.where(gap_sum < adjacency_eps, 0, flags)  # adjacent: open
    # empty nodes never interact
    flags = jnp.where((count_t == 0) | (count_s == 0), -1, flags)
    return flags


def _compact(pairs, mask, cap: int):
    """Pack masked rows of ``pairs`` into a (cap, 2) array; count + overflow."""
    idx = jnp.cumsum(mask) - 1
    dest = jnp.where(mask, idx, cap)                # cap -> dropped
    out = jnp.full((cap, 2), -1, jnp.int32)
    out = out.at[dest].set(pairs, mode="drop")
    count = jnp.sum(mask)
    return out, count, count > cap


from photons_tpu.ops.kernels import min_image as _min_image


@partial(jax.jit, static_argnames=("theta", "cutoff", "boxsize",
                                   "open_cap", "m2l_cap", "p2p_cap",
                                   "adjacency_eps"))
def dual_tree_traversal(tree: Tree, theta: float,
                        cutoff: Optional[float] = None,
                        boxsize: Optional[float] = None,
                        open_cap: int = 256, m2l_cap: int = 128,
                        p2p_cap: int = 192,
                        adjacency_eps: float = 1e-4) -> InteractionLists:
    """Build M2L (per level) and P2P pair lists for a balanced tree.

    open_cap/m2l_cap are per-node capacities (scaled by 2^d per level);
    p2p_cap is the per-leaf capacity.
    """
    return dual_tree_traversal_pair(
        tree.centers, tree.widths, tree.counts,
        tree.centers, tree.widths, tree.counts,
        theta=theta, cutoff=cutoff, boxsize=boxsize, open_cap=open_cap,
        m2l_cap=m2l_cap, p2p_cap=p2p_cap, adjacency_eps=adjacency_eps)


def dual_tree_traversal_pair(centers_t, widths_t, counts_t,
                             centers_s, widths_s, counts_s,
                             theta: float,
                             cutoff: Optional[float] = None,
                             boxsize: Optional[float] = None,
                             open_cap: int = 256, m2l_cap: int = 128,
                             p2p_cap: int = 192,
                             adjacency_eps: float = 1e-4,
                             leaf_unresolved: str = "p2p") -> InteractionLists:
    """Two-tree traversal: targets from tree T, sources from tree S (same
    balanced layout).  For S == T this is the local walk; with S = a remote
    shard's gathered tree metadata it is the cross-shard far-field pass
    (the reference's fmm_remote_task, remotes.c:670-738).

    leaf_unresolved: what to do with pairs still open at the leaf level --
    'p2p' emits them as near-field tasks (local walk; remote walk with
    ghost bodies available), 'm2l' force-accepts them as multipole
    interactions (pure far-field pass; the caller guarantees ghost bodies
    cover everything nearer than its acceptance horizon).
    """
    depth = len(centers_t) - 1
    frontier = jnp.zeros((1, 2), jnp.int32)         # the (root, root) pair
    f_count = jnp.asarray(1, jnp.int32)
    overflow = jnp.asarray(False)

    m2l_lists = []
    m2l_counts = []

    for d in range(depth):
        nd1 = 2 ** (d + 1)
        # expand each pair into 4 child pairs at depth d+1
        kids_t = (frontier[:, 0:1] * 2 + jnp.array([[0, 0, 1, 1]], jnp.int32))
        kids_s = (frontier[:, 1:2] * 2 + jnp.array([[0, 1, 0, 1]], jnp.int32))
        cand = jnp.stack([kids_t.reshape(-1), kids_s.reshape(-1)], axis=-1)
        valid = (jnp.arange(frontier.shape[0]) < f_count)
        valid = jnp.repeat(valid, 4)

        t, s = cand[:, 0], cand[:, 1]
        dist = _min_image(centers_t[d + 1][t] - centers_s[d + 1][s], boxsize)
        flags = acceptance_flags(dist, widths_t[d + 1][t],
                                 widths_s[d + 1][s], counts_t[d + 1][t],
                                 counts_s[d + 1][s],
                                 theta, cutoff, adjacency_eps)
        flags = jnp.where(valid, flags, -1)

        last = (d + 1 == depth)
        accept = flags == 1
        if last and leaf_unresolved == "m2l":
            accept = flags >= 0                     # force-accept leftovers

        cap_m2l = min(4 ** (d + 1), m2l_cap * nd1)
        lst, cnt, ovf = _compact(cand, accept, cap_m2l)
        m2l_lists.append(lst)
        m2l_counts.append(cnt)
        overflow |= ovf

        cap_open = p2p_cap * nd1 if last else min(4 ** (d + 1),
                                                  open_cap * nd1)
        frontier, f_count, ovf = _compact(cand, flags == 0, cap_open)
        overflow |= (ovf if not (last and leaf_unresolved == "m2l")
                     else jnp.asarray(False))

    return InteractionLists(m2l=tuple(m2l_lists), m2l_counts=tuple(m2l_counts),
                            p2p=frontier, p2p_count=f_count,
                            overflow=overflow)
