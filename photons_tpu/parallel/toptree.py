"""Top tree: the replicated cross-shard domain tree.

Reference parity (toptree.c): every rank publishes its local root
multipoles (connect_local_toptree, toptree.c:11-50 -- an Allgather), a
binary tree over the ranks is swept upward with M2M
(walk_toptree_m2m, toptree.c:185-202), and a downward MAC walk computes
far-domain M2L into the local expansion while flagging near domains in
ExtDomain[] (walk_toptree_m2l, toptree.c:204-244).

TPU form: ``lax.all_gather`` of the per-shard root (center, width, count,
moments) inside ``shard_map``, a log2(D)-level pairwise M2M reduction, and
a vectorized MAC classification of the D shard domains:

- near domains (MAC fails / inside the halo horizon) -> served by the
  ghost ring (the ExtDomain flags become the hop mask);
- far domains -> one M2L each into the shard's root local expansion,
  pushed down by the regular L2L sweep.

Under the Ewald split every beyond-cutoff interaction is discarded, so
the far-domain M2L contributes exactly zero there (as in the reference,
where walk_toptree_m2l is not on the LONGSHORT main path); it carries the
far field for the open-boundary mode.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from photons_tpu.ops import multipoles as mp
from photons_tpu.ops.traversal import acceptance_flags


def toptree_far_field(tree, axis: str, theta: float,
                      cutoff: Optional[float], boxsize: Optional[float],
                      adjacency_eps: float):
    """All_gather shard roots, classify domains, M2L the far ones.

    Returns (delta_root_L (20,), near_mask (D,) bool, n_far scalar).
    near_mask[r] == True means shard r must be covered by the ghost/halo
    ring (the ExtDomain[] analogue); the caller checks it against the
    served hop set.
    """
    me = lax.axis_index(axis)

    root_c = tree.centers[0][0]                     # (3,)
    root_w = tree.widths[0][0]
    root_n = tree.counts[0][0]
    root_m = tree.moments[0][0]                     # (20,)

    all_c = lax.all_gather(root_c, axis)            # (D, 3)
    all_w = lax.all_gather(root_w, axis)
    all_n = lax.all_gather(root_n, axis)
    all_m = lax.all_gather(root_m, axis)            # (D, 20)

    dist = all_c - root_c[None, :]
    if boxsize is not None:
        dist = dist - boxsize * jnp.round(dist / boxsize)
    flags = acceptance_flags(dist, jnp.broadcast_to(root_w, all_w.shape),
                             all_w, jnp.broadcast_to(root_n, all_n.shape),
                             all_n, theta, cutoff, adjacency_eps)
    d_size = all_c.shape[0]
    is_self = jnp.arange(d_size) == me

    far = (flags == 1) & ~is_self
    near = (flags == 0) & ~is_self                  # ExtDomain flags

    # M2L from every far domain root into my root local expansion
    # (Newtonian: only meaningful in open-boundary mode; under LONGSHORT
    # beyond-cutoff domains were already discarded by the MAC, so `far`
    # only holds in-cutoff accepted domains -- the caller must not apply
    # this in LONGSHORT mode or it would double-count the ghost ring)
    disp = jnp.where(far[:, None], -dist, 1.0)      # d = c_me - c_r
    m_src = jnp.where(far[:, None], all_m, 0.0)
    dl = mp.m2l(m_src, disp, split_radius=None)
    delta_root_l = jnp.sum(jnp.where(far[:, None], dl, 0.0), axis=0)
    return delta_root_l, near, jnp.sum(far)


def domain_tree_moments(tree, axis: str):
    """Upward M2M over the binary tree of shard domains
    (walk_toptree_m2m): returns per-level (centers, moments) tuples with
    level 0 = the global root.  D must be a power of two."""
    root_c = lax.all_gather(tree.centers[0][0], axis)   # (D, 3)
    root_n = lax.all_gather(tree.counts[0][0], axis)
    root_m = lax.all_gather(tree.moments[0][0], axis)

    centers = [root_c]
    moments = [root_m]
    counts = [root_n]
    c, m, n = root_c, root_m, root_n
    while c.shape[0] > 1:
        c2 = c.reshape(-1, 2, 3)
        n2 = n.reshape(-1, 2)
        w = jnp.maximum(n2, 1)[..., None].astype(c.dtype)
        parent_c = jnp.sum(c2 * w, axis=1) / jnp.maximum(
            jnp.sum(w, axis=1), 1.0)
        d = parent_c[:, None, :] - c2
        parent_m = jnp.sum(mp.m2m(m.reshape(-1, 2, mp.NMULTI), d), axis=1)
        c, m, n = parent_c, parent_m, n2.sum(axis=1)
        centers.insert(0, c)
        moments.insert(0, m)
        counts.insert(0, n)
    return tuple(centers), tuple(moments), tuple(counts)
