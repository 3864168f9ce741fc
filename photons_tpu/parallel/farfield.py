"""Open-boundary multi-chip far field: leaf-aligned ghost exchange +
remote-tree M2L.

The reference serves inter-domain forces with MAC-pruned send-trees plus
bodies over a rank ring (prepare_sendtree2, remotes.c:337-446; fmm_remote,
remotes.c:740-809) and flags near domains in ExtDomain[] from a top-tree
MAC walk (walk_toptree_m2l, toptree.c:204-244).  Under the Ewald split the
ghost ring alone is exact (everything beyond the cutoff is discarded), but
the open-boundary Newtonian mode needs the far field too.  TPU form:

1. **Leaf-aligned ghost exchange**: each shard ships WHOLE leaf blocks of
   its local tree whose AABBs lie within a horizon H of the target's brick
   (one ppermute per grid offset).  Ghost membership is a predicate of the
   leaf AABB, so both sides agree exactly on which bodies travelled.
2. **Remote-tree M2L**: per-level tree metadata (centers, widths, counts,
   moments) is all_gathered once; each remote tree is dual-walked against
   the local tree (dual_tree_traversal_pair) with the ghost zone carved
   out: source nodes within H of my brick open until their leaves, which
   are DISCARDED (their bodies arrived as ghosts) -- the exact complement
   of step 1.  Pairs still open at the leaf level are force-accepted as
   M2L; with H = 2*w_leaf_max/theta the MAC provably holds beyond the
   horizon, so the fallback only fires for degenerate geometry.
3. **Top-tree shortcut** (walk_toptreem2l parity): domains whose ROOT
   already passes the MAC at gap > H skip the per-level walk entirely and
   contribute ONE root-level M2L into the local expansion
   (toptree_far_field's delta_root_l).

The near field (local + ghost bodies) runs through the ordinary single-tree
FMM; every (local, remote) particle pair is covered exactly once:
P2P/near-M2L if the remote leaf was ghosted, remote M2L otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from photons_tpu.config import SimConfig
from photons_tpu.ops import multipoles as mp
from photons_tpu.ops.fmm_engine import (apply_m2l_pair, downward_l2l,
                                        leaf_l2p)
from photons_tpu.ops.traversal import dual_tree_traversal_pair
from photons_tpu.tree.build import Tree


def brick_gap2(centers, widths, xlo, xhi, ylo, yhi):
    """Squared 2-D (x, y) gap between node AABBs and a brick (no wrap:
    bricks are full-extent in z and the open-boundary box does not wrap)."""
    gx = jnp.maximum(jnp.abs(centers[..., 0] - 0.5 * (xlo + xhi))
                     - 0.5 * widths[..., 0] - 0.5 * (xhi - xlo), 0.0)
    gy = jnp.maximum(jnp.abs(centers[..., 1] - 0.5 * (ylo + yhi))
                     - 0.5 * widths[..., 1] - 0.5 * (yhi - ylo), 0.0)
    return gx * gx + gy * gy


def ghost_horizon(tree: Tree, theta: float, axes) -> jax.Array:
    """H = 2 * max leaf AABB extent / theta (global max over shards).

    Beyond H every leaf pair satisfies the MAC (2*max(w_mean) <= 2*w_max
    < theta*H <= theta*d), so the far-field walk's forced-accept fallback
    is provably idle; inside H bodies travel as ghosts."""
    w_local = jnp.max(tree.widths[-1])
    w_max = lax.pmax(w_local, axes)
    return 2.0 * w_max / theta * 1.0625          # margin for center offsets


def gather_ghost_leaves(tree: Tree, xbounds, ybounds, horizon,
                        leaf_cap: int, ax: str, ay: str):
    """Ship whole leaf blocks within ``horizon`` of each neighbor's brick.

    Returns (ghost_pos ((D-1)*leaf_cap*S, 3), ghost_valid, overflow).
    """
    dx = lax.axis_size(ax)
    dy = lax.axis_size(ay)
    ix = lax.axis_index(ax)
    iy = lax.axis_index(ay)
    s = tree.leaf_size
    n_leaf = tree.n_leaf

    centers = tree.centers[-1]
    widths = tree.widths[-1]

    ghost_pos, ghost_val = [], []
    overflow = jnp.asarray(False)
    for kx in range(dx):
        for ky in range(dy):
            if (kx, ky) == (0, 0):
                continue
            tx = (ix + kx) % dx
            ty = (iy + ky) % dy
            gap2 = brick_gap2(centers, widths, xbounds[tx], xbounds[tx + 1],
                              ybounds[ty], ybounds[ty + 1])
            sel = (gap2 <= horizon * horizon) & (tree.counts[-1] > 0)
            # pack selected leaf blocks to the front (argsort by ~sel)
            order = jnp.argsort(~sel, stable=True)[:leaf_cap]
            buf = tree.pos[order]                        # (cap, S, 3)
            val = tree.mask[order] & sel[order][:, None]
            overflow |= jnp.sum(sel) > leaf_cap
            if kx:
                permx = [(i, (i + kx) % dx) for i in range(dx)]
                buf = lax.ppermute(buf, ax, permx)
                val = lax.ppermute(val, ax, permx)
            if ky:
                permy = [(i, (i + ky) % dy) for i in range(dy)]
                buf = lax.ppermute(buf, ay, permy)
                val = lax.ppermute(val, ay, permy)
            ghost_pos.append(buf.reshape(-1, 3))
            ghost_val.append(val.reshape(-1))
    if not ghost_pos:
        return (jnp.zeros((0, 3), tree.pos.dtype), jnp.zeros((0,), bool),
                overflow)
    return jnp.concatenate(ghost_pos), jnp.concatenate(ghost_val), overflow


def open_far_field(tree: Tree, xbounds, ybounds, horizon, cfg: SimConfig,
                   ax: str, ay: str):
    """Far-field acceleration from all remote shards' non-ghosted mass.

    tree: the LOCAL-ONLY shard tree (no ghosts -- its node AABBs stay
    inside the brick, so remote-M2L local expansions converge for every
    contained particle).  Returns (acc (cap, 3) in the input particle
    order, diag dict).
    """
    dx = lax.axis_size(ax)
    dy = lax.axis_size(ay)
    d_size = dx * dy
    me = lax.axis_index(ax) * dy + lax.axis_index(ay)
    axes = (ax, ay)
    theta = cfg.open_angle

    # one all_gather of the whole per-level tree metadata (toptree parity:
    # connect_local_toptree Allgathers root multipoles, toptree.c:11-50;
    # here every level travels so the remote walk can descend)
    g_centers = [lax.all_gather(c, axes) for c in tree.centers]
    g_widths = [lax.all_gather(w, axes) for w in tree.widths]
    g_counts = [lax.all_gather(c, axes) for c in tree.counts]
    g_moments = [lax.all_gather(m, axes) for m in tree.moments]

    xlo = xbounds[lax.axis_index(ax)]
    xhi = xbounds[lax.axis_index(ax) + 1]
    ylo = ybounds[lax.axis_index(ay)]
    yhi = ybounds[lax.axis_index(ay) + 1]

    # ---- domain-level classification (walk_toptree_m2l, toptree.c:204) --
    root_c = g_centers[0][:, 0]                     # (D, 3)
    root_w = g_widths[0][:, 0]
    root_n = g_counts[0][:, 0]
    root_m = g_moments[0][:, 0]                     # (D, 20)
    my_c = tree.centers[0][0]
    my_w = tree.widths[0][0]
    dist = root_c - my_c
    wbar = 0.5 * (root_w + my_w)
    wmax2 = 2.0 * jnp.max(wbar, axis=-1)
    dd2 = jnp.sum(dist * dist, axis=-1)
    mac_ok = (wmax2 * wmax2) < (theta * theta) * dd2
    root_gap2 = brick_gap2(root_c, root_w, xlo, xhi, ylo, yhi)
    nonself = jnp.arange(d_size) != me
    nonempty = root_n > 0
    # far domains: root MAC holds AND no leaf can be inside the ghost zone
    far = mac_ok & (root_gap2 > horizon * horizon) & nonself & nonempty
    near = nonself & nonempty & ~far                # ExtDomain[] analogue

    locals_per_level = [jnp.zeros_like(m) for m in tree.moments]

    # single root M2L per far domain (delta_root_l)
    disp_far = jnp.where(far[:, None], my_c - root_c, 1.0)
    m_far = jnp.where(far[:, None], root_m, 0.0)
    dl = mp.m2l(m_far, disp_far, split_radius=None)
    locals_per_level[0] = locals_per_level[0] + jnp.sum(
        jnp.where(far[:, None], dl, 0.0), axis=0, keepdims=True)

    # ---- per-level walk against each near domain's tree -----------------
    n_m2l = jnp.zeros((), jnp.int32)
    overflow = jnp.asarray(False)
    h2 = horizon * horizon
    for k in range(1, d_size):
        src = (me + k) % d_size
        is_near = near[src]
        centers_s = [c[src] for c in g_centers]
        widths_s = [w[src] for w in g_widths]
        counts_s = [jnp.where(is_near, c[src], 0) for c in g_counts]
        moments_s = [jnp.where(is_near, m[src], 0.0) for m in g_moments]
        zone = tuple((brick_gap2(c, w, xlo, xhi, ylo, yhi) <= h2)
                     for c, w in zip(centers_s, widths_s))
        lists = dual_tree_traversal_pair(
            tree.centers, tree.widths, tree.counts,
            centers_s, widths_s, counts_s,
            theta=theta, cutoff=None, boxsize=None,
            open_cap=cfg.open_cap_per_node, m2l_cap=cfg.m2l_cap_per_node,
            p2p_cap=cfg.m2l_cap_per_node,
            adjacency_eps=0.0, leaf_unresolved="m2l", source_zone=zone)
        locals_per_level = apply_m2l_pair(
            tree, lists, centers_s, moments_s, split_radius=None,
            boxsize=None, locals_per_level=locals_per_level)
        n_m2l = n_m2l + jnp.where(is_near, sum(lists.m2l_counts), 0)
        overflow |= lists.overflow & is_near

    locals_per_level = downward_l2l(tree, locals_per_level)
    acc_leaf = leaf_l2p(tree, locals_per_level[-1])

    flat = jnp.where(tree.mask[..., None], acc_leaf, 0.0).reshape(-1, 3)
    acc_all = jnp.zeros((tree.perm.shape[0], 3), flat.dtype)
    acc_all = acc_all.at[tree.perm].set(flat)

    diag = {"n_m2l_far": n_m2l + jnp.sum(far).astype(jnp.int32),
            "overflow": overflow,
            "near_mask": near}
    return acc_all, diag
