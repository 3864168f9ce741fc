"""Open-boundary multi-chip far field: systolic ring carrying each shard's
tree (metadata + leaf bodies) one hop per stage.

The reference serves inter-domain forces with MAC-pruned send-trees plus
bodies over a rank ring (prepare_sendtree2, remotes.c:337-446; fmm_remote,
remotes.c:740-809): stage n sends to rank+n, and each received tree feeds
BOTH the ext P2P walk and the ext M2L walk (fmm_remote_task,
remotes.c:670-738).  TPU form -- one ``lax.scan`` whose carry is the
visiting shard's tree, advanced one ``ppermute`` hop per stage, so the
compiled program is O(1) in the device count (the round-1 version unrolled
one traversal per remote domain: O(D) program, a compile-time wall at
large meshes):

1. **Ring carry**: per-level (centers, widths, counts, moments) plus a
   fixed-capacity packed buffer of SURFACE leaves only -- leaves within
   the ghost horizon of the sender's own brick boundary, the only ones
   any receiver can ever ghost (every remote brick lies in the
   complement of the sender's, so dist(leaf, remote brick) >= dist(leaf,
   own boundary)).  This is the reference's MAC-pruned send-tree + only
   in-range bodies (prepare_sendtree2, remotes.c:337-446) made
   receiver-agnostic; ring bytes/stage scale with the interaction
   surface, not the shard volume (diag carries the measured carry
   size).  After stage k the carry holds shard (me+k)'s tree.
2. **Receiver-side ghost selection**: leaves of the visiting tree whose
   AABB is within horizon H of MY brick are appended to a fixed-capacity
   ghost buffer (their bodies enter the local near-field FMM).  Ghost
   membership is a predicate of the leaf AABB vs my brick, so it agrees
   exactly with the far-field carve-out below.
3. **Remote-tree M2L with the ghost zone carved out**: the visiting tree
   is dual-walked against the local tree (dual_tree_traversal_pair);
   source nodes within H of my brick open until their leaves, which are
   DISCARDED (their bodies arrived as ghosts) -- the exact complement of
   step 2.  Pairs still open at the leaf level are force-accepted as M2L;
   with H = 2*w_leaf_max/theta the MAC provably holds beyond the horizon.
4. **Top-tree shortcut** (walk_toptree_m2l parity, toptree.c:204-244):
   domains whose ROOT passes the MAC at gap > H are handled by ONE
   root-level M2L (their stages contribute nothing else: counts are
   masked to zero, so the in-scan walk discards everything).

The near field (local + ghost bodies) runs through the ordinary
single-tree FMM; every (local, remote) particle pair is covered exactly
once: P2P/near-M2L if the remote leaf was ghosted, remote M2L otherwise.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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


def far_field_and_ghosts(tree: Tree, xbounds, ybounds, horizon,
                         cfg: SimConfig, ghost_leaf_cap: int,
                         ax: str, ay: str):
    """Ring pass over all remote shards: far-field M2L acceleration plus
    the in-horizon ghost leaf bodies, in one scan.

    tree: the LOCAL-ONLY shard tree (no ghosts -- its node AABBs stay
    inside the brick, so remote-M2L local expansions converge for every
    contained particle).

    Returns (acc (cap, 3) in the input particle order,
             ghost_pos (ghost_leaf_cap*S, 3), ghost_valid, diag dict).
    """
    dx = lax.axis_size(ax)
    dy = lax.axis_size(ay)
    d_size = dx * dy
    me = lax.axis_index(ax) * dy + lax.axis_index(ay)
    axes = (ax, ay)
    theta = cfg.open_angle
    s = tree.leaf_size
    dtype = tree.pos.dtype

    xlo = xbounds[lax.axis_index(ax)]
    xhi = xbounds[lax.axis_index(ax) + 1]
    ylo = ybounds[lax.axis_index(ay)]
    yhi = ybounds[lax.axis_index(ay) + 1]
    h2 = horizon * horizon

    # ---- domain-level classification (walk_toptree_m2l, toptree.c:204) --
    # only the ROOT metadata is all_gathered (O(D) scalars; the full trees
    # travel hop-by-hop in the ring below)
    root_c = lax.all_gather(tree.centers[0][0], axes)        # (D, 3)
    root_w = lax.all_gather(tree.widths[0][0], axes)
    root_n = lax.all_gather(tree.counts[0][0], axes)
    root_m = lax.all_gather(tree.moments[0][0], axes)        # (D, 20)
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
    far = mac_ok & (root_gap2 > h2) & nonself & nonempty
    near = nonself & nonempty & ~far                # ExtDomain[] analogue

    locals_init = tuple(jnp.zeros_like(m) for m in tree.moments)

    # single root M2L per far domain (delta_root_l)
    disp_far = jnp.where(far[:, None], my_c - root_c, 1.0)
    m_far = jnp.where(far[:, None], root_m, 0.0)
    dl = mp.m2l(m_far, disp_far, split_radius=None)
    locals_init = (locals_init[0] + jnp.sum(
        jnp.where(far[:, None], dl, 0.0), axis=0, keepdims=True),
    ) + locals_init[1:]

    ghost_pos0 = jnp.zeros((ghost_leaf_cap, s, 3), dtype)
    ghost_val0 = jnp.zeros((ghost_leaf_cap, s), bool)

    # ---- surface-leaf packing (prepare_sendtree2 parity) -----------------
    # Only leaves within the horizon of MY OWN brick boundary can ever be
    # ghosted by a receiver: every remote brick lies in the complement of
    # mine, so dist(leaf, any remote brick) >= dist(leaf, my boundary).
    # The ring therefore carries a fixed-capacity packed surface buffer
    # instead of the whole shard's (n_leaf, S, 3) body blocks -- the
    # reference ships MAC-pruned trees + only in-range bodies
    # (remotes.c:337-446); this is the receiver-agnostic equivalent (one
    # carry serves every hop, so the prune must hold for the CLOSEST
    # possible receiver = my own boundary).
    surf_cap = max(1, int(np.ceil(cfg.surface_leaf_frac * tree.n_leaf)))
    lc = tree.centers[-1]
    lw = tree.widths[-1]
    half_in_x = jnp.minimum(lc[:, 0] - 0.5 * lw[:, 0] - xlo,
                            xhi - lc[:, 0] - 0.5 * lw[:, 0])
    half_in_y = jnp.minimum(lc[:, 1] - 0.5 * lw[:, 1] - ylo,
                            yhi - lc[:, 1] - 0.5 * lw[:, 1])
    depth_in = jnp.maximum(jnp.minimum(half_in_x, half_in_y), 0.0)
    on_surface = (depth_in <= horizon) & (tree.counts[-1] > 0)
    sidx = jnp.where(on_surface, jnp.cumsum(on_surface) - 1, surf_cap)
    surf_ovf = jnp.sum(on_surface) > surf_cap
    spos0 = jnp.zeros((surf_cap, s, 3), dtype).at[sidx].set(
        tree.pos, mode="drop")
    smask0 = jnp.zeros((surf_cap, s), bool).at[sidx].set(
        tree.mask & on_surface[:, None], mode="drop")
    scen0 = jnp.zeros((surf_cap, 3), dtype).at[sidx].set(lc, mode="drop")
    swid0 = jnp.zeros((surf_cap, 3), dtype).at[sidx].set(lw, mode="drop")
    scnt0 = jnp.zeros((surf_cap,), tree.counts[-1].dtype).at[sidx].set(
        jnp.where(on_surface, tree.counts[-1], 0), mode="drop")

    if d_size == 1:
        locals_per_level = downward_l2l(tree, list(locals_init))
        acc_leaf = leaf_l2p(tree, locals_per_level[-1])
        flat = jnp.where(tree.mask[..., None], acc_leaf, 0.0).reshape(-1, 3)
        acc_all = jnp.zeros((tree.perm.shape[0], 3), flat.dtype)
        acc_all = acc_all.at[tree.perm].set(flat)
        diag = {"n_m2l_far": jnp.sum(far).astype(jnp.int32),
                "overflow": jnp.asarray(False), "near_mask": near,
                "ring_bytes": jnp.asarray(0, jnp.int32)}
        return (acc_all, ghost_pos0.reshape(-1, 3), ghost_val0.reshape(-1),
                diag)

    # ---- systolic ring: one ppermute hop per scan stage -----------------
    # shard me receives from me+1 each hop, so after k hops it holds
    # shard (me+k)'s tree (the reference ring's recv-from (rank-n) with
    # roles of sender/receiver mirrored, remotes.c:782-800)
    perm = [(i, (i - 1) % d_size) for i in range(d_size)]

    def rotate(a):
        return lax.ppermute(a, axes, perm)

    meta0 = (tuple(tree.centers), tuple(tree.widths), tuple(tree.counts),
             tuple(tree.moments), spos0, smask0, scen0, swid0, scnt0)
    carry_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                      for a in jax.tree_util.tree_leaves(meta0))

    def stage(carry, k):
        meta, locals_pl, gpos, gval, g_n, n_m2l, ovf = carry
        meta = jax.tree_util.tree_map(rotate, meta)
        (centers_s, widths_s, counts_s, moments_s,
         leaf_pos, leaf_mask, scen, swid, scnt) = meta
        src = (me + k) % d_size
        is_near = near[src]
        counts_g = tuple(jnp.where(is_near, c, 0) for c in counts_s)
        moments_g = tuple(jnp.where(is_near, m, 0.0) for m in moments_s)

        # receiver-side ghost selection: visiting SURFACE leaves inside MY
        # horizon (the carve-out zone below still tests the full metadata,
        # so any in-zone leaf is provably on the sender's surface)
        leaf_gap2 = brick_gap2(scen, swid, xlo, xhi, ylo, yhi)
        sel = (leaf_gap2 <= h2) & (scnt > 0) & is_near
        idx = jnp.cumsum(sel) - 1
        dest = jnp.where(sel, g_n + idx, ghost_leaf_cap)
        gpos = gpos.at[dest].set(leaf_pos, mode="drop")
        gval = gval.at[dest].set(leaf_mask & sel[:, None], mode="drop")
        n_sel = jnp.sum(sel).astype(jnp.int32)
        ovf = ovf | (g_n + n_sel > ghost_leaf_cap)
        g_n = jnp.minimum(g_n + n_sel, ghost_leaf_cap)

        # remote-tree M2L with the ghost zone carved out
        zone = tuple((brick_gap2(c, w, xlo, xhi, ylo, yhi) <= h2)
                     for c, w in zip(centers_s, widths_s))
        lists = dual_tree_traversal_pair(
            tree.centers, tree.widths, tree.counts,
            centers_s, widths_s, counts_g,
            theta=theta, cutoff=None, boxsize=None,
            open_cap=cfg.open_cap_per_node, m2l_cap=cfg.m2l_cap_per_node,
            p2p_cap=cfg.m2l_cap_per_node,
            adjacency_eps=0.0, leaf_unresolved="m2l", source_zone=zone)
        locals_pl = tuple(apply_m2l_pair(
            tree, lists, centers_s, moments_g, split_radius=None,
            boxsize=None, locals_per_level=list(locals_pl)))
        n_m2l = (n_m2l
                 + jnp.where(is_near, sum(lists.m2l_counts), 0)).astype(
                     jnp.int32)
        ovf = ovf | (lists.overflow & is_near)
        return (meta, locals_pl, gpos, gval, g_n, n_m2l, ovf), None

    carry0 = (meta0, locals_init, ghost_pos0, ghost_val0,
              jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
              surf_ovf)
    (meta, locals_pl, gpos, gval, g_n, n_m2l, overflow), _ = lax.scan(
        stage, carry0, jnp.arange(1, d_size))

    locals_per_level = downward_l2l(tree, list(locals_pl))
    acc_leaf = leaf_l2p(tree, locals_per_level[-1])

    flat = jnp.where(tree.mask[..., None], acc_leaf, 0.0).reshape(-1, 3)
    acc_all = jnp.zeros((tree.perm.shape[0], 3), flat.dtype)
    acc_all = acc_all.at[tree.perm].set(flat)

    diag = {"n_m2l_far": n_m2l + jnp.sum(far).astype(jnp.int32),
            "overflow": overflow,
            "near_mask": near,
            "ring_bytes": jnp.asarray(min(carry_bytes, 2**31 - 1),
                                      jnp.int32)}
    return acc_all, gpos.reshape(-1, 3), gval.reshape(-1), diag
