"""Vectorized dual-tree traversal (interaction-table construction).

The reference walks the tree pair recursively on the host
(walk_task_p2p / walk_task_m2l, fmm.c:402-534,562-705), emitting P2P tasks
for leaf pairs that keep failing the MAC and M2L tasks for accepted pairs.
On TPU the same partition of the interaction set is computed as a
**level-synchronized frontier sweep organized per target node**: each
target node at depth d owns a fixed-capacity row of still-open source
nodes.  Expanding to depth d+1, each target child inherits the children of
its parent's open sources (2*open_cap candidates), classifies them with the
vectorized MAC, packs accepts into that level's M2L table and still-open
sources into its own row.  Open rows at the leaf level ARE the per-leaf
P2P neighbor table -- exactly the layout the P2P kernels consume.

The per-row organization is the TPU-shaped choice: compaction is a batched
stable sort along a short row axis (no global million-row cumsum+scatter,
which dominated whole-step time beyond ~1M particles), M2L application
becomes a dense gather+reduce with exclusive row ownership (no scatter-add),
and the P2P table needs no post-hoc argsort regrouping.

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
from jax import lax

from photons_tpu.ops.kernels import min_image as _min_image
from photons_tpu.tree.build import Tree


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class InteractionLists:
    """Per-target-node interaction tables; invalid slots hold index -1.

    m2l        tuple over depths 1..D of (2^d, cap_d) int32 source-node
               tables (row t = sources accepted for target node t)
    m2l_counts tuple of scalars (valid pairs per depth)
    p2p        (n_leaf, p2p_cap) int32 source-leaf table (incl. diagonal)
    p2p_count  scalar (total valid leaf pairs)
    overflow   bool -- any per-row capacity exceeded (results incomplete;
               enlarge caps and recompile, SURVEY.md section 7 'hard parts')
    """

    m2l: Tuple[jax.Array, ...]
    m2l_counts: Tuple[jax.Array, ...]
    p2p: jax.Array
    p2p_count: jax.Array
    overflow: jax.Array
    # bitmask telling the elastic recovery WHICH cap tripped so it can
    # grow only that one (growing all three was measured to blow HBM at
    # 256^3): 1 = open frontier, 2 = m2l table, 4 = p2p leaf row
    overflow_bits: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))


OVF_OPEN, OVF_M2L, OVF_P2P = 1, 2, 4


def _flags_from_measures(gap_sum, dm2, dd2, wmax2, count_t, count_s,
                         theta: float, cutoff: Optional[float],
                         adjacency_eps: float):
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


def acceptance_flags(dist, w_t, w_s, count_t, count_s, theta: float,
                     cutoff: Optional[float], adjacency_eps: float):
    """Vectorized MAC: returns int flags 1=accept, 0=open, -1=discard."""
    w = 0.5 * (w_t + w_s)
    gap = jnp.maximum(jnp.abs(dist) - w, 0.0)
    return _flags_from_measures(
        jnp.sum(gap, axis=-1), jnp.sum(gap * gap, axis=-1),
        jnp.sum(dist * dist, axis=-1), 2.0 * jnp.max(w, axis=-1),
        count_t, count_s, theta, cutoff, adjacency_eps)


def acceptance_flags_axes(dists, w_ts, w_ss, count_t, count_s, theta: float,
                          cutoff: Optional[float], adjacency_eps: float):
    """Per-axis MAC: identical semantics to :func:`acceptance_flags` but
    computed from three separate per-axis arrays.

    Keeping the candidate geometry as 2-D (rows, K) per-axis tensors
    matters on TPU: a gathered (rows, K, 3) block can be assigned a
    {1,0}-major layout whose (8,128) tiling pads the 3-axis to 128 lanes --
    a 42x expansion that is a 16 GB temp at 256^3 (measured).  Per-axis
    2-D tensors are always lane-compact.
    """
    gap_sum = dm2 = dd2 = wmax2 = 0.0
    for dx, wt, ws in zip(dists, w_ts, w_ss):
        w = 0.5 * (wt + ws)
        gap = jnp.maximum(jnp.abs(dx) - w, 0.0)
        gap_sum = gap_sum + gap
        dm2 = dm2 + gap * gap
        dd2 = dd2 + dx * dx
        wmax2 = jnp.maximum(wmax2, 2.0 * w)
    return _flags_from_measures(gap_sum, dm2, dd2, wmax2, count_t, count_s,
                                theta, cutoff, adjacency_eps)


QBITS = 16
QMAX = (1 << QBITS) - 1          # u16 grid: box/65535 ~ 1.5 kpc at L=100 Mpc


def pack_node_geometry(centers, widths, counts, lo: float, hi: float):
    """Quantize per-level node geometry into 3 packed u32 words per node.

    The deep traversal levels are gather-bound (profile_traversal at
    256^3: the leaf level spends ~2.3 s of its 2.0 s cost materializing
    7 per-candidate f32/i32 gathers -- 3 axes of centers, 3 of widths,
    counts -- while the compaction sort costs +7 ms).  Packing the whole
    MAC geometry as 6 u16 fixed-point values in 3 u32 words cuts the
    gathered bytes per candidate 28 -> 12.

    Layout per node: wa = cx | cy<<16, wb = cz | wx<<16, wc = wy | wz<<16,
    centers rounded to the u16 grid over [lo, hi], widths CEILed up 1 grid
    unit (conservative: a too-wide node can only stay open longer).  Empty
    nodes carry the wx sentinel QMAX (decoded to 'discard', matching the
    count==0 test).  Quantization slack is compensated at flag time
    (``_quantized_slack``): the discard test inflates the cutoff and the
    accept test deflates theta, so every decision is a conservative
    refinement of the exact-MAC decision -- extra kept pairs only add
    erfc-damped near-zero P2P work, never lose interactions.

    Returns a tuple over levels of (wa, wb, wc) u32 arrays.
    """
    scale = QMAX / (hi - lo)
    packed = []
    for c, w, n in zip(centers, widths, counts):
        cq = jnp.clip(jnp.round((c - lo) * scale), 0, QMAX).astype(
            jnp.uint32)
        wq = jnp.clip(jnp.ceil(w * scale) + 1, 0, QMAX - 1).astype(
            jnp.uint32)
        wqx = jnp.where(n == 0, jnp.uint32(QMAX), wq[:, 0])
        wa = cq[:, 0] | (cq[:, 1] << QBITS)
        wb = cq[:, 2] | (wqx << QBITS)
        wc = wq[:, 1] | (wq[:, 2] << QBITS)
        packed.append((wa, wb, wc))
    return tuple(packed)


def _unpack_u16(word, which: int):
    return ((word >> (QBITS * which)) & QMAX).astype(jnp.int32)


def expand_open_caps(schedule, depth: int, open_cap: int):
    """Expand a leaf-anchored open-cap schedule to per-level caps.

    ``schedule[0]`` governs the DEEPEST internal level (depth-1),
    ``schedule[1]`` the next one up, ...; levels above the schedule's
    reach reuse its last entry.  Anchoring at the leaf end makes one
    schedule valid for any tree depth: the open-frontier size a level
    needs is set by its distance from the leaves (the cutoff ball
    measured in node extents), not by its absolute depth.  Measured at
    the 256^3 flagship (scripts/profile_traversal.py occupancy): max
    open/row is <= 32 at EVERY level in the IC regime, while the uniform
    open_cap=128 paid 2*128-wide candidate gathers per level -- the
    schedule is where most of the traversal's gather volume goes away.

    Returns None if schedule is None (uniform ``open_cap`` behavior).
    """
    if schedule is None:
        return None
    caps = []
    for d in range(depth):
        idx = (depth - 2) - d       # d == depth-2 -> deepest internal level
        if idx < 0:
            caps.append(int(open_cap))   # last-level slot (p2p_cap rules)
        else:
            caps.append(int(schedule[min(idx, len(schedule) - 1)]))
    return tuple(caps)


def _row_compact(vals, mask, cap: int, offset: int = 0):
    """Pack masked entries of each row to the front, truncated at ``cap``.

    vals/mask (R, K) -> packed (R, cap) with -1 padding, total count,
    overflow flag.  One batched SINGLE-ARRAY sort along the short row
    axis -- the TPU-friendly primitive (no scatter, no global cumsum).
    Invalid slots sort to the tail as INT32_MAX; within a row the kept
    entries come out ascending (their order is irrelevant: every
    consumer sums over the row).

    ``offset``: emit the row SEGMENT [offset, offset+cap) of the sorted
    survivors instead of the head -- the space-slice analogue of the
    reference's LEN_TASK task-buffer flushing (2_Redundant/src/
    fmm.c:921,377-418): rows wider than any affordable static cap are
    processed in fixed-size passes, each pass bounded to (R, cap).  The
    overflow flag then means "entries remain beyond this segment", i.e.
    another pass is needed, not an error.
    """
    big = jnp.iinfo(jnp.int32).max
    keyed = jnp.where(mask, vals.astype(jnp.int32), big)
    packed = lax.sort(keyed, dimension=1)[:, offset:offset + cap]
    packed = jnp.where(packed == big, -1, packed)
    counts = jnp.sum(mask, axis=1)
    return (packed, jnp.sum(counts).astype(jnp.int32),
            jnp.any(counts > offset + cap))


def p2p_segment_table(leaf_cand, leaf_mask, p2p_cap: int, segment: int):
    """Emit the ``segment``-th p2p_cap-wide slice of the cached leaf-level
    candidate rows -- WITHOUT re-running the traversal.

    The segmented multi-pass originally re-walked the whole tree per pass
    (only the final slice differs); the walk dominates the passes
    (hybrid_extreme.json: 6.6 s of re-walks vs 2-4 s of kernels, VERDICT
    r4 weak-4).  Callers instead request ``return_leaf_cand=True`` from
    one traversal and slice the cached rows here: each extra pass is one
    batched sort-compact.  Returns (table (nleaf, p2p_cap), count,
    more_beyond) -- ``more_beyond`` True means another segment remains
    (the LEN_TASK flush-loop continuation condition,
    2_Redundant/src/fmm.c:921,377-418).  The table is always padded to
    exactly (nleaf, p2p_cap) with -1: a final segment narrower than the
    cap would otherwise hand every consumer a ragged width and one
    recompile per segment (ADVICE round 4)."""
    tbl, cnt, more = _row_compact(leaf_cand, leaf_mask, p2p_cap,
                                  offset=p2p_cap * segment)
    if tbl.shape[1] < p2p_cap:
        tbl = jnp.pad(tbl, ((0, 0), (0, p2p_cap - tbl.shape[1])),
                      constant_values=-1)
    return tbl, cnt, more


@partial(jax.jit, static_argnames=("theta", "cutoff", "boxsize",
                                   "open_cap", "m2l_cap", "p2p_cap",
                                   "adjacency_eps", "open_caps",
                                   "quant_bounds", "p2p_segment",
                                   "return_leaf_cand"))
def dual_tree_traversal(tree: Tree, theta: float,
                        cutoff: Optional[float] = None,
                        boxsize: Optional[float] = None,
                        open_cap: int = 256, m2l_cap: int = 128,
                        p2p_cap: int = 192,
                        adjacency_eps: float = 1e-4,
                        open_caps: Optional[Tuple[int, ...]] = None,
                        quant_bounds: Optional[Tuple[float, float]] = None,
                        p2p_segment: int = 0,
                        return_leaf_cand: bool = False,
                        ) -> InteractionLists:
    """Build per-node M2L tables (per level) and the per-leaf P2P table.

    open_cap / m2l_cap / p2p_cap are strict per-target-node capacities.
    open_caps optionally overrides open_cap per level (see
    :func:`taper_open_caps`); quant_bounds (lo, hi) switches the MAC
    geometry to the packed u16 fixed-point source gathers
    (:func:`pack_node_geometry`); p2p_segment selects the s-th
    p2p_cap-wide slice of each leaf's neighbor row for bounded-memory
    multi-pass processing of extreme clustering (see _row_compact).

    SEGMENT VALIDITY: only the ``p2p`` table varies with p2p_segment --
    the M2L tables and internal frontiers are identical every pass, so a
    consumer summing FULL engine outputs across segments would
    double-count the far field.  Sum only the per-segment P2P kernel
    results (ops.fmm_engine.p2p_stage), or use return_leaf_cand +
    :func:`p2p_segment_table` to slice segments without re-walking.
    """
    return dual_tree_traversal_pair(
        tree.centers, tree.widths, tree.counts,
        tree.centers, tree.widths, tree.counts,
        theta=theta, cutoff=cutoff, boxsize=boxsize, open_cap=open_cap,
        m2l_cap=m2l_cap, p2p_cap=p2p_cap, adjacency_eps=adjacency_eps,
        open_caps=open_caps, quant_bounds=quant_bounds,
        p2p_segment=p2p_segment, return_leaf_cand=return_leaf_cand)


def dual_tree_traversal_pair(centers_t, widths_t, counts_t,
                             centers_s, widths_s, counts_s,
                             theta: float,
                             cutoff: Optional[float] = None,
                             boxsize: Optional[float] = None,
                             open_cap: int = 256, m2l_cap: int = 128,
                             p2p_cap: int = 192,
                             adjacency_eps: float = 1e-4,
                             leaf_unresolved: str = "p2p",
                             source_zone=None,
                             open_caps: Optional[Tuple[int, ...]] = None,
                             quant_bounds: Optional[Tuple[float, float]]
                             = None,
                             p2p_segment: int = 0,
                             return_leaf_cand: bool = False
                             ) -> InteractionLists:
    """Two-tree traversal: targets from tree T, sources from tree S (same
    balanced layout).  For S == T this is the local walk; with S = a remote
    shard's gathered tree metadata it is the cross-shard far-field pass
    (the reference's fmm_remote_task, remotes.c:670-738).

    leaf_unresolved: what to do with pairs still open at the leaf level --
    'p2p' emits them as near-field tasks (local walk; remote walk with
    ghost bodies available), 'm2l' force-accepts them as multipole
    interactions (pure far-field pass; the caller guarantees ghost bodies
    cover everything nearer than its acceptance horizon).

    source_zone: optional tuple over depths 0..D of (2^d,) bool masks
    marking source nodes inside the caller's ghost zone (their bodies were
    shipped as ghosts and are already in the near-field tree).  Zone nodes
    are opened until the leaf level, where they are DISCARDED -- the exact
    leaf-aligned complement of the ghost exchange (the reference's
    prepare_sendtree2 MAC-pruned send-trees serve the same role,
    remotes.c:337-446).
    """
    depth = len(centers_t) - 1
    overflow = jnp.asarray(False)
    overflow_bits = jnp.zeros((), jnp.int32)
    m2l_tables = []
    m2l_counts = []

    if quant_bounds is not None:
        qlo, qhi = quant_bounds
        grid = (qhi - qlo) / QMAX
        packed_s = pack_node_geometry(centers_s, widths_s, counts_s,
                                      qlo, qhi)

    if depth == 0:
        # single-leaf tree: the (root, root) pair is one P2P task
        nonempty = (counts_t[0][0] > 0) & (counts_s[0][0] > 0)
        p2p = jnp.where(nonempty, jnp.zeros((1, 1), jnp.int32), -1)
        lists = InteractionLists(m2l=(), m2l_counts=(), p2p=p2p,
                                 p2p_count=nonempty.astype(jnp.int32),
                                 overflow=overflow)
        if return_leaf_cand:
            return lists, (jnp.zeros((1, 1), jnp.int32),
                           nonempty.reshape(1, 1))
        return lists

    open_src = jnp.zeros((1, 1), jnp.int32)     # root target: source root

    for d in range(depth):
        n_t = 2 ** (d + 1)
        # target children inherit the children of the parent's open sources
        parent_open = jnp.repeat(open_src, 2, axis=0)        # (n_t, K)
        alive = parent_open >= 0
        left = jnp.where(alive, parent_open * 2, -1)
        right = jnp.where(alive, parent_open * 2 + 1, -1)
        cand = jnp.concatenate([left, right], axis=1)        # (n_t, 2K)
        valid = cand >= 0
        safe = jnp.maximum(cand, 0)

        w_ts = tuple(widths_t[d + 1][:, None, ax] for ax in range(3))
        if quant_bounds is None:
            # per-axis 2-D gathers (see acceptance_flags_axes: a fused
            # (n_t, K, 3) gather can be tile-padded 42x on TPU)
            dists = tuple(
                _min_image(centers_t[d + 1][:, None, ax]
                           - centers_s[d + 1][:, ax][safe], boxsize)
                for ax in range(3))
            w_ss = tuple(widths_s[d + 1][:, ax][safe] for ax in range(3))
            flags = acceptance_flags_axes(
                dists, w_ts, w_ss,
                counts_t[d + 1][:, None], counts_s[d + 1][safe],
                theta, cutoff, adjacency_eps)
        else:
            # packed fixed-point source gathers: 3 u32 words instead of
            # 7 f32/i32 arrays (gathers, not the sort, dominate the deep
            # levels -- artifacts/traversal_profile_256.json)
            dt = centers_t[d + 1].dtype
            ga, gb, gc = (w[safe] for w in packed_s[d + 1])
            cqs = (_unpack_u16(ga, 0), _unpack_u16(ga, 1),
                   _unpack_u16(gb, 0))
            wxs, wys, wzs = (_unpack_u16(gb, 1), _unpack_u16(gc, 0),
                             _unpack_u16(gc, 1))
            empty_s = wxs == QMAX
            dists = tuple(
                _min_image(centers_t[d + 1][:, None, ax]
                           - (qlo + q.astype(dt) * dt.type(grid)), boxsize)
                for ax, q in enumerate(cqs))
            w_ss = tuple(jnp.where(empty_s, 0, q).astype(dt) * dt.type(grid)
                         for q in (wxs, wys, wzs))
            # conservative slack for the <= 0.5-grid center rounding: the
            # discard horizon moves out 3 grid units and the accept theta
            # tightens 0.5%, so every quantized decision refines the
            # exact-MAC one (kept-too-long pairs only add erfc-damped
            # near-zero P2P terms)
            flags = acceptance_flags_axes(
                dists, w_ts, w_ss,
                counts_t[d + 1][:, None],
                jnp.where(empty_s, 0, 1),
                theta * (1.0 - 5e-3),
                None if cutoff is None else cutoff + 3.0 * grid,
                adjacency_eps)
        flags = jnp.where(valid, flags, -1)

        last = (d + 1 == depth)
        if source_zone is not None:
            zone = source_zone[d + 1][safe] & valid
            # ghost-zone sources: open until the leaf level, then discard
            # (their bodies are served by the leaf-aligned ghost exchange).
            # Pairs already discarded for an empty TARGET node stay dead --
            # re-opening them would re-expand dead pairs through every
            # level and waste open_cap frontier slots on sparse shards.
            flags = jnp.where(zone & (counts_s[d + 1][safe] > 0)
                              & (counts_t[d + 1][:, None] > 0),
                              -1 if last else 0, flags)
        accept = flags == 1
        if last and leaf_unresolved == "m2l":
            accept = flags >= 0                     # force-accept leftovers

        kcand = cand.shape[1]
        cap_d = min(kcand, m2l_cap)
        # the compaction sort only runs on levels that accepted anything:
        # in the uniform TreePM regime the MAC accept is geometrically
        # impossible at every level (BENCH_NOTES), and the m2l-side sort
        # was half the traversal's sort volume
        tbl, cnt, ovf = lax.cond(
            jnp.any(accept),
            lambda args: _row_compact(*args, cap_d),
            lambda args: (jnp.full((args[0].shape[0], cap_d), -1,
                                   jnp.int32),
                          jnp.zeros((), jnp.int32), jnp.asarray(False)),
            (cand, accept))
        m2l_tables.append(tbl)
        m2l_counts.append(cnt)
        overflow |= ovf
        overflow_bits |= jnp.where(ovf, OVF_M2L, 0)

        oc = open_cap if open_caps is None else open_caps[d]
        cap_open = min(kcand, p2p_cap if last else oc)
        # p2p_segment > 0: emit the s-th p2p_cap-wide SEGMENT of each
        # leaf row (bounded-memory multi-pass over extreme neighbor
        # counts; see _row_compact).  Internal frontiers are unaffected
        # -- only the emitted leaf table is sliced.
        off = p2p_cap * p2p_segment if last else 0
        if last and return_leaf_cand:
            leaf_cand = (cand, flags == 0)
        open_src, o_cnt, ovf = _row_compact(cand, flags == 0, cap_open,
                                            offset=off)
        if not (last and leaf_unresolved == "m2l"):
            overflow |= ovf
            overflow_bits |= jnp.where(ovf, OVF_P2P if last else OVF_OPEN, 0)

    if p2p_segment > 0 and open_src.shape[1] < p2p_cap:
        # a final segment can be narrower than p2p_cap (the row slice runs
        # off the candidate width): pad back to the cap so every consumer
        # sees ONE stable table shape across segments (ADVICE round 4)
        open_src = jnp.pad(
            open_src, ((0, 0), (0, p2p_cap - open_src.shape[1])),
            constant_values=-1)
    lists = InteractionLists(m2l=tuple(m2l_tables),
                             m2l_counts=tuple(m2l_counts),
                             p2p=open_src, p2p_count=o_cnt,
                             overflow=overflow, overflow_bits=overflow_bits)
    if return_leaf_cand:
        # the raw leaf-level candidate rows + survivor mask: segments
        # beyond the emitted one come from p2p_segment_table without
        # another walk (VERDICT r4 weak-4)
        return lists, leaf_cand
    return lists
