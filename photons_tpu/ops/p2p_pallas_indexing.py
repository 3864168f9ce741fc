"""'Indexing' P2P layout: in-kernel gather through the neighbor table.

TPU re-creation of ``ComputeP2PIndexing``
(``1_Indexing/src/photoNs_CUDA.cu:250-387``): particle data lives ONCE in
HBM; each kernel program walks its target leaf's neighbor list and gathers
source blocks through the index at compute time -- **no data duplication**
(the memory-redundancy-free side of the arXiv:2403.01596 tradeoff).

Scalability note: the neighbor table is O(total tasks) and therefore kept
in HBM, NOT scalar-prefetched (SMEM is ~1 MB; a 256^3 run's table is tens
of MB -- and even the per-row COUNTS vector alone overflows SMEM at
sub-leaf refinement row counts, so the count is embedded as element 0 of
each row instead of prefetched).  Each program first DMAs its own table
row HBM -> SMEM scratch, then runs a double-buffered gather loop of
combined [x | y | z | m] rows (HBM -> VMEM, one 512-byte aligned DMA per
neighbor leaf), computing the (S x S) interaction tile while the next
block is in flight.

Data layout: ``combined`` (n_leaf, W) float rows with W = ceil(4*S/128)*128
-- x in [0,S), y in [S,2S), z in [2S,3S), mass in [3S,4S), zero padding to
the lane boundary.  Row slices of a 2-D array are the supported
HBM-DMA-granule pattern (3-D sub-lane slices are not lowerable).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _row_width(s: int) -> int:
    return -(-4 * s // LANES) * LANES


def pack_combined_rows(planes, masses):
    """(nleaf, 3, S) + (nleaf, S) -> (nleaf, W) [x|y|z|m] rows.

    Concatenates per-axis slices instead of reshaping the planes block:
    ``planes`` is usually a lazy transpose of the tree's (nleaf, S, 3)
    layout, and reshape(n_leaf, 3*s) forces XLA to materialize the whole
    transposed copy first -- a 1.5 GB HLO temp at a 2^20-leaf 512^3 tree
    (measured compile OOM).  Per-axis slices fuse the strided reads into
    the concatenate's write."""
    n_leaf, _, s = planes.shape
    w = _row_width(s)
    flat = jnp.concatenate([planes[:, 0, :], planes[:, 1, :],
                            planes[:, 2, :], masses], axis=1)
    return jnp.pad(flat, ((0, 0), (0, w - 4 * s)))


def _indexing_kernel(tgt_ref, table_hbm, combined_hbm, out_ref,
                     row_smem, src_buf, sems, tsem, *,
                     eps, rs, boxsize, s, s_src, pair_tile,
                     k_cap=0, quad=None):
    i = pl.program_id(0)
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)  # (1, 1, W)

    # own neighbor-table row page (1, 1+K[+K]): HBM -> SMEM.  Element 0
    # is the row's partner count (embedded, not scalar-prefetched: the
    # counts vector alone is rows*4 bytes -- over the 1 MB SMEM budget at
    # refined-row counts), entries follow from element 1; in quad mode
    # the per-entry sub-tile masks follow at [1+k_cap, 1+2*k_cap).
    trow = pltpu.make_async_copy(table_hbm.at[i], row_smem, tsem)
    trow.start()
    trow.wait()
    count = row_smem[0, 0]

    def fetch(slot, k):
        return pltpu.make_async_copy(
            combined_hbm.at[row_smem[0, 1 + k]], src_buf.at[slot],
            sems.at[slot])

    @pl.when(count > 0)
    def _():
        fetch(0, 0).start()
        tx = tgt_ref[0, 0, 0:s]
        ty = tgt_ref[0, 0, s:2 * s]
        tz = tgt_ref[0, 0, 2 * s:3 * s]
        ss = s_src

        if quad is not None:
            # masked sub-tile mode: ONE source DMA per leaf pair, but the
            # (s, ss) tile is evaluated as ft x fs blocks, each gated on
            # its cull-mask bit (tight-AABB out-of-cutoff blocks skipped)
            ft, fs = quad
            st, sb = s // ft, ss // fs

            def body(k, carry):
                slot = k % 2

                @pl.when(k + 1 < count)
                def _():
                    fetch((k + 1) % 2, k + 1).start()

                fetch(slot, k).wait()
                m = row_smem[0, 1 + k_cap + k]
                for ti in range(ft):
                    t0 = ti * st
                    for sj in range(fs):
                        @pl.when((m >> (ti * fs + sj)) & 1 != 0)
                        def _(t0=t0, sj=sj):
                            ax, ay, az = pair_tile(
                                tx[t0:t0 + st], ty[t0:t0 + st],
                                tz[t0:t0 + st],
                                src_buf[slot, 0, sj * sb:(sj + 1) * sb],
                                src_buf[slot, 0, ss + sj * sb:
                                        ss + (sj + 1) * sb],
                                src_buf[slot, 0, 2 * ss + sj * sb:
                                        2 * ss + (sj + 1) * sb],
                                src_buf[slot, 0, 3 * ss + sj * sb:
                                        3 * ss + (sj + 1) * sb],
                                eps, rs, boxsize)
                            out_ref[0, 0, t0:t0 + st] += ax
                            out_ref[0, 0, s + t0:s + t0 + st] += ay
                            out_ref[0, 0, 2 * s + t0:2 * s + t0 + st] += az
                return carry

            jax.lax.fori_loop(0, count, body, 0)
            return

        def body(k, acc):
            slot = k % 2

            @pl.when(k + 1 < count)
            def _():
                fetch((k + 1) % 2, k + 1).start()

            fetch(slot, k).wait()
            ax, ay, az = pair_tile(
                tx, ty, tz,
                src_buf[slot, 0, 0:ss], src_buf[slot, 0, ss:2 * ss],
                src_buf[slot, 0, 2 * ss:3 * ss],
                src_buf[slot, 0, 3 * ss:4 * ss],
                eps, rs, boxsize)
            return (acc[0] + ax, acc[1] + ay, acc[2] + az)

        zero = jnp.zeros((s,), tgt_ref.dtype)
        acc = jax.lax.fori_loop(0, count, body, (zero, zero, zero))
        out_ref[0, 0, 0:s] = acc[0]
        out_ref[0, 0, s:2 * s] = acc[1]
        out_ref[0, 0, 2 * s:3 * s] = acc[2]


def p2p_indexing_rows(combined, table, s: int, *, eps: float,
                      rs: Optional[float], boxsize: Optional[float],
                      pair_tile, interpret: bool, combined_src=None,
                      s_src: Optional[int] = None, masks=None,
                      quad: Optional[tuple] = None):
    """Run the indexing kernel; returns acc rows (nleaf, W) [ax|ay|az|0].

    ``combined_src``/``s_src``: optional separate source-row array with a
    different block width (sub-leaf refinement, ``refine_table``); the
    table then indexes rows of ``combined_src``.  Default: sources are the
    target rows themselves (classic full-leaf indexing layout).

    ``masks``/``quad``: per-entry sub-tile cull masks (``quad_masks``) --
    the (s, s_src) tile is evaluated as quad=(ft, fs) blocks, each gated
    on its mask bit.
    """
    n_leaf, w = combined.shape
    if combined_src is None:
        combined_src, s_src = combined, s
    w_src = combined_src.shape[1]
    counts = jnp.sum(table >= 0, axis=1).astype(jnp.int32)
    safe_table = jnp.where(table >= 0, table, 0).astype(jnp.int32)
    # row layout [count | entries [| masks] | 0-pad] to the SMEM granule
    k_cap = table.shape[1]
    parts = [counts[:, None], safe_table]
    if quad is not None:
        parts.append(masks.astype(jnp.int32))
    aug = jnp.concatenate(parts, axis=1)
    k_row = -(-aug.shape[1] // LANES) * LANES
    if k_row != aug.shape[1]:
        aug = jnp.pad(aug, ((0, 0), (0, k_row - aug.shape[1])))

    kernel = partial(_indexing_kernel, eps=eps, rs=rs, boxsize=boxsize,
                     s=s, s_src=s_src, pair_tile=pair_tile,
                     k_cap=k_cap, quad=quad)
    out = pl.pallas_call(
        kernel,
        grid=(n_leaf,),
        in_specs=[
            # rows wrapped as (nleaf, 1, W) pages: (1, 1, W) blocks satisfy
            # the (sublane, lane) tiling rule via dim equality
            pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # neighbor table
            pl.BlockSpec(memory_space=pltpu.HBM),  # combined source rows
        ],
        out_specs=pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((1, k_row), jnp.int32),     # own table-row page
            pltpu.VMEM((2, 1, w_src), combined_src.dtype),  # dbl-buffered src
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((n_leaf, 1, w), combined.dtype),
        interpret=interpret,
    )(combined[:, None, :], aug[:, None, :], combined_src[:, None, :])
    return out[:, 0, :]
