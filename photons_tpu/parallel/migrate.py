"""Capacity-padded particle migration between spatial shards.

TPU-native equivalent of the reference's particle exchange
(prepare_deliver_realloc_body, domains.c:298-377): the recursive in-place
quickselect + MPI_Alltoallv becomes one masked pack + ``lax.all_to_all``
with fixed per-destination capacity (the ragged-to-fixed trick from MoE
dispatch, SURVEY.md section 5.8), followed by a validity-sorted compaction
back into the shard's capacity.

Overflow (send capacity or shard capacity exceeded) is surfaced as a flag;
the caller enlarges capacities and recompiles (the reference instead
reallocs, domains.c:366-375).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def migrate(arrays, valid, bounds, send_cap: int, axis: str, coord: int = 0):
    """Route particles to the shard owning their slab along ``coord``.

    arrays: tuple of (cap, k) row-aligned arrays (pos, vel, ...); routing is
    by arrays[0][:, coord].  bounds: replicated (D+1,).
    Returns (new_arrays, new_valid, overflow).
    """
    d = lax.axis_size(axis)
    me = lax.axis_index(axis)
    cap = valid.shape[0]
    x = arrays[0][:, coord]

    dest = jnp.searchsorted(bounds[1:d], x, side="right").astype(jnp.int32)
    dest = jnp.where(valid, dest, me)
    stay = valid & (dest == me)
    move = valid & (dest != me)

    # pack movers into (D, send_cap, ...) buffers grouped by destination
    key = jnp.where(move, dest, d)
    order = jnp.argsort(key, stable=True)
    key_s = key[order]
    slot = jnp.arange(cap) - jnp.searchsorted(key_s, key_s, side="left")
    dst_rows = jnp.where((key_s < d) & (slot < send_cap),
                         key_s * send_cap + slot, d * send_cap)
    overflow = jnp.any((key_s < d) & (slot >= send_cap))

    sent = []
    for a in arrays:
        buf = jnp.zeros((d * send_cap, a.shape[1]), a.dtype)
        buf = buf.at[dst_rows].set(a[order], mode="drop")
        sent.append(buf.reshape(d, send_cap, a.shape[1]))
    vbuf = jnp.zeros((d * send_cap,), bool).at[dst_rows].set(
        move[order], mode="drop").reshape(d, send_cap)

    # exchange: received[j] = what shard j sent to me
    recv = [lax.all_to_all(b, axis, split_axis=0, concat_axis=0, tiled=True)
            for b in sent]
    rval = lax.all_to_all(vbuf, axis, split_axis=0, concat_axis=0, tiled=True)

    # merge keepers + arrivals, compact valid-first back into capacity
    merged_valid = jnp.concatenate([stay, rval.reshape(-1)])
    merged = [jnp.concatenate([a, r.reshape(-1, a.shape[1])])
              for a, r in zip(arrays, recv)]
    order2 = jnp.argsort(~merged_valid, stable=True)[:cap]
    new_valid = merged_valid[order2]
    new_arrays = tuple(a[order2] for a in merged)
    overflow |= jnp.sum(merged_valid) > cap
    return new_arrays, new_valid, overflow


def migrate_2d(arrays, valid, xbounds, ybounds, send_cap: int,
               ax: str, ay: str):
    """Route particles to the brick owning their (x, y) cell: two staged
    1-D exchanges (x columns first, then y within the column) -- the
    standard 2-D grid factorization of the reference's Alltoallv
    (domains.c:298-377)."""
    arrays, valid, ovf_x = migrate(arrays, valid, xbounds, send_cap, ax,
                                   coord=0)
    arrays, valid, ovf_y = migrate(arrays, valid, ybounds, send_cap, ay,
                                   coord=1)
    return arrays, valid, ovf_x | ovf_y
