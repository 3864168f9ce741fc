"""Simulation state pytree.

Replaces the reference's global ``Body *part`` AoS (typesdef.h:59-61,
photoNs.h:22-334) with a single functional pytree of SoA device arrays --
the natural layout for XLA and for ``jax.sharding`` over a device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Particle state; all arrays share leading dimension N (or [S, cap]).

    acc      -- short-range (FMM) acceleration, zeroed each step
                (part[].acc, photoNs.c:227-238)
    acc_pm   -- long-range (PM) acceleration (part[].acc_pm)
    a        -- current scale factor (scalar, traced)
    ids      -- optional particle identities (Gadget ID block); carried
                only by sorted-state runs, where the step reorders the
                arrays into space-filling-curve order every step
    """

    pos: jax.Array
    vel: jax.Array
    acc: jax.Array
    acc_pm: jax.Array
    a: jax.Array
    ids: Optional[jax.Array] = None

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    @property
    def dtype(self):
        return self.pos.dtype


def make_state(pos, vel, a: float, dtype=jnp.float32,
               with_ids: bool = False, defer_acc: bool = False) -> SimState:
    """Build a fresh SimState with zeroed accelerations.

    defer_acc: allocate the accelerations as (1, 3) broadcast placeholders
    instead of full (N, 3) zero buffers.  Semantically identical anywhere
    acc enters additively (every kick), and saves 2 * N * 3 * 4 bytes of
    HBM until the first force computation replaces them -- 3.2 GB at
    512^3, where the initial sorted force program otherwise runs with the
    dead zero buffers resident (measured runtime OOM, round 4)."""
    pos = jnp.asarray(pos, dtype)
    vel = jnp.asarray(vel, dtype)
    zeros = (jnp.zeros((1, pos.shape[-1]), dtype) if defer_acc
             else jnp.zeros_like(pos))
    return SimState(
        pos=pos,
        vel=vel,
        acc=zeros,
        acc_pm=zeros,
        a=jnp.asarray(a, dtype),
        ids=jnp.arange(pos.shape[0], dtype=jnp.int32) if with_ids else None,
    )


def wrap_periodic(pos: jax.Array, boxsize: float) -> jax.Array:
    """Map positions into [0, boxsize) (photoNs.c:190-208)."""
    return jnp.mod(pos, boxsize)
