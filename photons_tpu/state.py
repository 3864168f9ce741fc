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
               with_ids: bool = False) -> SimState:
    """Build a fresh SimState with zeroed accelerations."""
    pos = jnp.asarray(pos, dtype)
    vel = jnp.asarray(vel, dtype)
    return SimState(
        pos=pos,
        vel=vel,
        acc=jnp.zeros_like(pos),
        acc_pm=jnp.zeros_like(pos),
        a=jnp.asarray(a, dtype),
        ids=jnp.arange(pos.shape[0], dtype=jnp.int32) if with_ids else None,
    )


def wrap_periodic(pos: jax.Array, boxsize: float) -> jax.Array:
    """Map positions into [0, boxsize) (photoNs.c:190-208)."""
    return jnp.mod(pos, boxsize)
