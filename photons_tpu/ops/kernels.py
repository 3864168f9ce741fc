"""Shared pairwise force math (the physics spec of every P2P path).

Pair acceleration on a target at x_t from a source (mass m) at x_s:

    acc += m * (x_s - x_t) / max(r, eps)^3 * g(r)

with the Ewald short-range damping

    g(r) = erfc(r / (2 r_s)) + r/(sqrt(pi) r_s) * exp(-r^2 / (4 r_s^2))

matching the M2L fac[1] factor (operator.c:296-302: facErc + dr*facExp*irs
with facExp = exp(-(r/2rs)^2)/sqrt(pi)).  The reference GPU kernels omit
g(r) entirely (SURVEY.md quirk 2.6-2, Makefile:40-42); we apply it so the
P2P force complements the PM Gaussian filter exp(-k^2 r_s^2) (conv.f90:224)
correctly.

Softening is the reference's hard clamp r < eps -> 1/eps^3
(photoNs_CUDA.cu:346-351), not Plummer.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erfc

_INV_SQRT_PI = 0.5641895835477563  # 1/sqrt(pi)


def min_image(d, boxsize=None):
    """Minimum-image displacement (single source of truth for the periodic
    convention; the Pallas kernels inline the same formula per axis)."""
    if boxsize is None:
        return d
    return d - boxsize * jnp.round(d / boxsize)


def short_range_factor(r, split_radius):
    """Ewald damping g(r); g(0)=1, g(inf)=0."""
    x = 0.5 * r / split_radius
    return erfc(x) + (r / split_radius) * _INV_SQRT_PI * jnp.exp(-x * x)


def pair_accel(dx, r2, mass, eps, split_radius=None):
    """Acceleration contribution of one source; dx = x_s - x_t (toward source).

    dx:   (..., 3) separation vectors
    r2:   (...,)   squared distances (passed in so callers can mask)
    mass: scalar or (...,) source masses (zero for padding)
    Returns (..., 3).  Zero-distance pairs (self) contribute zero.
    """
    r = jnp.sqrt(r2)
    r_soft = jnp.maximum(r, eps)
    inv_r3 = 1.0 / (r_soft * r_soft * r_soft)
    if split_radius is not None:
        inv_r3 = inv_r3 * short_range_factor(r, split_radius)
    f = jnp.where(r2 > 0, mass * inv_r3, 0.0)
    return dx * f[..., None]
