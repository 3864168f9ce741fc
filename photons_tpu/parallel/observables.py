"""Sharded observables: matter power spectrum where the particles live.

The host :func:`photons_tpu.diagnostics.power_spectrum` gathers every
particle to one process -- fine for analysis boxes, impossible at
production scale.  This module computes the same binned P(k) fully
sharded: brick-local CIC paint (pm.brick), the forward half of the 2-D
pencil FFT (parallel.fft), |delta_k|^2 binned per shard over its own
k-slice, and one psum.  It fills the reference's vestigial
``powerspectrum()`` declaration (inc/partmesh.h:13-16) at scale.

Runs inside ``shard_map`` over the (x, y) process grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pencil_delta_k(brick, ax: str, ay: str):
    """Forward half of the pencil transform: density brick
    (nx_loc, ny_loc, n) -> x-pencil spectrum (n, n//dx, nh_pad//dy).

    Mirrors parallel.fft.pencil_poisson_2d's forward path exactly."""
    dx = lax.axis_size(ax)
    dy = lax.axis_size(ay)
    nx_loc, ny_loc, n = brick.shape
    nh = n // 2 + 1
    nh_pad = -(-nh // dy) * dy
    nh_loc = nh_pad // dy
    ny2 = n // dx

    def fft_axis(v, axis):
        v = jnp.moveaxis(v, axis, -1)
        v = jnp.fft.fft(v, axis=-1)
        return jnp.moveaxis(v, -1, axis)

    fk = jnp.fft.rfft(brick, axis=2)
    fk = jnp.pad(fk, ((0, 0), (0, 0), (0, nh_pad - nh)))
    fk = fk.reshape(nx_loc, ny_loc, dy, nh_loc)
    fk = lax.all_to_all(fk, ay, split_axis=2, concat_axis=1, tiled=False)
    fk = fk.reshape(nx_loc, n, nh_loc)
    fk = fft_axis(fk, 1)
    fk = fk.reshape(nx_loc, dx, ny2, nh_loc)
    fk = lax.all_to_all(fk, ax, split_axis=1, concat_axis=0, tiled=False)
    fk = fk.reshape(n, ny2, nh_loc)
    return fft_axis(fk, 0)


def pencil_power_spectrum(delta_brick, n_side: int, n_bins: int,
                          ax: str, ay: str, deconvolve: bool = True):
    """Binned |delta_k|^2 from a brick-sharded density contrast.

    Returns replicated (k_sum, pk_sum, n_modes) of length n_bins in
    grid-frequency units (k index); the caller applies 2*pi/L and the
    boxsize^3/n^6 power normalization.  Semantics match
    diagnostics.power_spectrum bin for bin (hermitian double-count
    weights, CIC window deconvolution, kmag > 0)."""
    n = n_side
    dk = pencil_delta_k(delta_brick, ax, ay)          # (n, ny2, nh_loc)
    _, ny2, nh_loc = dk.shape
    nh = n // 2 + 1
    ix = lax.axis_index(ax)
    iy = lax.axis_index(ay)

    l_full = jnp.fft.fftfreq(n, d=1.0 / n)            # signed ints
    lx = l_full[:, None, None]
    ly = lax.dynamic_slice(l_full, (ix * ny2,), (ny2,))[None, :, None]
    lz = (iy * nh_loc + jnp.arange(nh_loc))[None, None, :]

    if deconvolve:
        sinc = lambda l: jnp.sinc(l / n)
        dk = dk / (sinc(lx) * sinc(ly) * sinc(1.0 * lz)) ** 2

    kmag = jnp.sqrt(lx**2 + ly**2 + 1.0 * lz**2)
    w = jnp.full(dk.shape, 2.0)
    w = jnp.where(lz == 0, 1.0, w)
    if n % 2 == 0:
        w = jnp.where(lz == n // 2, 1.0, w)
    w = jnp.where(lz >= nh, 0.0, w)                   # rfft zero-padding
    w = jnp.where(kmag > 0, w, 0.0)

    power = (dk.real**2 + dk.imag**2)

    edges = jnp.linspace(0.5, n // 2 + 0.5, n_bins + 1)
    which = jnp.digitize(kmag.ravel(), edges) - 1
    inb = (which >= 0) & (which < n_bins)
    seg = jnp.where(inb, which, n_bins)
    wf = jnp.where(inb, w.ravel(), 0.0)
    pk_sum = jax.ops.segment_sum(power.ravel() * wf, seg,
                                 num_segments=n_bins + 1)[:n_bins]
    k_sum = jax.ops.segment_sum(kmag.ravel() * wf, seg,
                                num_segments=n_bins + 1)[:n_bins]
    n_modes = jax.ops.segment_sum(wf, seg, num_segments=n_bins + 1)[:n_bins]
    axes = (ax, ay)
    return (lax.psum(k_sum, axes), lax.psum(pk_sum, axes),
            lax.psum(n_modes, axes))
