"""Run diagnostics: matter power spectrum and load-imbalance metric.

``power_spectrum`` fills the reference's vestigial ``powerspectrum()``
declaration (inc/partmesh.h:13-16) -- needed for the z=0 P(k) parity check
in BASELINE.md.  ``imbalance`` reproduces the reference's metric
1 - sum(T)/(P*max(T)) (photoNs.c:297-312).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from photons_tpu.pm.mesh import cic_paint


def power_spectrum(pos, boxsize: float, n_side: int, n_bins: int = 0,
                   deconvolve: bool = True):
    """Matter P(k) from a CIC-painted density mesh.

    Returns (k_centers, pk, n_modes) with k in 2*pi/boxsize units converted
    to physical 1/length.  CIC window deconvolved by default.
    """
    n = pos.shape[0]
    mesh = np.asarray(cic_paint(jnp.asarray(pos), boxsize, n_side))
    mean = n / n_side**3
    delta = mesh / mean - 1.0

    dk = np.fft.rfftn(delta)
    l_full = np.fft.fftfreq(n_side, d=1.0 / n_side)
    l_half = np.arange(n_side // 2 + 1)
    lx = l_full[:, None, None]
    ly = l_full[None, :, None]
    lz = l_half[None, None, :]
    if deconvolve:
        sinc = lambda l: np.sinc(l / n_side)
        win = (sinc(lx) * sinc(ly) * sinc(lz)) ** 2
        dk = dk / win
    kmag = np.sqrt(lx**2 + ly**2 + lz**2)

    # hermitian weights: count rfft modes once, interior kz twice
    w = np.full(dk.shape, 2.0)
    w[:, :, 0] = 1.0
    if n_side % 2 == 0:
        w[:, :, -1] = 1.0

    power = np.abs(dk) ** 2 * boxsize**3 / n_side**6

    if n_bins <= 0:
        n_bins = n_side // 2
    edges = np.linspace(0.5, n_side // 2 + 0.5, n_bins + 1)
    which = np.digitize(kmag.ravel(), edges) - 1
    valid = (which >= 0) & (which < n_bins) & (kmag.ravel() > 0)
    wv = w.ravel()[valid]
    pk_sum = np.bincount(which[valid], weights=(power.ravel() * w.ravel())[valid],
                         minlength=n_bins)
    k_sum = np.bincount(which[valid], weights=(kmag.ravel() * w.ravel())[valid],
                        minlength=n_bins)
    n_modes = np.bincount(which[valid], weights=wv, minlength=n_bins)
    good = n_modes > 0
    kf = 2.0 * np.pi / boxsize
    return (k_sum[good] / n_modes[good] * kf,
            pk_sum[good] / n_modes[good],
            n_modes[good])


def imbalance(per_shard_cost) -> float:
    """Load imbalance 1 - mean/max over shards (photoNs.c:297-312)."""
    c = np.asarray(per_shard_cost, np.float64)
    m = c.max()
    if m <= 0:
        return 0.0
    return float(1.0 - c.sum() / (c.size * m))
