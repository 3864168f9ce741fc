"""Particle-Mesh Poisson solver (the PM long-range half of TreePM).

Pipeline per step (partmesh.c:800-1579 / conv.f90:141-250, re-done as a
single fused XLA computation on the global periodic mesh):

  density  = CIC paint * (N_side/L)^3                 (partmesh.c:954)
  phi      = irfftn( rfftn(density) * G(k) )
  G(k)     = (L^2/pi) * exp(-k2 * (2 pi r_s / L)^2) * sinc^-4 / k2
             with k2 = l^2+m^2+n^2 (integer), DC kept constant
             (conv.f90:183-233; the reference folds the unnormalized-FFT
             1/N^3 into its prefactor L^2/(pi N^3) -- numpy's normalized
             irfftn absorbs it, leaving L^2/pi)
  acc_pm   = CIC readout of the 4th-order central-difference gradient
             +grad(phi)  (partmesh.c:1256-1550; f1=4/3, f2=1/6)

Sign convention: phi = +sum m/r, acc = +grad(phi) (matches FMM/L2P and the
P2P kernel; G is applied at kick time, photoNs.c:161).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from photons_tpu.pm.mesh import cic_paint, cic_read_vector


def green_function(n_side: int, boxsize: float, split_radius: float,
                   deconvolve: bool = True, dtype=jnp.float32):
    """Gravity Green's function on the rfftn frequency grid (n, n, n//2+1).

    ``deconvolve=False`` reproduces ``conv_pmonly`` (conv.f90:36-139):
    no Gaussian smoothing, no CIC deconvolution -- the pure 1/k^2 kernel.
    """
    l_full = np.fft.fftfreq(n_side, d=1.0 / n_side)         # signed ints
    l_half = np.arange(n_side // 2 + 1)
    lx = l_full[:, None, None]
    ly = l_full[None, :, None]
    lz = l_half[None, None, :]
    k2 = lx**2 + ly**2 + lz**2

    pref = boxsize**2 / np.pi
    with np.errstate(divide="ignore", invalid="ignore"):
        gf = pref / k2
        if deconvolve:
            ismth2 = (2.0 * np.pi * split_radius / boxsize) ** 2
            sinc = lambda l: np.sinc(l / n_side)             # sin(pi x)/(pi x)
            ff = 1.0 / (sinc(lx) * sinc(ly) * sinc(lz))
            gf = gf * np.exp(-k2 * ismth2) * ff**4
    gf[0, 0, 0] = pref  # DC kept finite (conv.f90:226-228); gradient kills it
    return jnp.asarray(gf, dtype)


def pm_potential(density, gf):
    """FFT convolution of the density mesh with the Green's function."""
    n = density.shape[0]
    dk = jnp.fft.rfftn(density)
    return jnp.fft.irfftn(dk * gf, s=(n, n, n)).astype(density.dtype)


def gradient_4th(phi, boxsize: float):
    """4th-order central-difference gradient of a periodic mesh -> (n,n,n,3).

    dp = [4/3 (phi_{+1}-phi_{-1}) - 1/6 (phi_{+2}-phi_{-2})] / (2 delta)
    (partmesh.c:1318-1383 with invx = 0.5 N/L).
    """
    n = phi.shape[0]
    inv2d = 0.5 * n / boxsize
    f1, f2 = 4.0 / 3.0, 1.0 / 6.0

    def d(axis):
        return (f1 * (jnp.roll(phi, -1, axis) - jnp.roll(phi, 1, axis))
                - f2 * (jnp.roll(phi, -2, axis) - jnp.roll(phi, 2, axis))) * inv2d

    return jnp.stack([d(0), d(1), d(2)], axis=-1)


def spectral_gradient(phi_k, boxsize: float, n_side: int, dtype):
    """Exact ik differentiation in Fourier space -> (n,n,n,3) real field.

    More accurate than the reference's 4th-order stencil (removes the
    D(k) = [8 sin(k d) - sin(2k d)]/(6d) != k differencing error) and maps
    to pure batched FFTs on TPU instead of 12 rolled adds.
    """
    l_full = jnp.fft.fftfreq(n_side, d=1.0 / n_side)
    l_half = jnp.arange(n_side // 2 + 1, dtype=phi_k.real.dtype)
    kf = 2.0 * jnp.pi / boxsize
    shape3 = (n_side, n_side, n_side)

    def d(kvec_axis):
        return jnp.fft.irfftn(1j * kf * kvec_axis * phi_k, s=shape3).astype(dtype)

    gx = d(l_full[:, None, None])
    gy = d(l_full[None, :, None])
    gz = d(l_half[None, None, :])
    return jnp.stack([gx, gy, gz], axis=-1)


@partial(jax.jit, static_argnames=("boxsize", "n_side", "mass", "gradient"))
def pm_accel(pos, gf, mass: float, boxsize: float, n_side: int,
             gradient: str = "fd4"):
    """Full PM step: positions -> long-range acceleration (N, 3).

    gradient='fd4' (default) is the reference's real-space 4th-order stencil
    (partmesh.c:1256-1550); its differencing error acts as a grid-scale
    low-pass that empirically suppresses CIC aliasing slightly better than
    exact-ik 'spectral' differentiation, and costs 12 rolls instead of 3
    extra inverse FFTs.
    """
    dens = cic_paint(pos, boxsize, n_side) * (
        mass * (n_side / boxsize) ** 3)
    if gradient == "spectral":
        phi_k = jnp.fft.rfftn(dens) * gf
        grad = spectral_gradient(phi_k, boxsize, n_side, dens.dtype)
    else:
        phi = pm_potential(dens, gf)
        grad = gradient_4th(phi, boxsize)
    return cic_read_vector(grad, pos, boxsize, n_side)


@partial(jax.jit, static_argnames=("boxsize", "n_side", "mass", "gradient",
                                   "leaf_size", "tile", "interpret"))
def pm_accel_pallas(pos, gf, mass: float, boxsize: float, n_side: int,
                    gradient: str = "fd4", leaf_size: int = 256,
                    tile: int = 32, interpret=None):
    """PM step with the Pallas leaf-tiled CIC kernels (pm/cic_pallas.py).

    XLA scatter (paint) and row gather (readout) dominate the PM phase at
    scale (1.5 s + 2.7 s of a 4.1 s PM at 256^3 on a v5e); the kernels
    replace both with per-leaf VMEM brick DMAs + one MXU matmul each.

    Returns (acc (N, 3), fits_all bool).  ``fits_all`` is False when some
    leaf's CIC footprint exceeds the ``tile`` brick (handle like any
    capacity overflow: enlarge cic_tile and recompile).
    """
    from photons_tpu.pm.cic_pallas import (brick_origins, effective_tile,
                                           fold_halos, pad_periodic,
                                           paint_leaves, read_leaves)
    from photons_tpu.tree.morton import morton_sort

    tile = effective_tile(n_side, tile)

    n = pos.shape[0]
    n_leaf = max(1, -(-n // leaf_size))
    n_leaf = 1 << (n_leaf - 1).bit_length()
    n_pad = n_leaf * leaf_size - n
    sorted_pos, perm = morton_sort(pos, 0.0, boxsize, n_pad)
    # padding slots sorted to the tail carry perm >= n
    valid = (perm < n).reshape(n_leaf, leaf_size)
    leaf_pos = sorted_pos.reshape(n_leaf, leaf_size, 3)

    origins, fits = brick_origins(leaf_pos, valid, n_side, tile, boxsize)
    wts = jnp.where(valid & fits[:, None], 1.0, 0.0).astype(pos.dtype)

    padded = paint_leaves(leaf_pos, wts, origins, n_side, tile, boxsize,
                          interpret=interpret)
    dens = fold_halos(padded, n_side) * (mass * (n_side / boxsize) ** 3)

    if gradient == "spectral":
        phi_k = jnp.fft.rfftn(dens) * gf
        grad = spectral_gradient(phi_k, boxsize, n_side, dens.dtype)
    else:
        phi = pm_potential(dens, gf)
        grad = gradient_4th(phi, boxsize)

    fields = tuple(pad_periodic(grad[..., c], n_side) for c in range(3))
    vals = read_leaves(leaf_pos, fields, origins, n_side, tile, boxsize,
                       interpret=interpret)           # (nleaf, 3, S)
    flat = jnp.where(valid[:, None, :], vals, 0.0)
    flat = jnp.moveaxis(flat, 1, 2).reshape(-1, 3)    # leaf order (N', 3)
    acc = jnp.zeros((perm.shape[0], 3), pos.dtype).at[perm].set(flat)[:n]
    return acc, jnp.all(fits)
