"""Reference force oracles: O(N^2) direct summation and Ewald sums.

These are the ground truth every solver component is validated against
(SURVEY.md section 4: the reference ships no tests; the rebuild's test
pyramid is anchored on these oracles).

- ``direct_forces``: all-pairs softened Newtonian sum, optional Ewald
  short-range damping, optional periodic image sum.  Memory-blocked so it
  scales to ~1e5 particles on one chip.
- ``ewald_forces``: exact periodic force via classic Ewald splitting
  (real-space erfc images + k-space Gaussian sum).  float64 numpy; the
  oracle for FMM+PM *total* forces in a periodic box.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from photons_tpu.ops.kernels import pair_accel


@partial(jax.jit, static_argnames=("split_radius", "eps", "boxsize", "n_images",
                                   "mass", "block"))
def direct_forces(pos, mass: float, eps: float, split_radius=None,
                  boxsize=None, n_images: int = 0, block: int = 1024):
    """Direct-sum acceleration on every particle (no G factor, as in the
    reference: G enters at kick time via dkh = 0.5*dk*G, photoNs.c:161).

    boxsize/n_images: if given, sum over periodic images with integer shifts
    in [-n_images, n_images]^3 (the short-range analogue of the reference's
    26-image pass, fmm.c:1083-1106).
    """
    n = pos.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    pos_p = jnp.pad(pos, ((0, pad), (0, 0)))
    mass_s = jnp.where(jnp.arange(nb * block) < n, mass, 0.0).astype(pos.dtype)

    if boxsize is None:
        shifts = jnp.zeros((1, 3), pos.dtype)
    else:
        r = jnp.arange(-n_images, n_images + 1, dtype=pos.dtype) * boxsize
        sx, sy, sz = jnp.meshgrid(r, r, r, indexing="ij")
        shifts = jnp.stack([sx.ravel(), sy.ravel(), sz.ravel()], axis=-1)

    def source_block(carry, j):
        acc = carry
        src = jax.lax.dynamic_slice_in_dim(pos_p, j * block, block)
        msk = jax.lax.dynamic_slice_in_dim(mass_s, j * block, block)

        def one_shift(acc, s):
            dx = (src[None, :, :] + s[None, None, :]) - pos_p[:, None, :]
            r2 = jnp.sum(dx * dx, axis=-1)
            return acc + jnp.sum(
                pair_accel(dx, r2, msk[None, :], eps, split_radius), axis=1), None

        acc, _ = jax.lax.scan(one_shift, acc, shifts)
        return acc, None

    acc0 = jnp.zeros_like(pos_p)
    acc, _ = jax.lax.scan(source_block, acc0, jnp.arange(nb))
    return acc[:n]


def ewald_forces(pos: np.ndarray, mass: float, boxsize: float,
                 split_radius: float, eps: float,
                 n_images: int = 3, k_max: int = 12, targets=None,
                 return_parts: bool = False) -> np.ndarray:
    """Exact periodic acceleration via Ewald summation (float64 numpy).

    Splits 1/r = erfc(r/2rs)/r + erf(r/2rs)/r; the erf part is summed in
    Fourier space with kernel (4 pi / (L^3 k^2)) exp(-k^2 rs^2) -- exactly
    the continuum limit of the reference PM Green's function
    (conv.f90:176-233 with ismth2 = (2 pi rs / L)^2).  The erfc part is
    summed in real space over images, with the reference's hard softening
    clamp applied at r < eps.

    ``targets``: optional index array -- compute forces only on these
    particles (every particle still sources).  Memory is O(T*N), letting
    the oracle sample flagship-scale (32^3+) configurations the full
    O(N^2) evaluation cannot hold.

    ``return_parts``: return (acc_total, acc_short, acc_long) so the
    solver's short-range (FMM) and long-range (PM) halves can be budgeted
    separately (the split-geometry accuracy sweep).

    Returns acc with the same convention as the solvers (acc = +grad phi,
    phi = +sum m/r; G applied at kick time).
    """
    from scipy.special import erfc as np_erfc

    pos = np.asarray(pos, np.float64)
    n = pos.shape[0]
    L = float(boxsize)
    rs = float(split_radius)
    tgt = (np.arange(n) if targets is None
           else np.asarray(targets, np.int64))
    pos_t = pos[tgt]
    t = pos_t.shape[0]

    # --- real-space erfc sum over images --------------------------------
    acc_short = np.zeros((t, 3))
    rng = np.arange(-n_images, n_images + 1, dtype=np.float64)
    sx, sy, sz = np.meshgrid(rng, rng, rng, indexing="ij")
    shifts = np.stack([sx.ravel(), sy.ravel(), sz.ravel()], axis=-1) * L  # (S,3)
    base = pos[None, :, :] - pos_t[:, None, :]                           # (T,N,3)
    for shift in shifts:
        dx = base + shift[None, None, :]
        r2 = np.einsum("ijd,ijd->ij", dx, dx)
        r = np.sqrt(r2)
        x = 0.5 * r / rs
        g = np_erfc(x) + (r / rs) / np.sqrt(np.pi) * np.exp(-x * x)
        r_soft = np.maximum(r, eps)
        f = np.where(r2 > 0, mass * g / r_soft**3, 0.0)
        acc_short += np.einsum("ij,ijd->id", f, dx)

    # --- k-space Gaussian sum --------------------------------------------
    ls = np.arange(-k_max, k_max + 1)
    lx, ly, lz = np.meshgrid(ls, ls, ls, indexing="ij")
    lsq = lx**2 + ly**2 + lz**2
    sel = (lsq > 0) & (lsq <= k_max**2)
    kvec = (2.0 * np.pi / L) * np.stack(
        [lx[sel], ly[sel], lz[sel]], axis=-1)          # (K, 3)
    k2 = np.sum(kvec * kvec, axis=-1)                   # (K,)
    a_k = (4.0 * np.pi / (L**3 * k2)) * np.exp(-k2 * rs * rs)

    # rho_k = sum_s m exp(-i k.x_s); acc(x) = Re[ sum_k A_k rho_k (ik) e^{ikx} ]
    # chunked over k so the (N, K) phase matrices stay bounded at large N
    acc_long = np.zeros((t, 3))
    kchunk = max(1, int(2e8 // max(n, 1)))
    for k0 in range(0, kvec.shape[0], kchunk):
        kv = kvec[k0:k0 + kchunk]
        phase_s = np.exp(-1j * pos @ kv.T)              # (N, Kc)
        rho_k = mass * np.sum(phase_s, axis=0)          # (Kc,)
        phase_t = np.exp(1j * pos_t @ kv.T)             # (T, Kc)
        coeff = a_k[k0:k0 + kchunk] * rho_k             # (Kc,)
        acc_long += np.real(phase_t * coeff[None, :] * 1j) @ kv
    if return_parts:
        return acc_short + acc_long, acc_short, acc_long
    return acc_short + acc_long
