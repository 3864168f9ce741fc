"""Direct-sum oracle tests: two-body forces, softening clamp, Ewald-split
consistency, and Ewald-oracle internal convergence."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import erf

from photons_tpu.ops.direct import direct_forces, ewald_forces
from photons_tpu.ops.kernels import short_range_factor


def test_two_body_newtonian():
    pos = jnp.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]], jnp.float64)
    acc = direct_forces(pos, mass=2.0, eps=1e-3)
    # acc on particle 0 points toward particle 1 with magnitude m/r^2
    np.testing.assert_allclose(np.asarray(acc[0]), [2.0 / 9.0, 0, 0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(acc[1]), [-2.0 / 9.0, 0, 0], rtol=1e-12)


def test_softening_clamp():
    # r < eps -> factor m/eps^3 (photoNs_CUDA.cu:346-351)
    eps = 1.0
    pos = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]], jnp.float64)
    acc = direct_forces(pos, mass=1.0, eps=eps)
    np.testing.assert_allclose(np.asarray(acc[0]), [0.5 / eps**3, 0, 0], rtol=1e-12)


def test_short_plus_long_equals_newtonian():
    """g(r)/r^2 + d/dr[erf part] = 1/r^2: the split must be exact."""
    rs = 2.0
    r = np.linspace(0.5, 20.0, 64)
    g_short = np.asarray(short_range_factor(jnp.asarray(r), rs))
    # long-range force factor: -d/dr [erf(r/2rs)/r] * r^2... total factor:
    # F_long/ (m/r^2) = erf(r/2rs) - r/(rs sqrt(pi)) exp(-r^2/4rs^2)
    g_long = erf(0.5 * r / rs) - (r / rs) / np.sqrt(np.pi) * np.exp(-(0.5 * r / rs) ** 2)
    np.testing.assert_allclose(g_short + g_long, 1.0, atol=1e-13)


def test_direct_blocking_invariance():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, 10, (100, 3)))
    a1 = direct_forces(pos, mass=1.0, eps=0.01, block=32)
    a2 = direct_forces(pos, mass=1.0, eps=0.01, block=128)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-12)


def test_ewald_split_independence():
    """The Ewald oracle must give the same total force for different split
    radii -- validates both the real- and k-space pieces."""
    rng = np.random.default_rng(1)
    L = 10.0
    pos = rng.uniform(0, L, (8, 3))
    a1 = ewald_forces(pos, mass=1.0, boxsize=L, split_radius=0.8, eps=1e-4,
                      n_images=4, k_max=14)
    a2 = ewald_forces(pos, mass=1.0, boxsize=L, split_radius=1.2, eps=1e-4,
                      n_images=3, k_max=18)
    scale = np.abs(a1).max()
    np.testing.assert_allclose(a1 / scale, a2 / scale, atol=5e-8)


def test_ewald_momentum_conservation():
    rng = np.random.default_rng(2)
    L = 10.0
    pos = rng.uniform(0, L, (12, 3))
    acc = ewald_forces(pos, mass=1.3, boxsize=L, split_radius=1.0, eps=1e-4)
    np.testing.assert_allclose(acc.sum(axis=0), 0.0, atol=1e-9)


def test_direct_images_match_ewald_short():
    """direct_forces with damping + images == the real-space half of Ewald."""
    rng = np.random.default_rng(3)
    L, rs = 10.0, 0.7
    pos = rng.uniform(0, L, (6, 3))
    acc_short = direct_forces(jnp.asarray(pos), mass=1.0, eps=1e-4,
                              split_radius=rs, boxsize=L, n_images=2)
    # Ewald real-space part alone (k_max=0 disables the k sum)
    acc_real = ewald_forces(pos, mass=1.0, boxsize=L, split_radius=rs,
                            eps=1e-4, n_images=2, k_max=0)
    np.testing.assert_allclose(np.asarray(acc_short), acc_real, rtol=1e-9, atol=1e-12)
