"""FMM operator unit tests: P2M/M2M/M2L/L2L/L2P against direct summation on
random clusters (SURVEY.md section 4, rebuild test 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from photons_tpu.ops import multipoles as mp
from photons_tpu.ops.kernels import pair_accel, short_range_factor


def _clusters(seed=0, n=24, sep=10.0, size=1.0):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-size, size, (n, 3)) + np.array([sep, 0.0, 0.0])
    tgt = rng.uniform(-size, size, (n, 3))
    return jnp.asarray(tgt), jnp.asarray(src)


def _direct(tgt, src, mass, rs=None):
    dx = src[None, :, :] - tgt[:, None, :]
    r2 = jnp.sum(dx * dx, axis=-1)
    return jnp.sum(pair_accel(dx, r2, mass, eps=1e-12, split_radius=rs), axis=1)


def test_p2m_monopole_dipole():
    src = jnp.array([[1.0, 0.0, 0.0], [3.0, 0.0, 0.0]])
    m = jnp.array([2.0, 4.0])
    center = jnp.array([2.0, 0.0, 0.0])
    M = mp.p2m(src - center, m)
    assert float(M[mp.I0]) == pytest.approx(6.0)
    # dipole = -sum m dx = -(2*(-1) + 4*(1)) = -2
    assert float(M[mp.IX]) == pytest.approx(-2.0)
    assert float(M[mp.IY]) == pytest.approx(0.0)
    # quadrupole = +sum m dx^2/2 = (2+4)/2 = 3
    assert float(M[mp.IXX]) == pytest.approx(3.0)
    # octupole = -sum m dx^3/6 = -(2*(-1)+4*1)/6 = -1/3
    assert float(M[mp.IXXX]) == pytest.approx(-1.0 / 3.0)


def test_m2m_exact_shift():
    """p2m about child center then m2m to parent == p2m about parent."""
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1, 1, (10, 3)))
    m = jnp.asarray(rng.uniform(0.5, 2.0, (10,)))
    c_child = jnp.array([0.2, -0.1, 0.3])
    c_parent = jnp.array([-0.5, 0.4, 0.1])
    m_child = mp.p2m(pts - c_child, m)
    shifted = mp.m2m(m_child, c_parent - c_child)
    direct = mp.p2m(pts - c_parent, m)
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(direct),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("rs", [None, 4.0])
def test_m2l_l2p_vs_direct(rs):
    tgt, src = _clusters(sep=24.0, size=1.0)
    m = jnp.full((src.shape[0],), 1.7)
    c_s = src.mean(axis=0)
    c_t = tgt.mean(axis=0)
    M = mp.p2m(src - c_s, m)
    L = mp.m2l(M, c_t - c_s, split_radius=rs)
    acc = mp.l2p(L, tgt - c_t)
    ref = _direct(tgt, src, 1.7, rs)
    # Newtonian truncation ~ (combined size/sep)^4 = (3.4/24)^4 ~ 4e-4.
    # For the screened kernel the Gaussian terms grow like (size*r/2rs^2)^4,
    # so normalize by the *undamped* force scale -- the total-force scale a
    # real simulation sees (the erfc damping makes the absolute contribution
    # of such pairs tiny; the solver also force-opens pairs beyond the
    # cutoff, fmm.c:306-311, which bounds this regime).
    scale = float(jnp.abs(_direct(tgt, src, 1.7, None)).max())
    np.testing.assert_allclose(np.asarray(acc) / scale, np.asarray(ref) / scale,
                               atol=6e-4)


def test_l2l_exact_shift():
    """m2l to parent + l2l to child == m2l directly to child (polynomial
    shift of a cubic is exact)."""
    _, src = _clusters(sep=15.0)
    m = jnp.full((src.shape[0],), 1.0)
    c_s = src.mean(axis=0)
    c_parent = jnp.array([0.0, 0.0, 0.0])
    c_child = jnp.array([0.4, -0.3, 0.2])
    M = mp.p2m(src - c_s, m)
    l_via_parent = mp.l2l(mp.m2l(M, c_parent - c_s), c_child - c_parent)

    # direct-to-child L differs beyond octupole truncation; compare the
    # *evaluated field* at points near the child center instead
    pts = c_child + jnp.asarray(np.random.default_rng(2).uniform(-0.2, 0.2, (8, 3)))
    acc_via = mp.l2p(l_via_parent, pts - c_child)
    acc_direct = _direct(pts, src, 1.0)
    scale = float(jnp.abs(acc_direct).max())
    np.testing.assert_allclose(np.asarray(acc_via) / scale,
                               np.asarray(acc_direct) / scale, atol=5e-4)


def test_m2l_convergence_with_separation():
    errs = []
    for sep in (6.0, 12.0, 24.0):
        tgt, src = _clusters(seed=3, sep=sep, size=1.0)
        m = jnp.full((src.shape[0],), 1.0)
        c_s, c_t = src.mean(0), tgt.mean(0)
        acc = mp.l2p(mp.m2l(mp.p2m(src - c_s, m), c_t - c_s), tgt - c_t)
        ref = _direct(tgt, src, 1.0)
        errs.append(float(jnp.abs(acc - ref).max() / jnp.abs(ref).max()))
    # octupole truncation: ~16x per doubling in theory; max-norm is noisy,
    # require at least 4x
    assert errs[1] < errs[0] / 4
    assert errs[2] < errs[1] / 4


def test_radial_factors_match_newtonian_limit():
    """Screened t_n -> Newtonian t_n as rs -> inf."""
    r2 = jnp.asarray([4.0, 9.0, 25.0])
    newton = mp.radial_factors(r2, None, n_max=4)
    screened = mp.radial_factors(r2, 1e8, n_max=4)
    for tn, ts in zip(newton, screened):
        np.testing.assert_allclose(np.asarray(ts), np.asarray(tn), rtol=1e-6)


def test_derivative_tensor_gradient_consistency():
    """D_{e_i} must be the numerical gradient of D_0 = g(r)."""
    d = jnp.array([3.0, -2.0, 1.5])
    rs = 2.0
    h = 1e-6

    def g(dd):
        return float(mp.radial_factors(jnp.sum(dd * dd), rs, n_max=0)[0])

    dn = np.asarray(mp.derivative_tensor(d, jnp.sum(d * d), rs))
    for ax, idx in ((0, mp.IX), (1, mp.IY), (2, mp.IZ)):
        e = np.zeros(3); e[ax] = h
        num = (g(d + e) - g(d - e)) / (2 * h)
        assert dn[idx] == pytest.approx(num, rel=1e-5)


def test_l2p_potential_vs_direct():
    tgt, src = _clusters(seed=4, sep=14.0)
    m = jnp.full((src.shape[0],), 1.0)
    c_s, c_t = src.mean(0), tgt.mean(0)
    L = mp.m2l(mp.p2m(src - c_s, m), c_t - c_s)
    pot = mp.l2p_potential(L, tgt - c_t)
    dx = src[None] - tgt[:, None]
    ref = jnp.sum(1.0 / jnp.sqrt(jnp.sum(dx * dx, -1)), axis=1)
    np.testing.assert_allclose(np.asarray(pot), np.asarray(ref), rtol=1e-4)
