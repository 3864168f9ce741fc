"""Cosmology unit tests: Simpson kick/drift vs adaptive quadrature, and the
flat-LCDM closed forms (reference spec: initial.c:629-692)."""

import numpy as np
import pytest
from scipy.integrate import quad

from photons_tpu import cosmology


OM, OX = 0.25, 0.75


def test_hubble_today():
    assert cosmology.hubble(1.0, OM, OX) == pytest.approx(0.1)


def test_a_t_inverse():
    for a in [0.02, 0.1, 0.5, 1.0]:
        t = cosmology.t_flat_lcdm_a(a, OM, OX)
        assert cosmology.a_flat_lcdm_t(t, OM, OX) == pytest.approx(a, rel=1e-10)


@pytest.mark.parametrize("ai,af", [(0.02, 0.0204), (0.5, 0.52), (0.9, 1.0)])
def test_kick_drift_vs_quad(ai, af):
    loga_i, loga_f = np.log(ai), np.log(af)

    def kick_integrand(loga):
        a = np.exp(loga)
        return 1.0 / (a * cosmology.hubble(a, OM, OX))

    def drift_integrand(loga):
        a = np.exp(loga)
        return 1.0 / (a * a * cosmology.hubble(a, OM, OX))

    dk_ref, _ = quad(kick_integrand, loga_i, loga_f, epsabs=1e-14, epsrel=1e-12)
    dd_ref, _ = quad(drift_integrand, loga_i, loga_f, epsabs=1e-14, epsrel=1e-12)

    assert cosmology.kick_factor(loga_i, loga_f, OM, OX) == pytest.approx(dk_ref, rel=1e-8)
    assert cosmology.drift_factor(loga_i, loga_f, OM, OX) == pytest.approx(dd_ref, rel=1e-8)


def test_jnp_matches_numpy():
    loga_i, loga_f = np.log(0.02), np.log(0.03)
    dk = float(cosmology.kick_factor_jnp(loga_i, loga_f, OM, OX))
    dd = float(cosmology.drift_factor_jnp(loga_i, loga_f, OM, OX))
    assert dk == pytest.approx(cosmology.kick_factor(loga_i, loga_f, OM, OX), rel=1e-12)
    assert dd == pytest.approx(cosmology.drift_factor(loga_i, loga_f, OM, OX), rel=1e-12)


def test_step_factors_shape_and_sign():
    dk, dd = cosmology.step_factors(0.02, 1.0, 10, OM, OX)
    assert dk.shape == (10,) and dd.shape == (10,)
    assert np.all(dk > 0) and np.all(dd > 0)
    # drift = int dt/a^2 > kick = int dt/a for a < 1
    assert np.all(dd > dk)
