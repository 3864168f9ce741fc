"""Flat LambdaCDM background cosmology and KDK integrator factors.

Physics spec from the reference (``1_Indexing/src/initial.c:629-692``):

- code-unit Hubble rate  H(a) = 0.1 * sqrt(Omega_m a^-3 + Omega_x)
  (0.1 = H0 in km/s/kpc times h; Gadget units kpc/h, km/s, 1e10 Msun/h);
- kick factor  = integral dt/a   = int d(ln a) / (a H(a))
- drift factor = integral dt/a^2 = int d(ln a) / (a^2 H(a))
  both evaluated with 128-interval composite Simpson in ln a, matching the
  reference's quadrature exactly (kick_loga/drift_loga, initial.c:648-692);
- closed forms a(t), t(a) for the flat LCDM background
  (a_flat_lcdm_t / t_flat_lcdm_a, initial.c:629-645).

Host-side scalar math is done in float64 numpy.  ``kick_factor_jnp`` /
``drift_factor_jnp`` provide traced equivalents for fully-jitted multi-step
scans.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

H0_CODE = 0.1  # H0 in code units (100 km/s/Mpc = 0.1 km/s/kpc, times h)

_N_SIMPSON = 128  # reference Nblock (initial.c:650)


def hubble(a, omega_m: float, omega_x: float):
    """H(a) in code units (initial.c:656: 0.1*sqrt(Om/a^3 + Ox))."""
    return H0_CODE * np.sqrt(omega_m / (np.asarray(a, np.float64) ** 3) + omega_x)


def _simpson_loga(f, loga_i: float, loga_f: float) -> float:
    """Composite Simpson with the reference's exact 128-interval scheme.

    Reference weights: ends 1, interior 2*(1+n%2) -> 4,2,4,...,4; sum*d/3.
    (kick_loga, initial.c:648-669.)
    """
    n = np.arange(_N_SIMPSON + 1)
    d = (loga_f - loga_i) / _N_SIMPSON
    w = np.where((n % 2) == 1, 4.0, 2.0)
    w[0] = w[-1] = 1.0
    x = loga_i + d * n
    return float(np.sum(w * f(x)) * d / 3.0)


def kick_factor(loga_i: float, loga_f: float, omega_m: float, omega_x: float) -> float:
    """integral of dt/a over [loga_i, loga_f] (initial.c:648-669)."""
    def integrand(loga):
        a = np.exp(loga)
        return 1.0 / (a * hubble(a, omega_m, omega_x))
    return _simpson_loga(integrand, loga_i, loga_f)


def drift_factor(loga_i: float, loga_f: float, omega_m: float, omega_x: float) -> float:
    """integral of dt/a^2 over [loga_i, loga_f] (initial.c:671-692)."""
    def integrand(loga):
        a = np.exp(loga)
        return 1.0 / (a * a * hubble(a, omega_m, omega_x))
    return _simpson_loga(integrand, loga_i, loga_f)


def a_flat_lcdm_t(t, omega_m: float, omega_x: float):
    """Scale factor a(t) for flat LCDM (initial.c:629-635)."""
    t_star = 3.0 * np.sqrt(omega_x) / 20.0
    kern = np.sinh(t_star * np.asarray(t, np.float64))
    return (kern * kern * omega_m / omega_x) ** (1.0 / 3.0)


def t_flat_lcdm_a(a, omega_m: float, omega_x: float):
    """Cosmic time t(a) for flat LCDM (initial.c:637-645)."""
    t_star = 3.0 * np.sqrt(omega_x) / 20.0
    a3 = np.asarray(a, np.float64) ** 3
    f = omega_x / omega_m
    return np.log(np.sqrt(f * a3) + np.sqrt(1.0 + f * a3)) / t_star


# ---------------------------------------------------------------------------
# Traced (jnp) versions, same quadrature, for in-jit multi-step scans.
# ---------------------------------------------------------------------------

def _simpson_loga_jnp(f, loga_i, loga_f):
    n = jnp.arange(_N_SIMPSON + 1)
    d = (loga_f - loga_i) / _N_SIMPSON
    w = jnp.where((n % 2) == 1, 4.0, 2.0)
    w = w.at[0].set(1.0).at[-1].set(1.0)
    x = loga_i + d * n
    return jnp.sum(w * f(x)) * d / 3.0


def kick_factor_jnp(loga_i, loga_f, omega_m, omega_x):
    def integrand(loga):
        a = jnp.exp(loga)
        h = H0_CODE * jnp.sqrt(omega_m / a**3 + omega_x)
        return 1.0 / (a * h)
    return _simpson_loga_jnp(integrand, loga_i, loga_f)


def drift_factor_jnp(loga_i, loga_f, omega_m, omega_x):
    def integrand(loga):
        a = jnp.exp(loga)
        h = H0_CODE * jnp.sqrt(omega_m / a**3 + omega_x)
        return 1.0 / (a * a * h)
    return _simpson_loga_jnp(integrand, loga_i, loga_f)


def growth_factor(a, omega_m: float, omega_x: float, normalize_at: float = 1.0):
    """Linear growing-mode D(a) for flat LCDM: D ~ H(a) int_0^a da'/(a'H')^3.

    Not present in the reference (its ICs come from external files); needed
    for the Zel'dovich IC generator and linear-growth validation tests.
    """
    from scipy.integrate import quad

    def unnorm(a_val):
        h = float(hubble(a_val, omega_m, omega_x))
        integral, _ = quad(
            lambda ap: (ap * float(hubble(ap, omega_m, omega_x))) ** -3,
            0.0, a_val, epsabs=1e-12, epsrel=1e-10)
        return h * integral

    a_arr = np.atleast_1d(np.asarray(a, np.float64))
    d = np.array([unnorm(av) for av in a_arr]) / unnorm(normalize_at)
    return d if np.ndim(a) else float(d[0])


def step_factors(a_init: float, a_final: float, n_steps: int,
                 omega_m: float, omega_x: float):
    """Per-step (kick, drift) factors for the whole run.

    The driver steps uniformly in ln a (photoNs.c:52,146-161); forces are
    kicked with dkh = 0.5*dk*G at both step boundaries (photoNs.c:170-187,
    280-291).  Returns float64 arrays of shape (n_steps,).
    """
    loga = np.log(a_init) + (np.log(a_final) - np.log(a_init)) / n_steps * np.arange(n_steps + 1)
    dk = np.array([kick_factor(loga[i], loga[i + 1], omega_m, omega_x)
                   for i in range(n_steps)])
    dd = np.array([drift_factor(loga[i], loga[i + 1], omega_m, omega_x)
                   for i in range(n_steps)])
    return dk, dd
