"""Cartesian Taylor FMM operators, octupole order (NMULTI = 20).

Math spec: ``1_Indexing/src/operator.c`` + ``inc/operator.h:24-167``.
Conventions (verified against the reference algebra):

- multipoles   M_b = (-1)^|b| sum_p m_p dx_p^b / b!        (p2m, operator.c:13-93)
- M2M shift    M'_a = sum_{b<=a} M_b d^{a-b}/(a-b)!,  d = c_parent - c_child
               (operator.c:96-160)
- M2L          L_a += sum_b M_b D_{a+b},  |a+b| <= 3,  d = c_target - c_source,
               D_g = raw derivative tensor of the (screened) kernel g(r)
               (operator.c:255-392)
- L2L shift    L'_a = sum_k L_{a+k} d^k/k!,  d = c_child - c_parent
               (operator.c:395-494)
- L2P          pot = sum_a L_a dx^a/a!;  acc_i = sum_k L_{e_i+k} dx^k/k!
               with dx = x - c_leaf; acc accumulates +grad(phi)
               (operator.c:197-251)

Radial derivative factors t_n = ((1/r) d/dr)^n g(r):

- Newtonian  g = 1/r:          t_n = (-1)^n (2n-1)!! / r^(2n+1)
- Ewald split g = erfc(r/2rs)/r (-DLONGSHORT, operator.c:294-306):
      t_n = (-1)^n (2n-1)!! erfc(u)/r^(2n+1) + c e^{-u^2} * P_n
  with u = r/2rs, c = 1/(sqrt(pi) rs); P_n from the recursion
  t_{n+1} = (1/r) dt_n/dr (coefficients below reproduce the reference's
  fac[0..4] exactly, including fac[4]'s unsimplified 7.5+10 and 1.25+0.5).

Everything is written for arbitrary leading batch dimensions: M/L arrays are
(..., 20), displacement d is (..., 3).  This is the TPU-native form of the
reference's per-node scalar loops: one fused VPU polynomial evaluation over
thousands of nodes/pairs at once.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erfc

NMULTI = 20

# multi-index exponent table, reference ordering (inc/operator.h:24-60)
EXPONENTS = np.array([
    (0, 0, 0),
    (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1), (0, 0, 2),
    (3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1), (1, 0, 2),
    (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3),
], dtype=np.int32)

ORDER = EXPONENTS.sum(axis=1)                       # |a| per index
_FACT = np.array([math.factorial(int(e[0])) * math.factorial(int(e[1]))
                  * math.factorial(int(e[2])) for e in EXPONENTS], np.float64)
_SIGN = np.where(ORDER % 2 == 1, -1.0, 1.0)

_INDEX_OF = {tuple(e): i for i, e in enumerate(EXPONENTS)}

# index aliases
I0, IX, IY, IZ = 0, 1, 2, 3
IXX, IXY, IXZ, IYY, IYZ, IZZ = 4, 5, 6, 7, 8, 9
(IXXX, IXXY, IXXZ, IXYY, IXYZ, IXZZ,
 IYYY, IYYZ, IYZZ, IZZZ) = range(10, 20)


@lru_cache(None)
def _shift_triples():
    """All (a, b, k) with E_a = E_b + E_k: the shared M2M/L2L/L2P table."""
    out = []
    for a in range(NMULTI):
        for b in range(NMULTI):
            diff = EXPONENTS[a] - EXPONENTS[b]
            if (diff >= 0).all():
                out.append((a, b, _INDEX_OF[tuple(diff)]))
    return np.array(out, np.int32)


@lru_cache(None)
def _m2l_pairs():
    """All (a, b, g) with E_g = E_a + E_b and |g| <= 3 (octupole trunc)."""
    out = []
    for a in range(NMULTI):
        for b in range(NMULTI):
            tot = EXPONENTS[a] + EXPONENTS[b]
            if tot.sum() <= 3:
                out.append((a, b, _INDEX_OF[tuple(tot)]))
    return np.array(out, np.int32)


def monomials(d):
    """Normalized monomials d^a / a! for all 20 indices; d (..., 3)."""
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    pw = [
        jnp.ones_like(dx),
        dx, dy, dz,
        dx * dx / 2, dx * dy, dx * dz, dy * dy / 2, dy * dz, dz * dz / 2,
        dx * dx * dx / 6, dx * dx * dy / 2, dx * dx * dz / 2,
        dx * dy * dy / 2, dx * dy * dz, dx * dz * dz / 2,
        dy * dy * dy / 6, dy * dy * dz / 2, dy * dz * dz / 2,
        dz * dz * dz / 6,
    ]
    return jnp.stack(pw, axis=-1)


def p2m(dx, mass):
    """Particle-to-multipole.  dx (..., P, 3) offsets from the expansion
    center, mass (..., P) (zero for padding).  Returns (..., 20)."""
    mono = monomials(dx)                            # (..., P, 20)
    sign = jnp.asarray(_SIGN, mono.dtype)
    return jnp.sum(mass[..., None] * sign * mono, axis=-2)


def m2m(m_child, d):
    """Shift child multipoles to the parent center; d = c_parent - c_child."""
    tri = _shift_triples()
    mono = monomials(d)                             # (..., 20)
    contrib = m_child[..., tri[:, 1]] * mono[..., tri[:, 2]]
    out = jnp.zeros(contrib.shape[:-1] + (NMULTI,), contrib.dtype)
    return out.at[..., tri[:, 0]].add(contrib)


def l2l(l_parent, d):
    """Shift parent local expansion to a child center; d = c_child - c_parent."""
    tri = _shift_triples()
    mono = monomials(d)
    contrib = l_parent[..., tri[:, 0]] * mono[..., tri[:, 2]]
    out = jnp.zeros(contrib.shape[:-1] + (NMULTI,), contrib.dtype)
    return out.at[..., tri[:, 1]].add(contrib)


def l2p(l_leaf, dx):
    """Evaluate the local expansion: acceleration (+grad phi) at particles.

    l_leaf (..., 20); dx (..., P, 3) particle offsets from the leaf center.
    Returns acc (..., P, 3).
    """
    mono = monomials(dx)                            # (..., P, 20)
    tri = _shift_triples()
    l_exp = l_leaf[..., None, :]

    def component(axis_idx):
        sel = tri[tri[:, 1] == axis_idx]            # E_a = e_axis + E_k
        return jnp.sum(l_exp[..., sel[:, 0]] * mono[..., sel[:, 2]], axis=-1)

    return jnp.stack([component(IX), component(IY), component(IZ)], axis=-1)


def l2p_potential(l_leaf, dx):
    """phi at particle offsets (the commented-out acc[3] in operator.c:249)."""
    mono = monomials(dx)
    return jnp.sum(l_leaf[..., None, :] * mono, axis=-1)


# ---------------------------------------------------------------------------
# M2L: derivative tensors of the interaction kernel
# ---------------------------------------------------------------------------

_DOUBLE_FACT = np.array([1.0, 1.0, 3.0, 15.0, 105.0])   # (2n-1)!!
_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)


def radial_factors(r2, split_radius=None, n_max: int = 3):
    """t_n = ((1/r) d/dr)^n g(r) for n = 0..n_max; r2 (...,).

    Newtonian when split_radius is None, Ewald-screened otherwise
    (fac[0..4], operator.c:286-306).
    """
    r = jnp.sqrt(r2)
    ir2 = 1.0 / r2
    ir = jnp.sqrt(ir2)
    if split_radius is None:
        ts = []
        cur = ir
        for n in range(n_max + 1):
            ts.append(cur * ((-1.0) ** n * _DOUBLE_FACT[n]))
            cur = cur * ir2
        return ts

    rs = split_radius
    irs2 = 1.0 / (rs * rs)
    u = 0.5 * r / rs
    e = jnp.exp(-u * u)
    ec = erfc(u)
    c = _INV_SQRT_PI / rs                       # 1/(sqrt(pi) rs)
    ce = c * e

    ir4 = ir2 * ir2
    ir6 = ir4 * ir2
    ir8 = ir4 * ir4

    ts = [ec * ir]
    if n_max >= 1:
        ts.append(-(ec * ir * ir2 + ce * ir2))
    if n_max >= 2:
        ts.append(3.0 * ec * ir * ir4 + ce * (3.0 * ir4 + 0.5 * ir2 * irs2))
    if n_max >= 3:
        ts.append(-(15.0 * ec * ir * ir6
                    + ce * (15.0 * ir6 + 2.5 * ir4 * irs2
                            + 0.25 * ir2 * irs2 * irs2)))
    if n_max >= 4:
        ts.append(105.0 * ec * ir * ir8
                  + ce * (105.0 * ir8 + 17.5 * ir6 * irs2
                          + 1.75 * ir4 * irs2 * irs2
                          + 0.125 * ir2 * irs2 * irs2 * irs2))
    return ts


def derivative_tensor(d, r2, split_radius=None):
    """Raw derivative tensor D_g = d^g[ g(r) ] for |g| <= 3 -> (..., 20).

    (operator.c:309-356: Dn[] built from fac[0..3].)
    """
    t0, t1, t2, t3 = radial_factors(r2, split_radius, n_max=3)
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([
        t0,
        t1 * dx, t1 * dy, t1 * dz,
        t2 * dx * dx + t1, t2 * dx * dy, t2 * dx * dz,
        t2 * dy * dy + t1, t2 * dy * dz, t2 * dz * dz + t1,
        t3 * dx * dx * dx + 3 * t2 * dx,
        t3 * dx * dx * dy + t2 * dy,
        t3 * dx * dx * dz + t2 * dz,
        t3 * dx * dy * dy + t2 * dx,
        t3 * dx * dy * dz,
        t3 * dx * dz * dz + t2 * dx,
        t3 * dy * dy * dy + 3 * t2 * dy,
        t3 * dy * dy * dz + t2 * dz,
        t3 * dy * dz * dz + t2 * dy,
        t3 * dz * dz * dz + 3 * t2 * dz,
    ], axis=-1)


def m2l(m_source, d, split_radius=None):
    """Multipole-to-local: contribution to the target's L (..., 20).

    d = c_target - c_source (..., 3).  (m2l, operator.c:255-392; call-site
    direction fmm.c:920-943.)
    """
    r2 = jnp.sum(d * d, axis=-1)
    dn = derivative_tensor(d, r2, split_radius)
    pairs = _m2l_pairs()
    contrib = m_source[..., pairs[:, 1]] * dn[..., pairs[:, 2]]
    out = jnp.zeros(contrib.shape[:-1] + (NMULTI,), contrib.dtype)
    return out.at[..., pairs[:, 0]].add(contrib)
