"""Initial-condition generators.

- ``ic_uniform``: uniform random positions, zero velocities -- functional
  equivalent of the reference's ``ic_uniform`` (initial.c:567-627), which
  fills the box with ran3 uniforms and derives the particle mass from the
  matter density (initial.c:605-606).  We use a counter-based numpy RNG
  instead of Numerical-Recipes ran3 (utility.c:146-182); the reference's
  stream is an implementation detail, not physics.
- ``ic_zeldovich``: first-order Lagrangian (Zel'dovich) displacements from a
  power-law P(k), giving a physically sensible clustered IC for tests and
  benchmarks.  (The reference declares ic_lcdm0/1/2 generators but ships no
  implementation -- inc/icreater.h:8-14; this fills that gap.)
"""

from __future__ import annotations

import numpy as np

from photons_tpu.config import SimConfig


def ic_uniform(cfg: SimConfig, seed: int = 12345):
    """Uniform random positions in [0, L)^3, zero velocities."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0.0, cfg.boxsize, size=(cfg.n_part_total, 3))
    vel = np.zeros_like(pos)
    return pos, vel


def ic_grid(cfg: SimConfig):
    """Particles on a regular lattice (useful for force-error tests)."""
    n_side = round(cfg.n_part_total ** (1.0 / 3.0))
    if n_side**3 != cfg.n_part_total:
        raise ValueError("n_part_total must be a perfect cube for ic_grid")
    d = cfg.boxsize / n_side
    idx = np.arange(n_side)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    pos = (np.stack([x, y, z], axis=-1).reshape(-1, 3) + 0.5) * d
    return pos, np.zeros_like(pos)


def eisenstein_hu_pk(k, omega_m: float = 0.25, omega_b: float = 0.045,
                     hubble: float = 0.7, n_s: float = 0.96):
    """Linear LCDM P(k) shape from the Eisenstein & Hu (1998) zero-baryon
    transfer function (astro-ph/9709112, eqs. 26-31).  k in h/Mpc;
    unnormalized (the IC generator normalizes to a target amplitude).

    Fills the reference's vestigial ic_lcdm* surface (inc/icreater.h:8-14)
    with a physical LCDM spectrum instead of a power law.
    """
    k = np.asarray(k, np.float64)
    h = hubble
    theta = 2.728 / 2.7                      # CMB temperature ratio
    omh2 = omega_m * h * h
    obh2 = omega_b * h * h
    # sound horizon and shape-suppression (EH98 eqs. 26, 28, 30-31)
    s_horizon = 44.5 * np.log(9.83 / omh2) / np.sqrt(1 + 10 * obh2**0.75)
    alpha = (1 - 0.328 * np.log(431 * omh2) * omega_b / omega_m
             + 0.38 * np.log(22.3 * omh2) * (omega_b / omega_m) ** 2)
    gamma_eff = omega_m * h * (alpha + (1 - alpha)
                               / (1 + (0.43 * k * h * s_horizon) ** 4))
    q = k * theta * theta / gamma_eff
    l0 = np.log(2 * np.e + 1.8 * q)
    c0 = 14.2 + 731.0 / (1 + 62.5 * q)
    t_k = l0 / (l0 + c0 * q * q)
    return np.where(k > 0, k ** n_s * t_k * t_k, 0.0)


def ic_zeldovich(cfg: SimConfig, seed: int = 12345, spectral_index=-1.0,
                 amplitude: float = 0.05):
    """Zel'dovich displacements from a Gaussian random field.

    Displacement field psi(q) with psi(k) = i k/k^2 delta(k); particles
    start on the lattice displaced by psi, with the growing-mode velocity
    u = a^2 H(a) f(a) psi (f ~ Omega_m(a)^0.55).  ``amplitude`` sets the
    rms displacement in units of the interparticle spacing.

    spectral_index: a float for a power-law P(k) ~ k^n, or the string
    'lcdm' for the Eisenstein-Hu LCDM shape.
    """
    from photons_tpu import cosmology

    n_side = round(cfg.n_part_total ** (1.0 / 3.0))
    if n_side**3 != cfg.n_part_total:
        raise ValueError("n_part_total must be a perfect cube for ic_zeldovich")
    L = cfg.boxsize
    rng = np.random.default_rng(seed)

    k1 = 2.0 * np.pi / L * np.fft.fftfreq(n_side, d=1.0 / n_side)
    kx, ky, kz = np.meshgrid(k1, k1, k1[: n_side // 2 + 1], indexing="ij")
    k2 = kx**2 + ky**2 + kz**2
    k2[0, 0, 0] = 1.0

    # Gaussian delta(k), smoothed at the Nyquist
    kmag = np.sqrt(k2)
    if spectral_index == "lcdm":
        # kmag is in 1/(kpc/h); EH98 wants h/Mpc
        pk = eisenstein_hu_pk(kmag * 1000.0, cfg.omega_m,
                              hubble=cfg.hubble)
        pk[0, 0, 0] = 0.0
    else:
        pk = np.where(k2 > (2 * np.pi / L) ** 2 * 0.5,
                      kmag ** spectral_index, 0.0)
    pk *= np.exp(-k2 / (0.25 * (np.pi * n_side / L) ** 2))
    noise = rng.normal(size=k2.shape) + 1j * rng.normal(size=k2.shape)
    delta_k = noise * np.sqrt(pk / 2.0)

    psi = np.empty((n_side, n_side, n_side, 3))
    for d_ax, kc in enumerate((kx, ky, kz)):
        psi[..., d_ax] = np.fft.irfftn(1j * kc / k2 * delta_k, s=(n_side,) * 3,
                                       axes=(0, 1, 2))

    rms = np.sqrt(np.mean(np.sum(psi**2, axis=-1)))
    spacing = L / n_side
    # psi is the displacement field AT the initial time, normalized so its
    # rms equals `amplitude` interparticle spacings
    psi *= amplitude * spacing / max(rms, 1e-30)

    a0 = cfg.initial_scale_factor
    h_a = cosmology.hubble(a0, cfg.omega_m, cfg.omega_x)
    om_a = cfg.omega_m / (cfg.omega_m + cfg.omega_x * a0**3)
    growth_rate = om_a**0.55

    idx = np.arange(n_side)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    lattice = (np.stack([x, y, z], axis=-1) + 0.5) * spacing
    pos = np.mod(lattice + psi, L).reshape(-1, 3)
    # growing mode x(a) = q + [D(a)/D(a0)] psi: the internal velocity
    # (u = a^2 xdot = a v_pec; gdt2unit a^1.5 on Gadget's v_pec/sqrt(a),
    # snapshot.c:261) is u(a0) = a0^2 H(a0) f(a0) psi
    vel = (a0 * a0 * h_a * growth_rate * psi).reshape(-1, 3)
    return pos, vel
