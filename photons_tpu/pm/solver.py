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


def green_function_traced(n_side: int, boxsize: float, split_radius: float,
                          deconvolve: bool = True, dtype=jnp.float32):
    """Traced twin of :func:`green_function`: build the kernel on-device.

    A host-materialized gf captured by a jitted force function is inlined
    into the HLO as a literal constant -- 270 MB of program text at a
    512^3 mesh, which the axon remote-compile endpoint rejects outright
    (HTTP 413).  Built in-trace from iota, XLA fuses the few elementwise
    ops into the spectrum multiply and the constant pool stays O(1).
    Weight math follows green_function exactly (conv.f90:176-233)."""
    f = jnp.float32 if dtype == jnp.float32 else jnp.float64
    l_full = jnp.fft.fftfreq(n_side, d=1.0 / n_side).astype(f)
    l_half = jnp.arange(n_side // 2 + 1, dtype=f)
    lx = l_full[:, None, None]
    ly = l_full[None, :, None]
    lz = l_half[None, None, :]
    k2 = lx * lx + ly * ly + lz * lz

    pref = boxsize**2 / np.pi
    gf = pref / jnp.where(k2 > 0, k2, 1.0)
    if deconvolve:
        ismth2 = (2.0 * np.pi * split_radius / boxsize) ** 2
        ff = 1.0 / (jnp.sinc(lx / n_side) * jnp.sinc(ly / n_side)
                    * jnp.sinc(lz / n_side))
        gf = gf * jnp.exp(-k2 * ismth2) * ff**4
    gf = gf.at[0, 0, 0].set(pref)   # DC kept finite (conv.f90:226-228)
    return gf.astype(dtype)


# Above this length a 1-D FFT is computed by recursive radix-2
# (Cooley-Tukey) splitting into two half-length XLA FFT ops + a twiddle
# combine.  XLA's TPU lowering of a length-512 FFT embedded in a larger
# program materializes an f32[n, n, n/4, 4] temp whose (8, 128) tiling
# pads the trailing dim-4 axis 32x -- 16 GB of HLO temp at a 512^3 mesh
# (measured OOM: "Extra memory due to padding: 15.50G (32.0x expansion)";
# the same FFT compiled standalone gets a sane layout).  256-point FFTs
# embedded in the flagship 256^3 step are measured safe, so the split
# recurses to <= 256.  Measured at 512^3: full forward+inverse 3-D chain
# 1.77 GiB of temps, ~128 ms/call on a v5e.
_FFT_SAFE_LEN = 256



def _twiddle_mul(x, n: int, sign: float):
    """x * exp(sign * 2j pi k / n) along the last axis, without a complex
    broadcast: a (k,)-vector COMPLEX twiddle broadcast against a 3-D
    complex array makes XLA materialize the whole product via
    broadcast_in_dim with a trailing (re,im) pair -- (8,128)-tiled that
    pads 64x, a 34 GB copy at 512^3 (measured; it also compiled flakily,
    program-dependent).  Real cos/sin factors broadcast lane-safely."""
    h = x.shape[-1]
    rdt = x.real.dtype
    ang = (sign * 2.0 * jnp.pi / n) * jnp.arange(h, dtype=rdt)
    c, si = jnp.cos(ang), jnp.sin(ang)
    xr, xi = jnp.real(x), jnp.imag(x)
    from jax import lax as _lax
    return _lax.complex(c * xr - si * xi, c * xi + si * xr)


def _fft1(a, inverse: bool):
    """C2C FFT along the LAST axis via radix-2 splits to safe lengths."""
    return _fft1_impl(a, inverse)


def _interleave_last(xe, xo, n: int):
    """[e0, o0, e1, o1, ...] along the last axis, lane-safely.

    ``stack([xe, xo], -1).reshape(..., n)`` creates a trailing length-2
    axis whose (8,128) tiling pads 2 -> 128 lanes when XLA materializes
    it as a copy: a 34 GB allocation at 512^3 (measured through the fd4k
    gradient program; the production potential path only survived by
    fusion luck).  ``jnp.repeat(x, 2, -1)`` is NOT a fix -- it lowers to
    the same broadcast_in_dim + reshape (measured identically).  Interior
    padding is: lax.pad with interior=1 writes [e0, 0, e1, 0, ...]
    directly at full lane width, and the sum fills the holes."""
    zero = jnp.zeros((), xe.dtype)
    head = [(0, 0, 0)] * (xe.ndim - 1)
    a = jax.lax.pad(xe, zero, head + [(0, 1, 1)])
    b = jax.lax.pad(xo, zero, head + [(1, 0, 1)])
    return a + b


def _fft1_impl(a, inverse: bool):
    n = a.shape[-1]
    if n <= _FFT_SAFE_LEN or n % 2:
        return jnp.fft.ifft(a, axis=-1) if inverse else jnp.fft.fft(a, axis=-1)
    h = n // 2
    if inverse:
        # inverse radix-2: recover half-spectra, then interleave
        e = 0.5 * (a[..., :h] + a[..., h:])
        ow = 0.5 * (a[..., :h] - a[..., h:])
        xe = _fft1(e, True)
        xo = _fft1(_twiddle_mul(ow, n, +1.0), True)
        return _interleave_last(xe, xo, n)
    e = _fft1(a[..., 0::2], False)
    o = _fft1(a[..., 1::2], False)
    wo = _twiddle_mul(o, n, -1.0)
    return jnp.concatenate([e + wo, e - wo], -1)


def _fft_axis(a, axis: int, inverse: bool):
    n = a.shape[axis]
    if n <= _FFT_SAFE_LEN or n % 2:
        return (jnp.fft.ifft(a, axis=axis) if inverse
                else jnp.fft.fft(a, axis=axis))
    a = jnp.moveaxis(a, axis, -1)
    return jnp.moveaxis(_fft1(a, inverse), -1, axis)


def _rfft1(a):
    """R2C FFT along the LAST axis (radix-2 to safe lengths): (...,n) real
    -> (..., n//2+1) complex."""
    n = a.shape[-1]
    if n <= _FFT_SAFE_LEN or n % 4:
        return jnp.fft.rfft(a, axis=-1)
    h = n // 2
    e = _rfft1(a[..., 0::2])                       # (..., h//2+1)
    o = _rfft1(a[..., 1::2])
    # hermitian extension to m = 0..h, then one twiddle combine:
    # X[m] = E[m mod h] + w^m O[m mod h], w = exp(-2 pi i / n)
    ee = jnp.concatenate([e, jnp.conj(e[..., h // 2 - 1:0:-1]),
                          e[..., :1]], -1)          # (..., h+1)
    oe = jnp.concatenate([o, jnp.conj(o[..., h // 2 - 1:0:-1]),
                          o[..., :1]], -1)
    return ee + _twiddle_mul(oe, n, -1.0)


def _irfft1(x, n: int):
    """C2R inverse along the LAST axis: (..., n//2+1) complex -> (...,n)."""
    if n <= _FFT_SAFE_LEN or n % 4:
        return jnp.fft.irfft(x, n=n, axis=-1)
    h = n // 2
    # split the half-spectrum back into the even/odd half-length spectra
    a = x[..., :h]
    b = jnp.concatenate([x[..., h:h + 1], jnp.conj(x[..., h - 1:0:-1])], -1)
    e = 0.5 * (a + b)
    o = _twiddle_mul(0.5 * (a - b), n, +1.0)
    xe = _irfft1(e[..., :h // 2 + 1], h)
    xo = _irfft1(o[..., :h // 2 + 1], h)
    return _interleave_last(xe, xo, n)


def rfft3(x):
    """rfftn(x) for a cubic real mesh, safe at any power-of-two side."""
    n = x.shape[0]
    if n <= _FFT_SAFE_LEN:
        return jnp.fft.rfftn(x)
    xk = _rfft1(x)
    xk = _fft_axis(xk, 1, False)
    return _fft_axis(xk, 0, False)


def irfft3(xk, n: int, dtype):
    """irfftn(xk, s=(n,n,n)), safe at any power-of-two side."""
    if n <= _FFT_SAFE_LEN:
        return jnp.fft.irfftn(xk, s=(n, n, n)).astype(dtype)
    xk = _fft_axis(xk, 0, True)
    xk = _fft_axis(xk, 1, True)
    return _irfft1(xk, n).astype(dtype)


def interlace_mode(interlace) -> str:
    """Normalize an interlace knob to 'off' / 'read' / 'full'.

    Accepts the config string or a legacy bool (True == 'full').  Any
    other value raises: a typo ('READ', 'on') must not silently disable
    interlacing (ADVICE round 4)."""
    if interlace is True:
        return "full"
    if interlace is False or interlace is None:
        return "off"
    if interlace in ("off", "read", "full"):
        return str(interlace)
    raise ValueError(
        f"pm_interlace must be one of 'off'/'read'/'full' (or bool), "
        f"got {interlace!r}")


def interlace_phase_mul(xk, n_side: int):
    """Align the half-cell-shifted paint's spectrum with the unshifted one.

    Interlaced CIC (Hockney & Eastwood ch. 5-7-4): particles painted at
    x + H/2 (H = cell) pick up exp(-i k.H/2) per mode, so multiplying the
    shifted spectrum by exp(+i theta), theta = (pi/n)(lx+ly+lz) with
    SIGNED integer modes, re-aligns the fundamental -- while alias images
    k + m k_N carry an extra (-1)^(m1+m2+m3), so the odd images cancel in
    the average 0.5*(rho1 + e^{i theta} rho2).  This is the aliasing the
    reference's deconv^4 window correction (conv.f90:224) cannot remove.

    Lane-safe complex arithmetic throughout: a complex-vector broadcast
    against a 3-D spectrum materializes a trailing (re,im) pair that
    tile-pads 64x on TPU (see _twiddle_mul)."""
    from jax import lax

    rdt = xk.real.dtype
    kshape = xk.shape
    th = None
    for ax in range(3):
        i = lax.broadcasted_iota(rdt, kshape, ax)
        l = i if ax == 2 else jnp.where(i <= n_side // 2, i, i - n_side)
        th = l if th is None else th + l
    th = th * (jnp.pi / n_side)
    c, s = jnp.cos(th), jnp.sin(th)
    xr, xi = jnp.real(xk), jnp.imag(xk)
    return lax.complex(c * xr - s * xi, c * xi + s * xr)


def pm_potential(density, gf):
    """FFT convolution of the density mesh with the Green's function."""
    n = density.shape[0]
    dk = rfft3(density)
    return irfft3(dk * gf, n, density.dtype)


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


def gradient_fd4_k(conv_k, boxsize: float, n_side: int, dtype):
    """The reference's 4th-order stencil evaluated in k-space.

    D(k) = [8 sin(k d) - sin(2 k d)] / (6 d) is gradient_4th's exact
    transfer function (partmesh.c:1318-1383 with d = L/n); multiplying
    the potential spectrum by i D(k_c) per axis and inverse-transforming
    is the SAME discrete operator by the convolution theorem -- but it
    sidesteps the f32 catastrophic cancellation of real-space
    differencing.  phi is dominated by its longest modes, so neighboring
    cells cancel ~1e4x in the stencil: at a 512^3 mesh the f32 FFT's
    2e-7 potential noise became 2e-3 gradient noise, and the f32 cast of
    phi alone cost 7e-4 (scripts/check_pm_chain.py stages F/G) -- the
    entire gap between the measured 1.3e-3 total-force error and the
    16^3 ladder's 6.3e-4 discretization floor.

    Input: conv_k = rfft3(density) * green_function.  Returns a tuple of
    three (n, n, n) real fields (separate arrays: a trailing length-3
    axis tile-pads 42x on TPU, see pm.mesh notes).
    """
    from jax import lax

    d = boxsize / n_side
    rdt = conv_k.real.dtype
    kshape = (n_side, n_side, n_side // 2 + 1)

    # FULL-shape D fields built from iota in-trace: a broadcast multiply
    # by a (1,1,K)-shaped vector makes XLA copy the complex spectrum into
    # a layout whose trailing (re,im) pair lane-pads 64x -- a 34 GB
    # allocation at 512^3 (measured).  Full-shape elementwise multiplies
    # follow pm_potential's proven layout path and fuse into the FFT.
    def dfield(ax):
        i = lax.broadcasted_iota(rdt, kshape, ax)
        l = i if ax == 2 else jnp.where(i <= n_side // 2, i, i - n_side)
        kd = (2.0 * jnp.pi / n_side) * l
        return (8.0 * jnp.sin(kd) - jnp.sin(2.0 * kd)) / (6.0 * d)

    out = []
    for ax in range(3):
        z = conv_k * dfield(ax)
        # multiply by i without a complex-constant broadcast:
        # i (a + ib) = -b + ia
        out.append(irfft3(lax.complex(-jnp.imag(z), jnp.real(z)),
                          n_side, dtype))
    return tuple(out)


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
        return irfft3(1j * kf * kvec_axis * phi_k, n_side, dtype)

    gx = d(l_full[:, None, None])
    gy = d(l_full[None, :, None])
    gz = d(l_half[None, None, :])
    return jnp.stack([gx, gy, gz], axis=-1)


@partial(jax.jit, static_argnames=("boxsize", "n_side", "mass", "gradient",
                                   "interlace"))
def pm_accel(pos, gf, mass: float, boxsize: float, n_side: int,
             gradient: str = "fd4", interlace: bool = False):
    """Full PM step: positions -> long-range acceleration (N, 3).

    gradient='fd4' (default) is the reference's real-space 4th-order stencil
    (partmesh.c:1256-1550); its differencing error acts as a grid-scale
    low-pass that empirically suppresses CIC aliasing slightly better than
    exact-ik 'spectral' differentiation, and costs 12 rolls instead of 3
    extra inverse FFTs.  'fd4k' evaluates the same stencil in k-space.

    ``interlace``: "off" (default), "read", or "full" (bools accepted:
    True == "full").  "full" = a second half-cell-shifted paint,
    phase-aligned and averaged in k, AND a second readout of the force
    spectrum evaluated on the half-shifted grid -- the classic odd
    alias-image cancellation.  Measured on the 32^3 rs=1.25c ladder:
    plain 2.19e-3 / full 8.4e-4 on uniform-random states, but full
    REGRESSES displaced-lattice states 2.3e-3 -> 6.6e-3 (the +H/2
    shift parks lattice particles on the shifted grid's CIC kink; see
    config.pm_interlace).  "read" interlaces only the readout side --
    no kink pathology, a mild win on every state.
    """
    mode = interlace_mode(interlace)

    def grad_of(conv_k):
        if gradient == "spectral":
            return spectral_gradient(conv_k, boxsize, n_side, pos.dtype)
        if gradient == "fd4k":
            gx, gy, gz = gradient_fd4_k(conv_k, boxsize, n_side, pos.dtype)
            return jnp.stack([gx, gy, gz], axis=-1)
        phi = irfft3(conv_k, n_side, pos.dtype)
        return gradient_4th(phi, boxsize)

    norm = mass * (n_side / boxsize) ** 3
    dk = rfft3(cic_paint(pos, boxsize, n_side) * norm)
    shift = 0.5 * boxsize / n_side
    if mode == "full":
        dk2 = rfft3(cic_paint(pos + shift, boxsize, n_side) * norm)
        dk = 0.5 * (dk + interlace_phase_mul(dk2, n_side))
    conv_k = dk * gf.astype(dk.real.dtype)
    acc = cic_read_vector(grad_of(conv_k), pos, boxsize, n_side)
    if mode in ("read", "full"):
        # the same force spectrum sampled on the +H/2-shifted grid; in
        # that grid's frame the particle coordinate is pos - H/2
        acc2 = cic_read_vector(grad_of(interlace_phase_mul(conv_k, n_side)),
                               pos - shift, boxsize, n_side)
        acc = 0.5 * (acc + acc2)
    if mode == "read":
        # read-only interlacing breaks the paint/readout window symmetry
        # that makes plain (and 'full') PM conserve momentum exactly --
        # measured net force 2.7e-4 of rms(a)*N.  The violation is a
        # spurious alias-induced UNIFORM force (the true total is zero by
        # Newton's third law): project it out so total momentum is again
        # exact.  Equal masses, so the mass-weighted mean is the mean.
        acc = acc - jnp.mean(acc, axis=0, keepdims=True)
    return acc


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
        phi_k = rfft3(dens) * gf
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
