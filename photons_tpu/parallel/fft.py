"""Distributed pencil-decomposed FFT Poisson solve.

TPU-native replacement for the 2DECOMP&FFT library (conv.f90 +
libdecomp2d.a): the mesh is slab-sharded along x; the 2-D (y, z) r2c FFT
runs locally, the x <-> y transpose is a single ``lax.all_to_all`` over the
ICI mesh (what 2DECOMP does with MPI_Alltoallv inside decomp_2d_fft_3d),
the x FFT runs locally on full-x pencils, the Green multiply uses the
shard's own k-slice, and the inverse path mirrors it.

All functions run *inside* ``shard_map`` over a 1-D mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pencil_poisson(local_slab, gf_local, axis: str):
    """FFT convolution of the slab-sharded density mesh.

    local_slab (nx_loc, n, n) real density; gf_local (n, ny_loc, nh) = this
    shard's y-slice of the Green's function on the rfft grid (x full).
    Returns the potential slab (nx_loc, n, n).
    """
    d = lax.axis_size(axis)
    nx_loc, n, _ = local_slab.shape
    nh = n // 2 + 1
    ny_loc = n // d

    # local 2-D r2c FFT over (y, z)
    fk = jnp.fft.rfft2(local_slab, axes=(1, 2))         # (nx_loc, n, nh)

    # transpose x <-> y: gather full x, keep a y-chunk
    # (nx_loc, d, ny_loc, nh) -> all_to_all -> (d, nx_loc, ny_loc, nh)
    fk = fk.reshape(nx_loc, d, ny_loc, nh)
    fk = lax.all_to_all(fk, axis, split_axis=1, concat_axis=0, tiled=False)
    fk = fk.reshape(d * nx_loc, ny_loc, nh)             # (n, ny_loc, nh)

    # full-length x FFT, Green multiply in the shard's k-slice, inverse
    fk = jnp.fft.fft(fk, axis=0)
    fk = fk * gf_local
    fk = jnp.fft.ifft(fk, axis=0)

    # transpose back y <-> x
    fk = fk.reshape(d, nx_loc, ny_loc, nh)
    fk = lax.all_to_all(fk, axis, split_axis=0, concat_axis=1, tiled=False)
    fk = fk.reshape(nx_loc, n, nh)

    out = jnp.fft.irfft2(fk, s=(n, n), axes=(1, 2))
    return out.real.astype(local_slab.dtype)


def green_function_yslice(n_side: int, boxsize: float, split_radius: float,
                          dtype):
    """The Green's function laid out for pencil use: (n, n, nh), sharded on
    axis 1 (y) by the caller.  Same kernel as pm.solver.green_function
    (single source of truth); numpy's fft along x, rfft along z match the
    pencil transforms."""
    from photons_tpu.pm.solver import green_function

    return green_function(n_side, boxsize, split_radius, dtype=dtype)


# ---------------------------------------------------------------------------
# true 2-D pencil decomposition (2DECOMP parity: NprocVertical x NprocHorizon
# process grid, initial.c:253-254,461-472; transposes inside
# decomp_2d_fft_3d become two all_to_all collectives)
# ---------------------------------------------------------------------------

def _fft_axis(v, axis, inverse=False):
    # all transforms run on the LAST axis via explicit moveaxis: XLA:CPU's
    # fft thunk RET_CHECKs unless the operand layout is dim0-major, and a
    # fused producer transpose can otherwise sink into the fft input
    v = jnp.moveaxis(v, axis, -1)
    v = jnp.fft.ifft(v, axis=-1) if inverse else jnp.fft.fft(v, axis=-1)
    return jnp.moveaxis(v, -1, axis)


def pencil_forward_2d(brick, ax: str, ay: str):
    """Forward half of the 2-D pencil transform: real brick -> x-pencil
    spectrum (n, n//dx, nh_pad//dy).

    Pipeline (mirrors decomp_2d_fft_3d's z-pencil -> y-pencil -> x-pencil):
      rfft z  ->  all_to_all over ay (z chunks <-> y gather)  ->  fft y
              ->  all_to_all over ax (y chunks <-> x gather)  ->  fft x.
    kz is zero-padded from nh = n//2+1 to a multiple of dy; padded planes
    stay exactly zero through the y/x transforms.  In the output layout
    this device holds ky chunk ``axis_index(ax)`` and kz chunk
    ``axis_index(ay)`` (the P(None, ax, ay) sharding of the global
    (n, n, nh_pad) spectrum)."""
    dx = lax.axis_size(ax)
    dy = lax.axis_size(ay)
    nx_loc, ny_loc, n = brick.shape
    nh = n // 2 + 1
    nh_pad = -(-nh // dy) * dy
    nh_loc = nh_pad // dy
    ny2 = n // dx                     # y chunk in the x-pencil layout

    fk = jnp.fft.rfft(brick, axis=2)                     # (nx, ny, nh)
    fk = jnp.pad(fk, ((0, 0), (0, 0), (0, nh_pad - nh)))

    # z <-> y transpose over the y-axis group: full y, z chunked
    fk = fk.reshape(nx_loc, ny_loc, dy, nh_loc)
    fk = lax.all_to_all(fk, ay, split_axis=2, concat_axis=1, tiled=False)
    fk = fk.reshape(nx_loc, n, nh_loc)                   # (nx, n, nh_loc)
    fk = _fft_axis(fk, 1)

    # y <-> x transpose over the x-axis group: full x, y chunked
    fk = fk.reshape(nx_loc, dx, ny2, nh_loc)
    fk = lax.all_to_all(fk, ax, split_axis=1, concat_axis=0, tiled=False)
    fk = fk.reshape(n, ny2, nh_loc)                      # (n, ny2, nh_loc)
    return _fft_axis(fk, 0)


def pencil_inverse_2d(fk, nx_loc: int, ny_loc: int, ax: str, ay: str,
                      dtype):
    """Inverse half: x-pencil spectrum (n, n//dx, nh_pad//dy) -> real
    brick (nx_loc, ny_loc, n).  Exact mirror of pencil_forward_2d."""
    dx = lax.axis_size(ax)
    dy = lax.axis_size(ay)
    n = fk.shape[0]
    nh = n // 2 + 1
    nh_loc = fk.shape[2]
    nh_pad = nh_loc * dy
    ny2 = n // dx

    fk = _fft_axis(fk, 0, inverse=True)
    fk = fk.reshape(dx, nx_loc, ny2, nh_loc)
    fk = lax.all_to_all(fk, ax, split_axis=0, concat_axis=1, tiled=False)
    fk = fk.reshape(nx_loc, n, nh_loc)
    fk = _fft_axis(fk, 1, inverse=True)
    # y is chunk-major here (dy blocks of ny_loc); send chunk j to device j
    # and reassemble the z chunks in sender order
    fk = fk.reshape(nx_loc, dy, ny_loc, nh_loc)
    fk = lax.all_to_all(fk, ay, split_axis=1, concat_axis=2, tiled=False)
    fk = fk.reshape(nx_loc, ny_loc, nh_pad)[:, :, :nh]
    out = jnp.fft.irfft(fk, n=n, axis=2)
    return out.real.astype(dtype)


def pencil_poisson_2d(brick, gf_local, ax: str, ay: str):
    """FFT convolution of a brick-sharded density mesh over a 2-D mesh.

    brick (nx_loc, ny_loc, n): this device's (x, y) brick with full z.
    gf_local (n, n//dx, nh_pad//dy): this device's Green slice -- full kx,
    the x-position's ky chunk, the y-position's kz chunk (the caller shards
    the global (n, n, nh_pad) array with spec P(None, ax, ay)).
    Returns the potential brick (nx_loc, ny_loc, n)."""
    nx_loc, ny_loc, _ = brick.shape
    fk = pencil_forward_2d(brick, ax, ay)
    fk = fk * gf_local
    return pencil_inverse_2d(fk, nx_loc, ny_loc, ax, ay, brick.dtype)


# ---------------------------------------------------------------------------
# in-trace spectral fields in the x-pencil layout (run inside shard_map)
# ---------------------------------------------------------------------------

def _modes_local_xpencil(shape, ax: str, ay: str, n_side: int, rdt):
    """Signed mode-number fields (lx, ly, lz) for this device's x-pencil
    k-chunk (n, n//dx, nh_pad//dy), built from iota in-trace.

    lx is the full signed axis; ly is this device's ky chunk (offset
    ``axis_index(ax) * n//dx``), signed; lz is the raw half-spectrum index
    (offset ``axis_index(ay) * nh_loc``) -- callers mask lz >= n//2+1
    (the dy zero-padding planes)."""
    ky0 = lax.axis_index(ax) * shape[1]
    kz0 = lax.axis_index(ay) * shape[2]

    def signed(axis, off):
        i = lax.broadcasted_iota(rdt, shape, axis) + off
        return jnp.where(i <= n_side // 2, i, i - n_side)

    lx = signed(0, 0)
    ly = signed(1, ky0.astype(rdt))
    lz = lax.broadcasted_iota(rdt, shape, 2) + kz0.astype(rdt)
    return lx, ly, lz


def green_local_xpencil(n_side: int, boxsize: float, split_radius: float,
                        ax: str, ay: str, dtype, deconvolve: bool = True):
    """This device's Green's-function slice in the x-pencil k layout,
    built IN-TRACE from iota (runs inside shard_map).

    Replaces the host-materialized ``green_function_pencil2d`` operand: a
    captured (n, n, nh_pad) array is 2.16 GB of HBM at a 1024^3 mesh
    (measured, NEXT.md round-5) and is inlined into the program as a
    literal; the in-trace slice is O(n^3 / D) and fuses into the spectrum
    multiply.  Weight math follows pm.solver.green_function exactly
    (conv.f90:176-233) -- the reference's pencil library likewise computes
    its Green per-pencil inside the distributed loop (conv.f90:183-233).
    Padded kz planes (the dy round-up) are exactly zero."""
    import numpy as np
    f = jnp.float32 if jnp.dtype(dtype) == jnp.float32 else jnp.float64
    dx = lax.axis_size(ax)
    dy = lax.axis_size(ay)
    nh = n_side // 2 + 1
    nh_loc = (-(-nh // dy) * dy) // dy
    shape = (n_side, n_side // dx, nh_loc)
    lx, ly, lz = _modes_local_xpencil(shape, ax, ay, n_side, f)
    k2 = lx * lx + ly * ly + lz * lz

    pref = boxsize**2 / np.pi
    gf = pref / jnp.where(k2 > 0, k2, 1.0)
    if deconvolve:
        ismth2 = (2.0 * np.pi * split_radius / boxsize) ** 2
        ff = 1.0 / (jnp.sinc(lx / n_side) * jnp.sinc(ly / n_side)
                    * jnp.sinc(lz / n_side))
        gf = gf * jnp.exp(-k2 * ismth2) * ff**4
    gf = jnp.where(k2 == 0, pref, gf)       # DC kept finite (conv.f90:226)
    gf = jnp.where(lz < nh, gf, 0.0)        # zero-padded kz planes
    return gf.astype(dtype)


def gradient_mul_i_local(fk, axn: int, n_side: int, boxsize: float,
                         ax: str, ay: str, gradient: str = "fd4k"):
    """Multiply an x-pencil spectrum by i*D(k_axn) in-trace.

    gradient='fd4k': D(k) = [8 sin(kd) - sin(2kd)] / (6d), the exact
    transfer function of the reference's real-space 4th-order stencil
    (partmesh.c:1318-1383) -- the k-space evaluation that closed the f32
    differencing-cancellation hole on the single chip (pm/solver.
    gradient_fd4_k).  'spectral': exact ik.  Lane-safe complex multiply
    (i (a+ib) = -b + ia; see pm/solver._twiddle_mul for the TPU layout
    trap a complex-constant broadcast springs)."""
    rdt = fk.real.dtype
    lx, ly, lz = _modes_local_xpencil(fk.shape, ax, ay, n_side, rdt)
    l = (lx, ly, lz)[axn]
    if gradient == "spectral":
        dfield = (2.0 * jnp.pi / boxsize) * l
    else:
        d = boxsize / n_side
        kd = (2.0 * jnp.pi / n_side) * l
        dfield = (8.0 * jnp.sin(kd) - jnp.sin(2.0 * kd)) / (6.0 * d)
    z = fk * dfield
    return lax.complex(-jnp.imag(z), jnp.real(z))


def interlace_phase_local(fk, n_side: int, ax: str, ay: str):
    """x-pencil twin of pm.solver.interlace_phase_mul: align the half-cell
    shifted grid's spectrum, theta = (pi/n)(lx+ly+lz) on this device's
    k-chunk (signed lx/ly, raw half-index lz)."""
    rdt = fk.real.dtype
    lx, ly, lz = _modes_local_xpencil(fk.shape, ax, ay, n_side, rdt)
    th = (lx + ly + lz) * (jnp.pi / n_side)
    c, s = jnp.cos(th), jnp.sin(th)
    xr, xi = jnp.real(fk), jnp.imag(fk)
    return lax.complex(c * xr - s * xi, c * xi + s * xr)


def green_function_pencil2d(n_side: int, boxsize: float, split_radius: float,
                            dtype, dy: int):
    """Global Green's function in the x-pencil k-layout (n, n, nh_pad):
    axis 0 = kx (full), axis 1 = ky (sharded over ax), axis 2 = kz padded to
    a multiple of dy (sharded over ay); padded planes are zero."""
    from photons_tpu.pm.solver import green_function

    gf = green_function(n_side, boxsize, split_radius, dtype=dtype)
    nh = n_side // 2 + 1
    nh_pad = -(-nh // dy) * dy
    import numpy as _np
    return jnp.asarray(_np.pad(_np.asarray(gf),
                               ((0, 0), (0, 0), (0, nh_pad - nh))))
