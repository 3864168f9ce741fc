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

def pencil_poisson_2d(brick, gf_local, ax: str, ay: str):
    """FFT convolution of a brick-sharded density mesh over a 2-D mesh.

    brick (nx_loc, ny_loc, n): this device's (x, y) brick with full z.
    gf_local (n, n//dx, nh_pad//dy): this device's Green slice -- full kx,
    the x-position's ky chunk, the y-position's kz chunk (the caller shards
    the global (n, n, nh_pad) array with spec P(None, ax, ay)).
    Returns the potential brick (nx_loc, ny_loc, n).

    Pipeline (mirrors decomp_2d_fft_3d's z-pencil -> y-pencil -> x-pencil):
      rfft z  ->  all_to_all over ay (z chunks <-> y gather)  ->  fft y
              ->  all_to_all over ax (y chunks <-> x gather)  ->  fft x
              ->  Green multiply  ->  exact inverse mirror.
    kz is zero-padded from nh = n//2+1 to a multiple of dy; padded planes
    stay exactly zero through the y/x transforms.
    """
    dx = lax.axis_size(ax)
    dy = lax.axis_size(ay)
    nx_loc, ny_loc, n = brick.shape
    nh = n // 2 + 1
    nh_pad = -(-nh // dy) * dy
    nh_loc = nh_pad // dy
    ny2 = n // dx                     # y chunk in the x-pencil layout

    # all transforms run on the LAST axis via explicit moveaxis: XLA:CPU's
    # fft thunk RET_CHECKs unless the operand layout is dim0-major, and a
    # fused producer transpose can otherwise sink into the fft input
    def fft_axis(v, axis, inverse=False):
        v = jnp.moveaxis(v, axis, -1)
        v = jnp.fft.ifft(v, axis=-1) if inverse else jnp.fft.fft(v, axis=-1)
        return jnp.moveaxis(v, -1, axis)

    fk = jnp.fft.rfft(brick, axis=2)                     # (nx, ny, nh)
    fk = jnp.pad(fk, ((0, 0), (0, 0), (0, nh_pad - nh)))

    # z <-> y transpose over the y-axis group: full y, z chunked
    fk = fk.reshape(nx_loc, ny_loc, dy, nh_loc)
    fk = lax.all_to_all(fk, ay, split_axis=2, concat_axis=1, tiled=False)
    fk = fk.reshape(nx_loc, n, nh_loc)                   # (nx, n, nh_loc)
    fk = fft_axis(fk, 1)

    # y <-> x transpose over the x-axis group: full x, y chunked
    fk = fk.reshape(nx_loc, dx, ny2, nh_loc)
    fk = lax.all_to_all(fk, ax, split_axis=1, concat_axis=0, tiled=False)
    fk = fk.reshape(n, ny2, nh_loc)                      # (n, ny2, nh_loc)
    fk = fft_axis(fk, 0)

    fk = fk * gf_local

    fk = fft_axis(fk, 0, inverse=True)
    fk = fk.reshape(dx, nx_loc, ny2, nh_loc)
    fk = lax.all_to_all(fk, ax, split_axis=0, concat_axis=1, tiled=False)
    fk = fk.reshape(nx_loc, n, nh_loc)
    fk = fft_axis(fk, 1, inverse=True)
    # y is chunk-major here (dy blocks of ny_loc); send chunk j to device j
    # and reassemble the z chunks in sender order
    fk = fk.reshape(nx_loc, dy, ny_loc, nh_loc)
    fk = lax.all_to_all(fk, ay, split_axis=1, concat_axis=2, tiled=False)
    fk = fk.reshape(nx_loc, ny_loc, nh_pad)[:, :, :nh]
    out = jnp.fft.irfft(fk, n=n, axis=2)
    return out.real.astype(brick.dtype)


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
