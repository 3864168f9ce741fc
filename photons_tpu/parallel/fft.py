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
