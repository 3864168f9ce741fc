"""Pallas P2P kernel tests (interpret mode on CPU): parity of both layouts
vs the jnp reference path, neighbor-table construction, and packing
(SURVEY.md section 4, rebuild test 2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from photons_tpu.config import SimConfig
from photons_tpu.ops.fmm_engine import fmm_forces
from photons_tpu.ops.p2p_pallas import (neighbor_table, pack_redundant,
                                        p2p_redundant, p2p_indexing)

L = 50.0


def test_neighbor_table_roundtrip():
    pairs = jnp.asarray([[0, 1], [0, 2], [1, 0], [3, 3], [-1, -1], [0, 0]],
                        jnp.int32)
    table, overflow = neighbor_table(pairs, n_leaf=4, cap=4)
    t = np.asarray(table)
    assert sorted(t[0][t[0] >= 0].tolist()) == [0, 1, 2]
    assert t[1][0] == 0 and (t[1][1:] == -1).all()
    assert (t[2] == -1).all()
    assert t[3][0] == 3
    assert not bool(overflow)


def test_neighbor_table_overflow():
    pairs = jnp.asarray([[0, i] for i in range(5)], jnp.int32)
    _, overflow = neighbor_table(pairs, n_leaf=2, cap=4)
    assert bool(overflow)


def test_pack_redundant_layout():
    """Packed stream = exactly the neighbor leaves' planes, masked."""
    rng = np.random.default_rng(0)
    nleaf, s = 4, 8
    planes = jnp.asarray(rng.uniform(0, 10, (nleaf, 3, s)))
    masses = jnp.asarray(rng.uniform(1, 2, (nleaf, s)))
    table = jnp.asarray([[1, 2, -1, -1]] * nleaf, jnp.int32)
    src_p, src_m = pack_redundant(planes, masses, table, s)
    np.testing.assert_allclose(np.asarray(src_p[0, :, :s]),
                               np.asarray(planes[1]))
    np.testing.assert_allclose(np.asarray(src_p[0, :, s:2 * s]),
                               np.asarray(planes[2]))
    assert float(jnp.abs(src_m[0, 0, 2 * s:]).max()) == 0.0  # invalid masked


@pytest.mark.parametrize("backend", ["redundant", "indexing"])
@pytest.mark.parametrize("periodic", [True, False])
def test_pallas_backend_matches_jnp(backend, periodic):
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=1024, dtype="float64",
                    leaf_size=16, periodic=periodic,
                    longshort=periodic)
    pos = jnp.asarray(np.random.default_rng(7).uniform(0, L, (1024, 3)))
    ref, _ = jax.jit(lambda p: fmm_forces(p, cfg, p2p_backend="jnp"))(pos)
    acc, diag = jax.jit(lambda p: fmm_forces(p, cfg, p2p_backend=backend))(pos)
    assert not bool(diag["overflow"])
    rms = float(jnp.sqrt((ref**2).sum(-1)).mean())
    # difference budget: the kernels' rational erfc (1.5e-7 abs in g)
    assert float(jnp.abs(acc - ref).max()) / rms < 2e-5


def test_pallas_uneven_leaf_occupancy():
    """N not a multiple of leaf_size: padded slots must contribute nothing."""
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=1000, dtype="float64",
                    leaf_size=16)
    pos = jnp.asarray(np.random.default_rng(8).uniform(0, L, (1000, 3)))
    ref, _ = jax.jit(lambda p: fmm_forces(p, cfg, p2p_backend="jnp"))(pos)
    for backend in ("redundant", "indexing"):
        acc, _ = jax.jit(lambda p: fmm_forces(p, cfg, p2p_backend=backend))(pos)
        rms = float(jnp.sqrt((ref**2).sum(-1)).mean())
        assert float(jnp.abs(acc - ref).max()) / rms < 2e-5


def test_pallas_s128_tile_path():
    """leaf_size=128 (the TPU-tuned configuration: full (128,128) tiles,
    one chunk per neighbor) must agree with the jnp path."""
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=2048, dtype="float64",
                    leaf_size=128, open_cap_per_node=128,
                    p2p_neighbor_cap=96)
    pos = jnp.asarray(np.random.default_rng(9).uniform(0, L, (2048, 3)))
    ref, _ = jax.jit(lambda p: fmm_forces(p, cfg, p2p_backend="jnp"))(pos)
    rms = float(jnp.sqrt((ref**2).sum(-1)).mean())
    for backend in ("redundant", "indexing"):
        acc, diag = jax.jit(lambda p: fmm_forces(p, cfg,
                                                 p2p_backend=backend))(pos)
        assert not bool(diag["overflow"])
        assert float(jnp.abs(acc - ref).max()) / rms < 2e-5
