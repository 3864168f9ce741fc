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


def test_hybrid_backend_matches_jnp_on_clustered():
    """engine=fmm-hybrid (K-bucketed composition of the two layouts,
    VERDICT r3 next-8): a dense blob drives some leaves' neighbor rows
    past the threshold (indexing bucket) while the uniform background
    stays below (redundant bucket); total forces must match the jnp
    reference, with BOTH buckets exercised."""
    from photons_tpu.ops.traversal import dual_tree_traversal
    from photons_tpu.tree.build import build_tree

    rng = np.random.default_rng(11)
    n = 1536
    blob = np.mod(rng.normal(0.4 * L, 0.015 * L, (n // 2, 3)), L)
    pos = np.concatenate([rng.uniform(0, L, (n - n // 2, 3)), blob])
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=n, dtype="float64",
                    leaf_size=16, periodic=True, longshort=True,
                    p2p_neighbor_cap=96, p2p_hybrid_threshold=24)
    pos = jnp.asarray(pos)

    # confirm the bucket split is non-trivial at this threshold
    t = build_tree(pos, mass=cfg.particle_mass, leaf_size=16, lo=0.0, hi=L)
    lists = dual_tree_traversal(t, theta=cfg.open_angle,
                                cutoff=cfg.cutoff_radius, boxsize=L,
                                open_cap=cfg.open_cap_per_node,
                                m2l_cap=cfg.m2l_cap_per_node,
                                p2p_cap=cfg.p2p_neighbor_cap)
    rows = np.asarray((lists.p2p >= 0).sum(axis=1))
    assert (rows > cfg.p2p_hybrid_threshold).any(), "no indexing bucket"
    assert ((rows > 0) & (rows <= cfg.p2p_hybrid_threshold)).any(), \
        "no redundant bucket"

    ref, _ = jax.jit(lambda p: fmm_forces(p, cfg, p2p_backend="jnp"))(pos)
    acc, diag = jax.jit(lambda p: fmm_forces(p, cfg,
                                             p2p_backend="hybrid"))(pos)
    assert not bool(diag["overflow"])
    rms = float(jnp.sqrt((ref ** 2).sum(-1)).mean())
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


def test_indexing_subleaf_refine(monkeypatch):
    """S=256 flagship tile: the indexing layout refines to cutoff-culled
    (target, source) sub-leaf blocks (refine_table, 64x128).  Must agree
    with the jnp path up to the erfc tail of the culled out-of-cutoff
    blocks (the traversal's own leaf-granularity discard has the same
    semantics).  Refinement is off by default (loses on DMA-count
    overhead at 256^3 -- see p2p_pallas.REFINE_TARGET); forced on here
    to keep the path verified."""
    import photons_tpu.ops.p2p_pallas as pp
    monkeypatch.setattr(pp, "REFINE_TARGET", 64)
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=4096, dtype="float64",
                    leaf_size=256, open_cap_per_node=128,
                    p2p_neighbor_cap=96)
    assert cfg.longshort and cfg.periodic
    pos = jnp.asarray(np.random.default_rng(10).uniform(0, L, (4096, 3)))
    ref, _ = jax.jit(lambda p: fmm_forces(p, cfg, p2p_backend="jnp"))(pos)
    acc, diag = jax.jit(lambda p: fmm_forces(p, cfg,
                                             p2p_backend="indexing"))(pos)
    assert not bool(diag["overflow"])
    rms = float(jnp.sqrt((ref**2).sum(-1)).mean())
    # budget: rational-erfc 1.5e-7 + the culled halves' erfc-tail forces
    # (g(cutoff) ~ 1.5e-3 of Newtonian at r = 4.5 r_s)
    assert float(jnp.abs(acc - ref).max()) / rms < 2e-3
    assert float(jnp.sqrt(((acc - ref) ** 2).mean())) / rms < 2e-4


def test_indexing_quad_masks(monkeypatch):
    """Quad sub-tile culling (quad_masks, one DMA per leaf pair,
    mask-gated (64,128) sub-tiles).  Must agree with the jnp path up to
    the erfc tail of the culled blocks.  Off by default (measured net
    loss at 256^3 -- see p2p_pallas.P2P_QUAD); forced on here to keep
    the path verified."""
    import photons_tpu.ops.p2p_pallas as pp
    monkeypatch.setattr(pp, "P2P_QUAD", (4, 2))
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=4096, dtype="float64",
                    leaf_size=256, open_cap_per_node=128,
                    p2p_neighbor_cap=96)
    pos = jnp.asarray(np.random.default_rng(17).uniform(0, L, (4096, 3)))
    ref, _ = jax.jit(lambda p: fmm_forces(p, cfg, p2p_backend="jnp"))(pos)
    acc, diag = jax.jit(lambda p: fmm_forces(p, cfg,
                                             p2p_backend="indexing"))(pos)
    assert not bool(diag["overflow"])
    rms = float(jnp.sqrt((ref**2).sum(-1)).mean())
    assert float(jnp.abs(acc - ref).max()) / rms < 2e-3
    assert float(jnp.sqrt(((acc - ref) ** 2).mean())) / rms < 2e-4


def test_quad_masks_cull_and_cover():
    """quad_masks: kept bits exactly the within-cutoff (tight-AABB) block
    pairs; zero-mask entries dropped; self pairs keep their own bits."""
    from photons_tpu.ops.p2p_pallas import quad_masks
    from photons_tpu.ops.traversal import dual_tree_traversal
    from photons_tpu.tree.build import build_tree

    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=4096, dtype="float64",
                    leaf_size=256)
    pos = jnp.asarray(np.random.default_rng(21).uniform(0, L, (4096, 3)))
    tree = build_tree(pos, mass=cfg.particle_mass, leaf_size=256,
                      lo=0.0, hi=L)
    lists = dual_tree_traversal(tree, theta=cfg.open_angle,
                                cutoff=cfg.cutoff_radius, boxsize=L,
                                open_cap=128, m2l_cap=64, p2p_cap=96)
    tbl, msk = quad_masks(tree, lists.p2p, cfg.cutoff_radius, L,
                          ft=4, fs=2)
    t, m = np.asarray(tbl), np.asarray(msk)
    t0 = np.asarray(lists.p2p)
    n_leaf = tree.n_leaf
    assert t.shape == t0.shape and m.shape == t0.shape
    # valid entries carry a nonzero mask; dropped slots are -1/0 aligned
    assert ((t >= 0) == (m > 0)).all()
    assert (m[t >= 0] < (1 << 8)).all()
    # kept entries are a subset of the original row's entries
    for row in range(min(8, n_leaf)):
        assert set(t[row][t[row] >= 0]) <= set(t0[row][t0[row] >= 0])
    # the self pair survives with at least the diagonal blocks lit
    for row in range(n_leaf):
        sl = np.where(t[row] == row)[0]
        assert len(sl) == 1
        assert m[row][sl[0]] > 0
    # culling did something: total lit bits < full ft*fs per pair
    assert (np.vectorize(lambda x: bin(x).count("1"))(m).sum()
            < 8 * (t0 >= 0).sum())


def test_halve_table_culls_and_covers():
    """halve_table: one row per TARGET HALF; kept source halves come from
    the parent leaf's listed sources; tight-AABB culling removes a
    meaningful fraction of the (half, half) block pairs."""
    from photons_tpu.ops.p2p_pallas import halve_table
    from photons_tpu.ops.traversal import dual_tree_traversal
    from photons_tpu.tree.build import build_tree

    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=4096, dtype="float64",
                    leaf_size=256)
    pos = jnp.asarray(np.random.default_rng(12).uniform(0, L, (4096, 3)))
    tree = build_tree(pos, mass=cfg.particle_mass, leaf_size=256,
                      lo=0.0, hi=L)
    lists = dual_tree_traversal(tree, theta=cfg.open_angle,
                                cutoff=cfg.cutoff_radius, boxsize=L,
                                open_cap=128, m2l_cap=64, p2p_cap=96)
    half, ovf = halve_table(tree, lists.p2p, cfg.cutoff_radius, L,
                            cap=2 * lists.p2p.shape[1])
    assert not bool(ovf)
    h = np.asarray(half)
    t = np.asarray(lists.p2p)
    n_leaf = tree.n_leaf
    assert h.shape[0] == 2 * n_leaf
    assert h.min() >= -1 and h.max() < 2 * n_leaf
    # kept halves must come from the parent leaf's listed leaves
    for row in range(min(8, 2 * n_leaf)):
        kept_leaves = set((h[row][h[row] >= 0] // 2).tolist())
        listed = set(t[row // 2][t[row // 2] >= 0].tolist())
        assert kept_leaves <= listed
    # every target half keeps its own two halves (self-interaction)
    for row in range(2 * n_leaf):
        kept = set(h[row][h[row] >= 0].tolist())
        assert {2 * (row // 2), 2 * (row // 2) + 1} <= kept
    # the (half, half) pair volume shrank vs the leaf-pair volume
    assert (h >= 0).sum() < 4 * (t >= 0).sum()          # culled something


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
