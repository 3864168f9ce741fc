"""Pallas leaf-brick CIC kernels (pm/cic_pallas.py): paint/readout parity
with the XLA scatter/gather path, and the tree-shared PM engine path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from photons_tpu.config import SimConfig
from photons_tpu.pm.cic_pallas import (brick_origins, fold_halos,
                                       pad_periodic, paint_leaves,
                                       read_leaves)
from photons_tpu.pm.mesh import cic_paint, cic_read_vector
from photons_tpu.pm.solver import green_function, pm_accel, pm_accel_pallas
from photons_tpu.tree.morton import morton_sort

L = 50.0


def _leafify(pos, n_leaf, s):
    sorted_pos, perm = morton_sort(pos, 0.0, L, n_leaf * s - pos.shape[0])
    valid = (perm < pos.shape[0]).reshape(n_leaf, s)
    return sorted_pos.reshape(n_leaf, s, 3), valid, perm


def test_paint_kernel_matches_xla():
    rng = np.random.default_rng(0)
    n, s, n_leaf, tile = 16, 32, 64, 24
    pos = jnp.asarray(rng.uniform(0, L, (2000, 3)), jnp.float32)
    leaf_pos, valid, _ = _leafify(pos, n_leaf, s)
    origins, fits = brick_origins(leaf_pos, valid, n, tile, L)
    assert bool(jnp.all(fits))
    wts = valid.astype(jnp.float32)
    padded = paint_leaves(leaf_pos, wts, origins, n, tile, L, interpret=True)
    mesh = fold_halos(padded, n)
    ref = cic_paint(pos, L, n)
    np.testing.assert_allclose(np.asarray(mesh), np.asarray(ref),
                               rtol=0, atol=2e-5)
    # total mass conserved exactly enough
    assert float(jnp.sum(mesh)) == pytest.approx(2000.0, abs=1e-2)


def test_read_kernel_matches_xla():
    rng = np.random.default_rng(1)
    n, s, n_leaf, tile = 16, 32, 64, 24
    pos = jnp.asarray(rng.uniform(0, L, (2000, 3)), jnp.float32)
    leaf_pos, valid, perm = _leafify(pos, n_leaf, s)
    origins, fits = brick_origins(leaf_pos, valid, n, tile, L)
    assert bool(jnp.all(fits))
    field = jnp.asarray(rng.normal(size=(n, n, n)), jnp.float32)
    fields = tuple(pad_periodic(field * (c + 1), n) for c in range(3))
    vals = read_leaves(leaf_pos, fields, origins, n, tile, L, interpret=True)
    stacked = jnp.stack([field * (c + 1) for c in range(3)], axis=-1)
    ref = cic_read_vector(stacked, pos, L, n)
    got = np.moveaxis(np.asarray(vals), 1, 2).reshape(-1, 3)
    orig = np.zeros((perm.shape[0], 3), np.float32)
    orig[np.asarray(perm)] = got
    np.testing.assert_allclose(orig[:2000], np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_pm_accel_pallas_matches_xla():
    rng = np.random.default_rng(2)
    n = 16
    pos = jnp.asarray(rng.uniform(0, L, (3000, 3)), jnp.float32)
    gf = green_function(n, L, 1.25 * L / n, dtype=jnp.float32)
    ref = pm_accel(pos, gf, mass=2.0, boxsize=L, n_side=n)
    got, fits = pm_accel_pallas(pos, gf, mass=2.0, boxsize=L, n_side=n,
                                leaf_size=64, tile=24, interpret=True)
    assert bool(fits)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-5 * max(scale, 1.0))


def test_engine_tree_shared_pm_matches_xla_pm():
    """cic_backend='pallas': PM rides the FMM tree (pm_from_tree + shared
    scatter); total must match the engine with the XLA PM path."""
    from photons_tpu.sim import make_force_fn

    rng = np.random.default_rng(3)
    cfg = SimConfig(boxsize=L, n_side=16, n_part_total=2048, dtype="float32",
                    leaf_size=16, cic_backend="xla")
    pos = jnp.asarray(rng.uniform(0, L, (2048, 3)), jnp.float32)

    acc_x, pm_x, diag_x = jax.jit(make_force_fn(cfg, "fmm"))(pos)
    cfg_p = cfg.replace(cic_backend="pallas")
    acc_p, pm_p, diag_p = jax.jit(make_force_fn(cfg_p, "fmm"))(pos)
    assert not bool(diag_p["overflow"])

    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_x),
                               rtol=0, atol=1e-6)
    scale = float(jnp.abs(pm_x).max())
    np.testing.assert_allclose(np.asarray(pm_p), np.asarray(pm_x),
                               rtol=0, atol=3e-5 * max(scale, 1.0))


def test_straddler_residual_path_matches_xla():
    """Leaves whose CIC footprint exceeds the brick tile are routed through
    the XLA scatter/gather residual path (cfg.cic_straddler_cap) instead of
    flagging cic_overflow -- forces must match the XLA engine."""
    from photons_tpu.ops.fmm_engine import fmm_forces
    from photons_tpu.sim import make_force_fn

    rng = np.random.default_rng(5)
    # leaf_size=256 at N=2048 / n_side=64: every leaf spans ~L/2 >> 8 cells,
    # so ALL 8 leaves straddle and the residual path carries the whole PM
    cfg = SimConfig(boxsize=L, n_side=64, n_part_total=2048, dtype="float32",
                    leaf_size=256, cic_backend="xla", cic_tile=8,
                    cic_straddler_cap=8, sorted_state=False)
    pos = jnp.asarray(rng.uniform(0, L, (2048, 3)), jnp.float32)
    acc_x, pm_x, diag_x = jax.jit(make_force_fn(cfg, "fmm"))(pos)

    cfg_p = cfg.replace(cic_backend="pallas")
    (acc_p, pm_p), diag_p = jax.jit(
        lambda p: fmm_forces(p, cfg_p, pm_gf=green_function(
            64, L, cfg_p.split_radius, dtype=jnp.float32)))(pos)
    assert not bool(diag_p["cic_overflow"])
    scale = float(jnp.abs(pm_x).max())
    np.testing.assert_allclose(np.asarray(pm_p), np.asarray(pm_x),
                               rtol=0, atol=3e-5 * max(scale, 1.0))

    # more straddlers than the cap -> cic_overflow must flag
    cfg_t = cfg_p.replace(cic_straddler_cap=4)
    (_, _), diag_t = jax.jit(
        lambda p: fmm_forces(p, cfg_t, pm_gf=green_function(
            64, L, cfg_t.split_radius, dtype=jnp.float32)))(pos)
    assert bool(diag_t["cic_overflow"])


def test_mixed_straddler_residual_path_matches_xla():
    """Mixed regime (ADVICE round 2): mostly fitting leaves with a single
    straddler -- the Pallas paint must carry the fitting leaves' mass
    exactly once (no double count with the residual scatter) and the
    straddler overwrite must not corrupt neighboring non-straddler rows."""
    from photons_tpu.ops.fmm_engine import fmm_forces
    from photons_tpu.sim import make_force_fn
    from photons_tpu.tree.build import build_tree

    rng = np.random.default_rng(5)
    cfg = SimConfig(boxsize=L, n_side=64, n_part_total=2048, dtype="float32",
                    leaf_size=16, cic_backend="xla", cic_tile=32,
                    cic_straddler_cap=8, sorted_state=False)
    pos = jnp.asarray(rng.uniform(0, L, (2048, 3)), jnp.float32)

    # pin the regime: exactly a few straddlers among many fitting leaves
    tree = build_tree(pos, mass=1.0, leaf_size=16, lo=0.0, hi=L)
    _, fits = brick_origins(tree.pos, tree.mask, 64, 32, L)
    n_strad = int(jnp.sum(~fits))
    assert 1 <= n_strad <= 4, f"regime drifted: {n_strad} straddlers"
    assert int(jnp.sum(fits)) > 100

    acc_x, pm_x, _ = jax.jit(make_force_fn(cfg, "fmm"))(pos)
    cfg_p = cfg.replace(cic_backend="pallas")
    (acc_p, pm_p), diag_p = jax.jit(
        lambda p: fmm_forces(p, cfg_p, pm_gf=green_function(
            64, L, cfg_p.split_radius, dtype=jnp.float32)))(pos)
    assert not bool(diag_p["cic_overflow"])
    scale = float(jnp.abs(pm_x).max())
    np.testing.assert_allclose(np.asarray(pm_p), np.asarray(pm_x),
                               rtol=0, atol=3e-5 * max(scale, 1.0))
    np.testing.assert_allclose(np.asarray(acc_p), np.asarray(acc_x),
                               rtol=0, atol=1e-6)


def test_engine_interlaced_pm_matches_xla():
    """cfg.pm_interlace through the tree-shared Pallas path (pm_from_tree:
    two paints + two readouts with independent brick origins/straddler
    sets) must match the XLA pm_accel interlaced chain."""
    from photons_tpu.ops.fmm_engine import fmm_forces
    from photons_tpu.pm.solver import pm_accel

    rng = np.random.default_rng(7)
    cfg = SimConfig(boxsize=L, n_side=16, n_part_total=2048, dtype="float32",
                    leaf_size=16, cic_backend="pallas", pm_interlace=True)
    pos = jnp.asarray(rng.uniform(0, L, (2048, 3)), jnp.float32)
    gf = green_function(16, L, cfg.split_radius, dtype=jnp.float32)
    (acc_p, pm_p), diag = jax.jit(
        lambda p: fmm_forces(p, cfg, pm_gf=gf))(pos)
    assert not bool(diag["cic_overflow"])
    ref = pm_accel(pos, gf, mass=cfg.particle_mass, boxsize=L, n_side=16,
                   gradient=cfg.pm_gradient, interlace=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(pm_p), np.asarray(ref),
                               rtol=0, atol=3e-5 * max(scale, 1e-9))


def test_engine_interlaced_straddler_residual():
    """Interlaced PM with straddler leaves: the shifted paint/readout get
    their OWN straddler sets (a leaf can fit unshifted but straddle
    shifted); the residual path must keep parity with the XLA chain."""
    from photons_tpu.ops.fmm_engine import fmm_forces
    from photons_tpu.pm.solver import pm_accel

    rng = np.random.default_rng(5)
    # all leaves straddle (footprint >> tile): the whole PM -- both
    # interlace passes -- rides the XLA residual path
    cfg = SimConfig(boxsize=L, n_side=64, n_part_total=2048, dtype="float32",
                    leaf_size=256, cic_backend="pallas", cic_tile=8,
                    cic_straddler_cap=8, pm_interlace=True)
    pos = jnp.asarray(rng.uniform(0, L, (2048, 3)), jnp.float32)
    gf = green_function(64, L, cfg.split_radius, dtype=jnp.float32)
    (_, pm_p), diag = jax.jit(lambda p: fmm_forces(p, cfg, pm_gf=gf))(pos)
    assert not bool(diag["cic_overflow"])
    ref = pm_accel(pos, gf, mass=cfg.particle_mass, boxsize=L, n_side=64,
                   gradient=cfg.pm_gradient, interlace=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(pm_p), np.asarray(ref),
                               rtol=0, atol=3e-5 * max(scale, 1e-9))


def test_brick_overflow_flagged():
    """A too-small tile must flag, not silently drop mass."""
    rng = np.random.default_rng(4)
    n = 64                      # fine mesh -> footprints exceed 8 cells
    pos = jnp.asarray(rng.uniform(0, L, (2048, 3)), jnp.float32)
    gf = green_function(n, L, 1.25 * L / n, dtype=jnp.float32)
    _, fits = pm_accel_pallas(pos, gf, mass=1.0, boxsize=L, n_side=n,
                              leaf_size=256, tile=8, interpret=True)
    assert not bool(fits)
