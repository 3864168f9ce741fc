"""FMM engine tests: tree build invariants, traversal completeness, force
accuracy vs direct sum, and the TreePM (FMM+PM) total force vs the Ewald
oracle (SURVEY.md section 4, rebuild tests 2-4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from photons_tpu.config import SimConfig
from photons_tpu.ops.direct import direct_forces, ewald_forces
from photons_tpu.ops.fmm_engine import fmm_forces
from photons_tpu.ops.traversal import dual_tree_traversal
from photons_tpu.tree.build import build_tree

L = 50.0


def _cfg(**kw):
    base = dict(boxsize=L, n_side=32, n_part_total=2048, dtype="float64",
                leaf_size=16, open_angle=0.4)
    base.update(kw)
    return SimConfig(**base)


def _randpos(n, seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, L, (n, 3)))


# ---------------------------------------------------------------- tree --

def test_tree_mass_and_com():
    pos = _randpos(777, 1)
    t = build_tree(pos, mass=2.0, leaf_size=16, lo=0.0, hi=L)
    # root monopole = total mass, counts sum to N at every level
    assert float(t.moments[0][0, 0]) == pytest.approx(2.0 * 777, rel=1e-12)
    for c in t.counts:
        assert int(jnp.sum(c)) == 777
    # root dipole/M0 = -(com - center)*M -> com recovery
    com_ref = np.asarray(pos).mean(axis=0)
    m_root = np.asarray(t.moments[0][0])
    c_root = np.asarray(t.centers[0][0])
    com = c_root - m_root[1:4] / m_root[0]
    np.testing.assert_allclose(com, com_ref, rtol=1e-10)


def test_tree_leaf_blocks_cover_all_particles():
    pos = _randpos(500, 2)
    t = build_tree(pos, mass=1.0, leaf_size=16, lo=0.0, hi=L)
    assert int(t.mask.sum()) == 500
    # every original particle appears exactly once via perm
    back = np.full(t.perm.shape[0], -1)
    back[np.asarray(t.perm)] = np.arange(t.perm.shape[0])
    assert (back >= 0).all()


# ----------------------------------------------------------- traversal --

def test_traversal_covers_every_leaf_pair_exactly_once():
    """Fundamental FMM invariant: each (target leaf, source leaf) pair is in
    exactly one of {P2P, M2L(ancestor), discarded}."""
    pos = _randpos(512, 3)
    t = build_tree(pos, mass=1.0, leaf_size=16, lo=0.0, hi=L)
    lists = dual_tree_traversal(t, theta=0.4, cutoff=None, boxsize=None,
                                open_cap=512, m2l_cap=64, p2p_cap=256)
    n_leaf = t.n_leaf
    depth = t.depth
    cover = np.zeros((n_leaf, n_leaf), np.int32)

    p2p = np.asarray(lists.p2p)                # (n_leaf, cap) table
    for a, b in zip(*np.nonzero(p2p >= 0)):
        cover[a, p2p[a, b]] += 1
    for lvl, tbl in enumerate(lists.m2l):
        d = lvl + 1
        span = n_leaf >> d                     # leaves under a depth-d node
        arr = np.asarray(tbl)                  # (2^d, cap) table
        for a, b in zip(*np.nonzero(arr >= 0)):
            s = arr[a, b]
            cover[a * span:(a + 1) * span, s * span:(s + 1) * span] += 1
    # no cutoff -> nothing discarded: every nonempty pair covered once
    counts = np.asarray(t.counts[-1])
    ok = np.outer(counts > 0, counts > 0)
    assert (cover[ok] == 1).all()
    assert (cover[~ok] == 0).all()


def test_traversal_segmented_multipass_matches_single_pass():
    """Bounded-memory multi-pass (p2p_segment, the reference's LEN_TASK
    flush loop as a space-slice, 2_Redundant/src/fmm.c:921,377-418):
    leaf rows wider than p2p_cap are emitted over several disjoint
    passes whose union must equal the roomy single-pass table."""
    # a clustered blob: every blob leaf neighbors every other blob leaf
    rng = np.random.default_rng(9)
    blob = 0.5 * L + rng.normal(0.0, 0.02 * L, (1536, 3))
    bg = rng.uniform(0, L, (512, 3))
    pos = jnp.asarray(np.concatenate([blob, bg]) % L)
    t = build_tree(pos, mass=1.0, leaf_size=16, lo=0.0, hi=L)
    kw = dict(theta=0.4, cutoff=20.0, boxsize=L, open_cap=512, m2l_cap=64)

    roomy = dual_tree_traversal(t, p2p_cap=512, **kw)
    assert not bool(roomy.overflow), "regime drifted: needs wider caps"
    k_max = int(np.asarray((roomy.p2p >= 0).sum(axis=1)).max())
    cap = 32
    assert k_max > 2 * cap, f"regime drifted: k_max={k_max} too small"

    seg_tables = []
    s = 0
    while True:
        ls = dual_tree_traversal(t, p2p_cap=cap, p2p_segment=s, **kw)
        seg_tables.append(np.asarray(ls.p2p))
        if not bool(ls.overflow):
            break
        s += 1
    assert len(seg_tables) >= 3                  # genuinely multi-pass

    ref = np.asarray(roomy.p2p)
    for row in range(t.n_leaf):
        want = sorted(x for x in ref[row] if x >= 0)
        got = sorted(x for tbl in seg_tables for x in tbl[row] if x >= 0)
        assert got == want, f"row {row}: union of segments != single pass"


def test_traversal_quantized_and_tapered_caps_match_exact():
    """The packed u16 fixed-point MAC (quant_bounds) and the leaf-anchored
    open-cap schedule must reproduce the exact traversal's pair sets: the
    quantized classification is a conservative refinement whose slack
    (<= 3 grid units ~ 1e-4 of the box) is far below any inter-node gap at
    test scale, and IC-regime occupancy fits deep caps with margin
    (VERDICT r3 next-1: the deep levels are gather-bound, so these two
    knobs carry the flagship traversal speedup)."""
    from photons_tpu.ops.traversal import expand_open_caps

    pos = _randpos(4096, 12)
    t = build_tree(pos, mass=1.0, leaf_size=32, lo=0.0, hi=L)
    kw = dict(theta=0.4, cutoff=0.12 * L, boxsize=L,
              open_cap=128, m2l_cap=64, p2p_cap=128)
    exact = dual_tree_traversal(t, **kw)
    quant = dual_tree_traversal(
        t, quant_bounds=(0.0, L),
        open_caps=expand_open_caps((96, 64, 48), t.depth, 128), **kw)
    assert not bool(quant.overflow)

    def rowsets(tbl):
        return [frozenset(int(x) for x in row if x >= 0)
                for row in np.asarray(tbl)]
    assert rowsets(exact.p2p) == rowsets(quant.p2p)
    for ta, tb in zip(exact.m2l, quant.m2l):
        assert rowsets(ta) == rowsets(tb)


def test_fmm_engine_quantized_traversal_forces_match():
    """fmm_forces with cfg.traversal_quantized + open_cap_levels must give
    the same forces as the exact-MAC engine (same pair partition at test
    scale; physics kernels are untouched by the classification path)."""
    cfg = _cfg(n_part_total=2048, open_cap_per_node=128,
               p2p_neighbor_cap=192)
    pos = _randpos(2048, 13)
    acc0, d0 = fmm_forces(pos, cfg)
    cfgq = cfg.replace(traversal_quantized=True,
                       open_cap_levels=(96, 64, 48))
    acc1, d1 = fmm_forces(pos, cfgq)
    # conservative superset: the quantized discard horizon sits 3 grid
    # units beyond the exact one, so a few borderline pairs (gap within
    # ~2e-3 kpc of the cutoff) may be kept extra -- never lost
    assert int(d1["n_p2p"]) >= int(d0["n_p2p"])
    assert int(d1["n_p2p"]) <= int(d0["n_p2p"]) + 16
    assert not bool(d1["overflow"])
    # those extra pairs contribute only erfc-damped tail terms
    rms = float(jnp.sqrt((acc0 ** 2).sum(-1)).mean())
    diff = float(jnp.sqrt(((acc1 - acc0) ** 2).sum(-1)).max())
    assert diff / rms < 1e-4


def test_traversal_overflow_flag():
    pos = _randpos(2048, 4)
    t = build_tree(pos, mass=1.0, leaf_size=16, lo=0.0, hi=L)
    tiny = dual_tree_traversal(t, theta=0.4, cutoff=None, boxsize=None,
                               open_cap=2, m2l_cap=2, p2p_cap=2)
    assert bool(tiny.overflow)


def test_traversal_overflow_bits_name_the_tripped_cap():
    """overflow_bits must identify WHICH capacity tripped so elastic
    recovery grows only that knob (growing untripped caps permanently
    taxes every later step -- NEXT.md round-3 lead)."""
    from photons_tpu.ops.traversal import OVF_M2L, OVF_OPEN, OVF_P2P

    pos = _randpos(2048, 4)
    t = build_tree(pos, mass=1.0, leaf_size=16, lo=0.0, hi=L)

    tight_p2p = dual_tree_traversal(t, theta=0.4, cutoff=20.0, boxsize=L,
                                    open_cap=256, m2l_cap=128, p2p_cap=2)
    assert bool(tight_p2p.overflow)
    assert int(tight_p2p.overflow_bits) & OVF_P2P
    assert not int(tight_p2p.overflow_bits) & OVF_OPEN

    tight_open = dual_tree_traversal(t, theta=0.4, cutoff=20.0, boxsize=L,
                                     open_cap=2, m2l_cap=128, p2p_cap=256)
    assert bool(tight_open.overflow)
    assert int(tight_open.overflow_bits) & OVF_OPEN

    roomy = dual_tree_traversal(t, theta=0.4, cutoff=20.0, boxsize=L)
    assert not bool(roomy.overflow)
    assert int(roomy.overflow_bits) == 0


def test_grow_capacities_grows_only_named_caps():
    """Simulation._grow_capacities(kind='traversal', bits=OVF_P2P) must
    leave open/m2l caps untouched (selective elastic recovery)."""
    from photons_tpu.ops.traversal import OVF_P2P
    from photons_tpu.sim import Simulation

    cfg = _cfg(n_part_total=512, sorted_state=False)
    pos = _randpos(512, 6)
    sim = Simulation.from_arrays(cfg, pos, jnp.zeros_like(pos), engine="pm")
    o0, m0, p0 = (cfg.open_cap_per_node, cfg.m2l_cap_per_node,
                  cfg.p2p_neighbor_cap)
    sim._grow_capacities(kind="traversal", bits=OVF_P2P)
    assert sim.cfg.open_cap_per_node == o0
    assert sim.cfg.m2l_cap_per_node == m0
    assert sim.cfg.p2p_neighbor_cap > p0
    # bits=0 (unknown source) falls back to growing all three
    sim._grow_capacities(kind="traversal", bits=0)
    assert sim.cfg.open_cap_per_node > o0
    assert sim.cfg.m2l_cap_per_node > m0


# -------------------------------------------------------------- forces --

def test_fmm_periodic_vs_direct_damped():
    """Short-range FMM force (min-image periodic, erfc damping) vs the
    damped direct image sum: < 1e-3 rms (BASELINE.md budget)."""
    cfg = _cfg(n_part_total=2048)
    pos = _randpos(2048, 5)
    acc, diag = jax.jit(lambda p: fmm_forces(p, cfg))(pos)
    assert not bool(diag["overflow"])
    ref = direct_forces(pos, mass=cfg.particle_mass, eps=cfg.soften_scale,
                        split_radius=cfg.split_radius, boxsize=L, n_images=1)
    rms = float(jnp.sqrt((ref ** 2).sum(-1)).mean())
    err = np.sqrt(((np.asarray(acc) - np.asarray(ref)) ** 2).sum(-1))
    assert np.sqrt((err ** 2).mean()) / rms < 1e-3
    assert err.max() / rms < 5e-3


@pytest.mark.slow
def test_fmm_periodic_longshort_m2l_fires():
    """VERDICT weak #2: a periodic LONGSHORT regime where M2L genuinely
    contributes.  A coarse PM mesh widens the cutoff (cutoff = 5.625*L/16
    = 0.35*L) past the mid-level node scale, so the MAC accepts in-cutoff
    node pairs; accuracy must hold against the damped direct image sum."""
    cfg = _cfg(n_side=16, open_angle=0.6, n_part_total=4096, leaf_size=8,
               open_cap_per_node=1024, m2l_cap_per_node=512,
               p2p_neighbor_cap=1024)
    assert cfg.cutoff_radius < L / 2          # min-image validity
    pos = _randpos(4096, 5)
    acc, diag = jax.jit(lambda p: fmm_forces(p, cfg))(pos)
    assert not bool(diag["overflow"])
    assert int(diag["n_m2l"]) > 100           # the M2L stack earns its keep
    ref = direct_forces(pos, mass=cfg.particle_mass, eps=cfg.soften_scale,
                        split_radius=cfg.split_radius, boxsize=L, n_images=1)
    rms = float(jnp.sqrt((ref ** 2).sum(-1)).mean())
    err = np.sqrt(((np.asarray(acc) - np.asarray(ref)) ** 2).sum(-1))
    assert np.sqrt((err ** 2).mean()) / rms < 1e-3


def test_fmm_open_boundary_newtonian_with_m2l():
    """Open-boundary merger-style config: M2L must fire and the total must
    match the Newtonian direct sum."""
    cfg = _cfg(longshort=False, periodic=False, n_part_total=2048)
    rng = np.random.default_rng(6)
    a = rng.normal(size=(1024, 3)) * 2.0 + np.array([15.0, 25.0, 25.0])
    b = rng.normal(size=(1024, 3)) * 2.0 + np.array([35.0, 25.0, 25.0])
    pos = jnp.asarray(np.clip(np.concatenate([a, b]), 0.1, L - 0.1))
    acc, diag = jax.jit(lambda p: fmm_forces(p, cfg))(pos)
    assert int(diag["n_m2l"]) > 0
    ref = direct_forces(pos, mass=cfg.particle_mass, eps=cfg.soften_scale)
    rms = float(jnp.sqrt((ref ** 2).sum(-1)).mean())
    err = np.sqrt(((np.asarray(acc) - np.asarray(ref)) ** 2).sum(-1))
    assert np.sqrt((err ** 2).mean()) / rms < 1e-3


def test_treepm_total_force_vs_ewald():
    """The headline accuracy target: FMM short + PM long total force vs the
    exact periodic Ewald sum, < 1e-3 RMS (BASELINE.md)."""
    from photons_tpu.pm import green_function, pm_accel

    # accuracy configuration: split radius from a 32-cell grid but the PM
    # mesh refined 2x (rs = 2.5 mesh cells) -- the PM aliasing error drops
    # below 5e-4 there (see test_pm_error_converges_with_resolution)
    cfg = _cfg(n_part_total=1024, n_side=64, split_scale=1.25 * L / 32)
    pos = _randpos(1024, 7)
    m, eps, rs = cfg.particle_mass, cfg.soften_scale, cfg.split_radius

    acc_s, diag = jax.jit(lambda p: fmm_forces(p, cfg))(pos)
    assert not bool(diag["overflow"])
    gf = green_function(cfg.n_side, L, rs, dtype=jnp.float64)
    acc_pm = pm_accel(pos, gf, mass=m, boxsize=L, n_side=cfg.n_side)
    total = np.asarray(acc_s) + np.asarray(acc_pm)

    exact = ewald_forces(np.asarray(pos), m, L, rs, eps, n_images=2, k_max=40)
    rms = np.sqrt((exact ** 2).sum(-1).mean())
    err = np.sqrt(((total - exact) ** 2).sum(-1))
    assert np.sqrt((err ** 2).mean()) / rms < 1e-3


def test_fmm_momentum_conservation():
    cfg = _cfg(n_part_total=1024)
    pos = _randpos(1024, 8)
    acc, _ = jax.jit(lambda p: fmm_forces(p, cfg))(pos)
    # P2P is exactly antisymmetric; M2L/discard asymmetries are bounded by
    # the truncation error scale
    rms = float(jnp.sqrt((acc ** 2).sum(-1)).mean())
    assert np.abs(np.asarray(acc).sum(0)).max() < 1e-3 * rms * 1024


def test_open_boundary_engine_has_no_pm():
    """Without the Ewald split the tree computes the FULL Newtonian force;
    the engine must not add a PM solve on top (double-counted gravity) --
    regression for the merger model family."""
    from photons_tpu.sim import make_force_fn

    cfg = _cfg(longshort=False, periodic=False, n_part_total=256)
    pos = _randpos(256, 11)
    acc, acc_pm, _ = make_force_fn(cfg, engine="fmm")(pos)
    assert float(jnp.abs(acc_pm).max()) == 0.0
    ref = direct_forces(pos, mass=cfg.particle_mass, eps=cfg.soften_scale)
    rms = float(jnp.sqrt((ref ** 2).sum(-1)).mean())
    assert float(jnp.abs(acc - ref).max()) / rms < 1e-3


def test_p2p_passes_engine_union_and_overflow_semantics():
    """cfg.p2p_passes > 1: the engine runs extra p2p_cap-wide segments
    from ONE cached traversal (ops.traversal.p2p_segment_table -- no
    re-walk, VERDICT r4 weak-4/missing-5) and the result equals the
    roomy single-pass forces exactly; under-provisioned passes flag
    OVF_P2P (partial results -> elastic recovery adds a pass), enough
    passes clear it.  Reference: the LEN_TASK flush loop IS the
    production path (2_Redundant/src/fmm.c:921,377-418)."""
    from photons_tpu.config import SimConfig
    from photons_tpu.ops.fmm_engine import fmm_forces
    from photons_tpu.ops.traversal import OVF_P2P

    rng = np.random.default_rng(5)
    pos = jnp.asarray(np.concatenate([
        rng.uniform(0, L, (1024, 3)),
        np.mod(rng.normal(0, L / 200, (1024, 3)) + L / 2, L)]))
    base = dict(boxsize=L, n_side=16, n_part_total=2048, dtype="float64",
                leaf_size=8, open_cap_per_node=512, m2l_cap_per_node=64)

    cfg_big = SimConfig(**base, p2p_neighbor_cap=512, p2p_passes=1)
    acc_big, diag_big = jax.jit(
        lambda p: fmm_forces(p, cfg_big, p2p_backend="jnp"))(pos)
    assert not int(diag_big["overflow"])

    # measured: blob rows ~300 wide -> 5 x 64 covers, 3 x 64 does not
    cfg_seg = SimConfig(**base, p2p_neighbor_cap=64, p2p_passes=5)
    acc_seg, diag_seg = jax.jit(
        lambda p: fmm_forces(p, cfg_seg, p2p_backend="jnp"))(pos)
    assert not int(diag_seg["overflow"])
    np.testing.assert_allclose(np.asarray(acc_seg), np.asarray(acc_big),
                               atol=1e-15)

    cfg_few = SimConfig(**base, p2p_neighbor_cap=64, p2p_passes=3)
    _, diag_few = jax.jit(
        lambda p: fmm_forces(p, cfg_few, p2p_backend="jnp"))(pos)
    assert int(diag_few["overflow"])
    assert int(diag_few["overflow_bits"]) & OVF_P2P


def test_discard_margin_recovers_truncated_tail():
    """cfg.discard_margin inflates the near-field discard horizon
    (cfg.traversal_cutoff): the short-range force must move CLOSER to the
    damped direct image sum (the margin only adds erfc-damped tail pairs,
    never changes existing ones), and n_p2p must grow.  The lever for the
    Zel'dovich-IC truncation transient (fmm.c:306-314 discard semantics;
    VERDICT r4 missing-4)."""
    cfg = _cfg(n_part_total=2048, longshort=True)
    assert cfg.traversal_cutoff == cfg.cutoff_radius
    cfg_m = cfg.replace(discard_margin=0.3)
    assert cfg_m.traversal_cutoff == pytest.approx(1.3 * cfg.cutoff_radius)
    pos = _randpos(2048, 11)
    ref = direct_forces(pos, mass=cfg.particle_mass, eps=cfg.soften_scale,
                        split_radius=cfg.split_radius, boxsize=L, n_images=1)

    def err(acc):
        rms = float(jnp.sqrt((ref ** 2).sum(-1)).mean())
        e = np.sqrt(((np.asarray(acc) - np.asarray(ref)) ** 2).sum(-1))
        return np.sqrt((e ** 2).mean()) / rms

    acc0, d0 = jax.jit(lambda p: fmm_forces(p, cfg))(pos)
    acc1, d1 = jax.jit(lambda p: fmm_forces(p, cfg_m))(pos)
    assert not bool(d1["overflow"])
    assert int(d1["n_p2p"]) > int(d0["n_p2p"])
    assert err(acc1) <= err(acc0)
    assert err(acc1) < 1e-3
