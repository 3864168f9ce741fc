"""Auxiliary subsystem tests: memory accounting, native checkpoints,
adaptive stepping (SURVEY.md 5.1/5.4 + vestigial adaptive.h parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from photons_tpu.config import SimConfig
from photons_tpu.sim import Simulation
from photons_tpu.io.checkpoint import (load_checkpoint, resume_simulation,
                                       save_checkpoint)
from photons_tpu.utils.memory import (device_memory_report, format_memory,
                                      live_array_census)


def _cfg(**kw):
    base = dict(boxsize=50.0, n_side=32, n_part_total=256, dtype="float64",
                initial_redshift=49.0, output_path="/tmp/pt_aux")
    base.update(kw)
    return SimConfig(**base)


def test_memory_report_shapes():
    rep = device_memory_report()
    assert set(rep) == {"bytes_in_use", "peak_bytes_in_use", "bytes_limit"}
    assert isinstance(format_memory(), str)
    census = live_array_census(5)
    assert all(len(r) == 3 for r in census)


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 50.0, (256, 3))
    sim = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="pm")
    sim.run(n_steps=2, a_final=cfg.initial_scale_factor * 1.05)

    path = str(tmp_path / "run")
    save_checkpoint(path, cfg, sim.state)
    cfg2, arr = load_checkpoint(path)
    assert cfg2.n_part_total == 256
    np.testing.assert_array_equal(arr["pos"], np.asarray(sim.state.pos))

    # resumed simulation continues identically to an uninterrupted one
    sim2 = resume_simulation(path, engine="pm")
    a_end = cfg.initial_scale_factor * 1.10
    sim.run(n_steps=2, a_final=a_end)
    sim2.run(n_steps=2, a_final=a_end)
    np.testing.assert_allclose(np.asarray(sim2.state.pos),
                               np.asarray(sim.state.pos), rtol=1e-12)


def test_adaptive_stepping_refines():
    cfg = _cfg(n_part_total=128)
    rng = np.random.default_rng(1)
    # two very close particles force a small required timestep
    pos = rng.uniform(0, 50.0, (128, 3))
    pos[1] = pos[0] + np.array([0.9 * cfg.soften_scale, 0, 0])
    sim = Simulation.from_arrays(cfg, pos, np.zeros_like(pos),
                                 engine="direct")
    sim.run(n_steps=1, a_final=cfg.initial_scale_factor * 1.2,
            adaptive=True, eta=0.01)
    assert sim.max_adaptive_level >= 1
    assert np.isfinite(np.asarray(sim.state.pos)).all()


def test_adaptive_matches_fixed_when_smooth():
    """With a generous eta, adaptive must take level 0 and reproduce the
    fixed-step trajectory exactly."""
    cfg = _cfg(n_part_total=128)
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 50.0, (128, 3))
    a1 = cfg.initial_scale_factor * 1.02
    s1 = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="pm")
    s1.run(n_steps=2, a_final=a1)
    s2 = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="pm")
    s2.run(n_steps=2, a_final=a1, adaptive=True, eta=1e6)
    assert s2.max_adaptive_level == 0
    np.testing.assert_array_equal(np.asarray(s1.state.pos),
                                  np.asarray(s2.state.pos))


def test_elastic_capacity_recovery():
    """Starting with absurdly small traversal capacities, run() must
    detect the overflow, grow capacities, recompile, replay from the last
    verified state, and produce the same trajectory as a generously-sized
    run (elastic recovery: the reference aborts or silently truncates)."""
    from photons_tpu.sim import CapacityOverflowError

    rng = np.random.default_rng(7)
    pos = rng.uniform(0, 50.0, (256, 3))
    a1 = 0.02 * 1.05

    big = Simulation.from_arrays(_cfg(n_part_total=256, leaf_size=32), pos,
                                 np.zeros_like(pos), engine="fmm")
    big.run(n_steps=2, a_final=a1, check_interval=1)

    tiny_cfg = _cfg(n_part_total=256, leaf_size=32, open_cap_per_node=2,
                    m2l_cap_per_node=2, p2p_neighbor_cap=2)
    small = Simulation.from_arrays(tiny_cfg, pos, np.zeros_like(pos),
                                   engine="fmm")
    small.run(n_steps=2, a_final=a1, check_interval=1)
    assert small.cfg.open_cap_per_node > 2     # capacities were grown
    np.testing.assert_allclose(np.asarray(small.state.pos),
                               np.asarray(big.state.pos), rtol=1e-12)


def test_elastic_cic_tile_recovery():
    """A CIC straddler overflow must grow the CIC knobs (straddler cap and
    tile, not the traversal caps) and the rollback+replay recovery must
    yield BIT-IDENTICAL state to a fresh run configured with the grown
    knobs from step 0 -- the actual elastic-recovery guarantee.
    cic_straddler_cap=0 disables the XLA residual path so the overflow
    actually fires (with the default cap the handful of wide leaves here
    is silently absorbed -- that composition is covered by
    test_cic_recovery_composes_with_residual_path)."""
    rng = np.random.default_rng(11)
    pos = rng.uniform(0, 50.0, (256, 3))
    a1 = 0.02 * 1.05

    # leaf_size=64 spreads each Hilbert leaf's particles over most of the
    # box: with an 8-cell brick the CIC footprint cannot fit
    cfg0 = _cfg(n_part_total=256, leaf_size=64, cic_backend="pallas",
                cic_tile=8, cic_straddler_cap=0)
    tiny = Simulation.from_arrays(cfg0, pos, np.zeros_like(pos),
                                  engine="fmm")
    tiny.run(n_steps=2, a_final=a1, check_interval=1)
    # recovery grew the CIC knobs: the residual cap (primary) and, while
    # VMEM allows, the brick tile -- never the traversal caps
    assert tiny.cfg.cic_straddler_cap > 0
    assert tiny.cfg.cic_tile > 8
    assert tiny.cfg.open_cap_per_node == cfg0.open_cap_per_node

    # replay determinism: a run configured with the post-recovery knobs
    # from the start takes the exact same trajectory (same code paths),
    # so the comparison is bitwise, not merely close
    fresh = Simulation.from_arrays(tiny.cfg, pos, np.zeros_like(pos),
                                   engine="fmm")
    fresh.run(n_steps=2, a_final=a1, check_interval=1)
    np.testing.assert_array_equal(np.asarray(tiny.state.pos),
                                  np.asarray(fresh.state.pos))


def test_cic_recovery_composes_with_residual_path():
    """Residual path + elastic recovery compose: with a nonzero (but too
    small) cic_straddler_cap, straddlers beyond the cap flag cic_overflow;
    recovery doubles the cap, the residual path absorbs them, and the
    rollback+replay is bit-identical to a fresh run with the grown knobs.
    A generously-configured run provides the physics-level cross-check (it
    routes leaves through different paint paths -- Pallas brick vs XLA
    residual -- so agreement is at float-roundoff, not bitwise)."""
    rng = np.random.default_rng(12)
    pos = rng.uniform(0, 50.0, (512, 3))
    a1 = 0.02 * 1.05

    # leaf_size=64 over 512 uniform particles -> 8 wide leaves; a cap of 1
    # absorbs one and overflows on the rest
    tiny = Simulation.from_arrays(
        _cfg(n_part_total=512, leaf_size=64, cic_backend="pallas",
             cic_tile=8, cic_straddler_cap=1),
        pos, np.zeros_like(pos), engine="fmm")
    tiny.run(n_steps=2, a_final=a1, check_interval=1)
    assert tiny.cfg.cic_straddler_cap > 1
    assert tiny.cfg.cic_backend == "pallas"    # never fell back to XLA

    fresh = Simulation.from_arrays(tiny.cfg, pos, np.zeros_like(pos),
                                   engine="fmm")
    fresh.run(n_steps=2, a_final=a1, check_interval=1)
    np.testing.assert_array_equal(np.asarray(tiny.state.pos),
                                  np.asarray(fresh.state.pos))

    big = Simulation.from_arrays(
        _cfg(n_part_total=512, leaf_size=64, cic_backend="pallas"),
        pos, np.zeros_like(pos), engine="fmm")
    big.run(n_steps=2, a_final=a1, check_interval=1)
    np.testing.assert_allclose(np.asarray(tiny.state.pos),
                               np.asarray(big.state.pos),
                               rtol=0, atol=1e-6)


def test_block_timesteps_match_fixed_when_smooth():
    """Per-particle block stepping (kdk_level surface): with a generous eta
    every particle sits at level 0 and the scheme reduces EXACTLY to the
    fixed KDK step (the L=0 path is the same kick/drift/force sequence)."""
    cfg = _cfg(n_part_total=256, leaf_size=16)
    rng = np.random.default_rng(4)
    pos = rng.uniform(0, 50.0, (256, 3))
    a1 = cfg.initial_scale_factor * 1.05
    s1 = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="fmm")
    s1.run(n_steps=2, a_final=a1)
    s2 = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="fmm")
    s2.run(n_steps=2, a_final=a1, adaptive="block", eta=1e6)
    assert s2.max_adaptive_level == 0
    np.testing.assert_allclose(np.asarray(s1.state.pos),
                               np.asarray(s2.state.pos), rtol=0, atol=1e-13)


def test_block_timesteps_sorted_fast_path():
    """The production-speed block path (sorted fused substeps with
    within-macro Verlet-list reuse, VERDICT r3 next-3) must reduce to the
    fixed sorted step at level 0 up to the skin-inflated cutoff's extra
    erfc-tail pairs, and refine without blowing up."""
    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config

    n = 8
    cfg = lcdm_config(n_part=n ** 3, n_side=2 * n, leaf_size=32,
                      dtype="float64", sorted_state=True,
                      cic_backend="pallas")
    cfg = cfg.replace(split_scale=1.75 * cfg.boxsize / (2 * n))
    pos0, vel0 = ic_zeldovich(cfg, seed=4)
    a1 = cfg.initial_scale_factor * 1.1

    s1 = Simulation.from_arrays(cfg, pos0, vel0, engine="fmm")
    s1.run(n_steps=2, a_final=a1)
    o1 = np.asarray(s1.state.pos)[np.argsort(np.asarray(s1.state.ids))]

    s2 = Simulation.from_arrays(cfg, pos0, vel0, engine="fmm")
    s2.run(n_steps=2, a_final=a1, adaptive="block", eta=1e9)
    assert s2._block_fast, "sorted+pallas-cic config must take the fast path"
    assert s2.max_adaptive_level == 0
    o2 = np.asarray(s2.state.pos)[np.argsort(np.asarray(s2.state.ids))]
    # not bit-identical: the macro-open lists use the Verlet-skin-inflated
    # cutoff, keeping extra (erfc-damped) tail pairs the fixed engine
    # truncates -- a closer match to the untruncated force
    assert np.abs(o2 - o1).max() < 1e-4 * cfg.boxsize

    s3 = Simulation.from_arrays(cfg, pos0, vel0, engine="fmm")
    s3.run(n_steps=2, a_final=a1, adaptive="block", eta=1e-4, max_level=2)
    assert s3.max_adaptive_level >= 1
    # substep count of the LAST macro step (2^level_max of that macro)
    assert int(s3.last_diag["n_force_evals"]) >= 2
    o3 = np.asarray(s3.state.pos)[np.argsort(np.asarray(s3.state.ids))]
    assert np.isfinite(o3).all()
    assert np.abs(o3 - o1).max() < 1e-3 * cfg.boxsize


def test_block_timesteps_newtonian_merger_ladder():
    """Block stepping on the Newtonian/open-boundary family (the merger)
    through the one-jit substep ladder: macro bounds are TIME, no PM
    phase, kick/drift tables linear (sim.make_ladder newtonian branch).
    Level-0 parity with the fixed newtonian step, and refinement stays
    finite with a dense core."""
    from photons_tpu.models.merger import merger_config, ic_merger

    cfg = merger_config(n_part=512, leaf_size=32, newtonian=True,
                        sorted_state=True, open_cap_per_node=256,
                        p2p_neighbor_cap=256, dtype="float64",
                        verlet_skin=0.5)
    pos, vel = ic_merger(cfg, seed=7)
    t1 = 0.02

    s1 = Simulation.from_arrays(cfg, pos, vel, engine="fmm", a=0.0)
    s1.run(n_steps=2, a_final=t1)
    o1 = np.asarray(s1.state.pos)[np.argsort(np.asarray(s1.state.ids))]

    s2 = Simulation.from_arrays(cfg, pos, vel, engine="fmm", a=0.0)
    s2.run(n_steps=2, a_final=t1, adaptive="block", eta=1e9)
    assert s2._block_fast, "sorted open-boundary config must take the " \
        "ladder path"
    assert s2.max_adaptive_level == 0
    assert float(s2.state.a) == pytest.approx(t1, rel=1e-12)
    o2 = np.asarray(s2.state.pos)[np.argsort(np.asarray(s2.state.ids))]
    # level 0 == fixed step up to the skin-inflated list margin (open
    # boundary: lists are MAC-classified, the margin only adds pairs)
    assert np.abs(o2 - o1).max() < 1e-6 * cfg.boxsize

    s3 = Simulation.from_arrays(cfg, pos, vel, engine="fmm", a=0.0)
    s3.run(n_steps=2, a_final=t1, adaptive="block", eta=1e-3, max_level=3)
    assert s3.max_adaptive_level >= 1
    o3 = np.asarray(s3.state.pos)[np.argsort(np.asarray(s3.state.ids))]
    assert np.isfinite(o3).all()


def test_block_timesteps_refine_per_particle():
    """A tight pair forces high levels for ITS particles while the smooth
    background stays at level 0; trajectory stays finite and momentum is
    conserved (the per-particle refinement the reference only declares,
    inc/adaptive.h:12-20)."""
    cfg = _cfg(n_part_total=128, leaf_size=16)
    rng = np.random.default_rng(5)
    pos = rng.uniform(0, 50.0, (128, 3))
    pos[1] = pos[0] + np.array([1.5 * cfg.soften_scale, 0, 0])
    sim = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="fmm")
    sim.run(n_steps=1, a_final=cfg.initial_scale_factor * 1.2,
            adaptive="block", eta=0.01, max_level=4)
    assert sim.max_adaptive_level >= 1
    assert np.isfinite(np.asarray(sim.state.pos)).all()
    # block steps kick pair members at different cadences, so momentum is
    # conserved only to the force-variation scale (not machine precision)
    v = np.asarray(sim.state.vel)
    assert np.abs(v.sum(0)).max() < 1e-4 * np.abs(v).max() * len(v)


def test_block_timesteps_gated_forces_match_full():
    """Gating P2P rows by the active mask must not change active particles'
    forces: compare a gated evaluation against the full one."""
    import jax
    from photons_tpu.ops.fmm_engine import fmm_forces

    cfg = _cfg(n_part_total=512, leaf_size=16)
    rng = np.random.default_rng(6)
    pos = jnp.asarray(rng.uniform(0, 50.0, (512, 3)))
    active = jnp.asarray(rng.uniform(size=512) < 0.3)
    full, _ = jax.jit(lambda p: fmm_forces(p, cfg))(pos)
    gated, _ = jax.jit(lambda p, a: fmm_forces(p, cfg, active=a))(pos, active)
    np.testing.assert_allclose(np.asarray(gated)[np.asarray(active)],
                               np.asarray(full)[np.asarray(active)],
                               rtol=0, atol=1e-12)
