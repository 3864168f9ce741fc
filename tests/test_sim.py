"""End-to-end KDK integration tests (PM-only and direct+PM engines)."""

import numpy as np
import jax.numpy as jnp
import pytest

from photons_tpu import cosmology
from photons_tpu.config import SimConfig
from photons_tpu.sim import Simulation
from photons_tpu.ics import ic_grid


def _cfg(**kw):
    base = dict(boxsize=50.0, n_side=32, n_part_total=512, omega_m=0.25,
                omega_x=0.75, hubble=0.7, initial_redshift=49.0,
                dtype="float64", output_path="/tmp/photons_tpu_test")
    base.update(kw)
    return SimConfig(**base)


def test_momentum_conservation_pm_only():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, cfg.boxsize, (cfg.n_part_total, 3))
    sim = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="pm")
    sim.run(n_steps=5, a_final=cfg.initial_scale_factor * 1.2)
    ptot = np.asarray(sim.state.vel).sum(axis=0)
    vrms = np.sqrt((np.asarray(sim.state.vel) ** 2).sum(-1)).mean()
    assert np.abs(ptot).max() < 1e-8 * max(vrms, 1e-30) * cfg.n_part_total


def test_uniform_grid_stays_uniform():
    """A perfect lattice exerts (almost) no PM force on itself; velocities
    must stay ~zero over several steps."""
    cfg = _cfg(n_part_total=8**3)
    pos, vel = ic_grid(cfg)
    sim = Simulation.from_arrays(cfg, pos, vel, engine="pm")
    sim.run(n_steps=3, a_final=cfg.initial_scale_factor * 1.1)
    # velocity growth scale: dkh * typical_one_particle_force
    acc_scale = cfg.particle_mass / (cfg.boxsize / 8) ** 2 * cfg.grav_const
    v = np.abs(np.asarray(sim.state.vel)).max()
    assert v < 1e-6 * acc_scale


def test_zeldovich_linear_growth():
    """A single plane wave must grow with the linear growth factor D(a).

    Validates PM forces + KDK factors + cosmology end to end: evolve
    a 16^3 lattice with a small x-displacement wave from a=0.02 to a=0.04
    and compare the displacement amplitude ratio with D(0.04)/D(0.02).
    """
    cfg = _cfg(n_part_total=16**3, n_side=32, boxsize=100.0, dtype="float64")
    a0, a1 = cfg.initial_scale_factor, 2 * cfg.initial_scale_factor
    L = cfg.boxsize
    lattice, _ = ic_grid(cfg)

    # Zel'dovich plane wave: current displacement d0 = A sin(k q_x) x_hat
    k = 2 * np.pi / L
    amp = 0.005 * L / 16          # well inside linear regime
    d0 = np.zeros_like(lattice)
    d0[:, 0] = amp * np.sin(k * lattice[:, 0])
    pos = np.mod(lattice + d0, L)

    # growing mode: x = q + D(a)/D(a0) d0; internal velocity u = a^2 xdot
    # -> u(a0) = a0^2 H(a0) f(a0) d0
    h0 = cosmology.hubble(a0, cfg.omega_m, cfg.omega_x)
    om_a = cfg.omega_m / (cfg.omega_m + cfg.omega_x * a0**3)
    f = om_a**0.55
    vel = a0**2 * h0 * f * d0

    sim = Simulation.from_arrays(cfg, pos, vel, engine="pm", a=a0)
    sim.run(n_steps=24, a_final=a1)

    disp = np.asarray(sim.state.pos) - lattice
    disp -= L * np.round(disp / L)
    # project onto the wave to get the evolved amplitude
    basis = np.sin(k * lattice[:, 0])
    measured = np.mean(disp[:, 0] * basis) / np.mean(basis**2) / amp
    expected = cosmology.growth_factor(a1, cfg.omega_m, cfg.omega_x,
                                       normalize_at=a0)
    assert measured == pytest.approx(expected, rel=0.02)


def test_snapshot_written_during_run(tmp_path):
    cfg = _cfg(output_path=str(tmp_path), output_name="snap")
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, cfg.boxsize, (64, 3))
    cfg = cfg.replace(n_part_total=64)
    sim = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="pm")
    a_mid = cfg.initial_scale_factor * 1.05
    sim.run(n_steps=4, a_final=cfg.initial_scale_factor * 1.1,
            snapshot_times=(a_mid,))
    files = list(tmp_path.iterdir())
    assert any(f.name.startswith("snap_") for f in files)


def test_direct_engine_runs():
    cfg = _cfg(n_part_total=128)
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, cfg.boxsize, (128, 3))
    sim = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="direct")
    sim.run(n_steps=2, a_final=cfg.initial_scale_factor * 1.05)
    assert np.isfinite(np.asarray(sim.state.pos)).all()
    assert float(jnp.abs(sim.state.acc).max()) > 0  # short-range engaged


def test_ic_zeldovich_growing_mode_consistency():
    """ic_zeldovich must seed the growing mode: evolving its output with
    the PM engine reproduces D(a)^2 growth of P(k) at low k (this caught a
    1/a0 velocity-normalization bug)."""
    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.diagnostics import power_spectrum

    cfg = _cfg(n_part_total=16**3, n_side=32, boxsize=100.0)
    pos, vel = ic_zeldovich(cfg, seed=3, amplitude=0.02)
    a0 = cfg.initial_scale_factor
    a1 = 2 * a0
    k_i, p_i, _ = power_spectrum(pos, cfg.boxsize, 16)
    sim = Simulation.from_arrays(cfg, pos, vel, engine="pm")
    sim.run(n_steps=16, a_final=a1)
    k_f, p_f, _ = power_spectrum(np.asarray(sim.state.pos), cfg.boxsize, 16)
    expected = cosmology.growth_factor(a1, cfg.omega_m, cfg.omega_x,
                                       normalize_at=a0) ** 2
    # PM-only force misses the erfc short-range part, so only the lowest-k
    # bin (split filter ~ 0.94 there) tracks the full growth; the TreePM
    # engine matches D^2 to <1% at all low-k bins (verified on TPU)
    ratio0 = float(p_f[0] / p_i[0])
    assert ratio0 == pytest.approx(expected, rel=0.08)


def test_ic_zeldovich_lcdm_spectrum():
    """'lcdm' spectral shape: EH98 transfer function -> P(k) turns over
    (less relative power at the smallest scales than a pure power law)."""
    from photons_tpu.ics import ic_zeldovich, eisenstein_hu_pk
    from photons_tpu.diagnostics import power_spectrum

    # transfer function sanity: T->1 at low k, decreasing
    import numpy as np
    k = np.array([1e-4, 1e-2, 1.0, 10.0])
    pk = eisenstein_hu_pk(k)
    t2 = pk / k**0.96
    assert t2[0] == pytest.approx(1.0, rel=1e-2)
    assert (np.diff(t2) < 0).all()

    cfg = _cfg(n_part_total=16**3, boxsize=100000.0)
    pos, vel = ic_zeldovich(cfg, seed=1, spectral_index="lcdm",
                            amplitude=0.03)
    assert np.isfinite(pos).all() and np.isfinite(vel).all()
    assert pos.min() >= 0 and pos.max() < cfg.boxsize
    k_m, p_m, _ = power_spectrum(pos, cfg.boxsize, 16)
    assert np.isfinite(p_m).all()


def test_sorted_state_matches_unsorted():
    """cfg.sorted_state keeps particles in tree order across steps (kills
    the unsort scatter); undoing the permutation via state.ids must
    reproduce the canonical-order trajectory, in both step dispatch modes."""
    cfg = SimConfig(boxsize=50.0, n_side=32, n_part_total=512,
                    dtype="float64", leaf_size=16)
    rng = np.random.default_rng(37)
    pos = rng.uniform(0, 50.0, (512, 3))
    a1 = cfg.initial_scale_factor * 1.05

    ref = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="fmm")
    ref.run(n_steps=3, a_final=a1)
    for fused in (True, False):
        s = Simulation.from_arrays(
            cfg.replace(sorted_state=True, fused_step=fused), pos,
            np.zeros_like(pos), engine="fmm")
        s.run(n_steps=3, a_final=a1)
        ids = np.asarray(s.state.ids)
        assert sorted(ids.tolist()) == list(range(512))   # a permutation
        order = np.argsort(ids)
        np.testing.assert_allclose(np.asarray(s.state.pos)[order],
                                   np.asarray(ref.state.pos),
                                   rtol=0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(s.state.vel)[order],
                                   np.asarray(ref.state.vel),
                                   rtol=0, atol=1e-9)


def test_list_reuse_matches_per_step_rebuild():
    """cfg.list_reuse=3 (Verlet-list amortization: traversal rebuilt every
    3rd step, geometry/multipoles refreshed in between) must track the
    rebuild-every-step trajectory.  Exact equality is not expected: the
    reuse config's lists include the erfc-damped pairs in the skin shell
    [cutoff, cutoff*(1+skin)], which the per-step config truncates."""
    cfg = SimConfig(boxsize=50.0, n_side=32, n_part_total=512,
                    dtype="float64", leaf_size=16, sorted_state=True)
    rng = np.random.default_rng(43)
    pos = rng.uniform(0, 50.0, (512, 3))
    a1 = cfg.initial_scale_factor * 1.08

    ref = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="fmm")
    ref.run(n_steps=6, a_final=a1)
    s = Simulation.from_arrays(cfg.replace(list_reuse=3, verlet_skin=0.3),
                               pos, np.zeros_like(pos), engine="fmm")
    s.run(n_steps=6, a_final=a1)
    assert not s.last_diag.get("skin_overflow", 0)
    order = np.argsort(np.asarray(s.state.ids))
    order_r = np.argsort(np.asarray(ref.state.ids))
    np.testing.assert_allclose(np.asarray(s.state.pos)[order],
                               np.asarray(ref.state.pos)[order_r],
                               rtol=0, atol=1e-6 * cfg.boxsize)


def test_verlet_skin_monitor():
    """The reuse-step drift monitor must flag exactly when some particle
    moved more than verlet_skin*cutoff/2 since the rebuild."""
    from photons_tpu.ops.fmm_engine import fmm_forces, fmm_forces_reuse

    cfg = SimConfig(boxsize=50.0, n_side=32, n_part_total=256,
                    dtype="float64", leaf_size=16, sorted_state=True,
                    list_reuse=2, verlet_skin=0.2)
    rng = np.random.default_rng(47)
    pos = rng.uniform(0, 50.0, (256, 3))
    (_, pos_s, _, lists), _ = fmm_forces(pos, cfg, layout="sorted",
                                         return_lists=True)
    pos_s = np.asarray(pos_s)
    half_skin = 0.5 * cfg.verlet_skin * cfg.cutoff_radius

    small = pos_s.copy()
    small[7] = (small[7] + 0.9 * half_skin / np.sqrt(3)) % cfg.boxsize
    _, diag = fmm_forces_reuse(jnp.asarray(small), lists,
                               jnp.asarray(pos_s), cfg)
    assert not bool(diag["skin_overflow"])

    big = pos_s.copy()
    big[7] = (big[7] + 1.1 * half_skin / np.sqrt(3)) % cfg.boxsize
    _, diag = fmm_forces_reuse(jnp.asarray(big), lists,
                               jnp.asarray(pos_s), cfg)
    assert bool(diag["skin_overflow"])


def test_sorted_state_snapshot_order(tmp_path):
    """Snapshots from a sorted-state run must be written in IC order
    (bit-comparable with unsorted runs)."""
    from photons_tpu.io.gadget import read_gadget

    cfg = SimConfig(boxsize=50.0, n_side=32, n_part_total=512,
                    dtype="float64", leaf_size=16,
                    output_path=str(tmp_path), output_name="srt")
    rng = np.random.default_rng(41)
    pos = rng.uniform(0, 50.0, (512, 3))
    sim = Simulation.from_arrays(cfg.replace(sorted_state=True), pos,
                                 np.zeros_like(pos), engine="fmm")
    sim.compute_forces()
    path = sim.write_snapshot()
    _, pos_disk, _ = read_gadget(path)
    # compute_forces reordered state into tree order, but disk order must
    # match the IC order (f32 on disk)
    np.testing.assert_allclose(pos_disk, pos.astype(np.float32), rtol=0,
                               atol=1e-5)


def test_split_step_matches_fused():
    """fused_step=False (separate kick/FMM/PM device programs -- the 256^3
    HBM-ceiling mode) must reproduce the fused one-jit trajectory."""
    from photons_tpu.config import SimConfig
    from photons_tpu.sim import Simulation

    cfg = SimConfig(boxsize=50.0, n_side=32, n_part_total=512,
                    dtype="float64", leaf_size=16)
    rng = np.random.default_rng(31)
    pos = rng.uniform(0, 50.0, (512, 3))
    a1 = cfg.initial_scale_factor * 1.05

    s1 = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="fmm")
    s1.run(n_steps=3, a_final=a1)
    s2 = Simulation.from_arrays(cfg.replace(fused_step=False), pos,
                                np.zeros_like(pos), engine="fmm")
    s2.run(n_steps=3, a_final=a1)
    np.testing.assert_allclose(np.asarray(s1.state.pos),
                               np.asarray(s2.state.pos), rtol=0, atol=1e-12)


def test_hbm_frugal_stepping_matches_default():
    """cfg.hbm_frugal=True (the 512^3 memory choreography: donated fused
    step, deferred acc placeholders, host-side rollback state) is
    numerically identical to the default path -- sorted AND unsorted."""
    cfg = SimConfig(boxsize=50.0, n_side=16, n_part_total=512,
                    dtype="float64", leaf_size=16)
    rng = np.random.default_rng(11)
    pos = rng.uniform(0, 50.0, (512, 3))
    a1 = cfg.initial_scale_factor * 1.05
    for sorted_state in (False, True):
        base = cfg.replace(sorted_state=sorted_state)
        ref = Simulation.from_arrays(base, pos, np.zeros_like(pos),
                                     engine="fmm")
        ref.run(n_steps=3, a_final=a1)
        fr = Simulation.from_arrays(base.replace(hbm_frugal=True), pos,
                                    np.zeros_like(pos), engine="fmm")
        fr.run(n_steps=3, a_final=a1)
        key = lambda p: np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
        pr, pf = np.asarray(ref.state.pos), np.asarray(fr.state.pos)
        np.testing.assert_allclose(pf[key(pf)], pr[key(pr)],
                                   rtol=0, atol=1e-12)


def test_recovery_engages_segmented_multipass():
    """Elastic recovery at the p2p cap budget switches to segmented
    passes (cfg.p2p_passes) instead of growing the table without bound --
    the run COMPLETES on a state whose neighbor rows exceed the budget,
    where round-4 recovery would grow caps until HBM OOM.  Reference:
    LEN_TASK flushing is the production path (2_Redundant/src/
    fmm.c:921,377-418)."""
    rng = np.random.default_rng(5)
    pos = np.concatenate([
        rng.uniform(0, 50.0, (1024, 3)),
        np.mod(rng.normal(0, 50.0 / 200, (1024, 3)) + 25.0, 50.0)])
    cfg = SimConfig(boxsize=50.0, n_side=16, n_part_total=2048,
                    dtype="float64", leaf_size=8,
                    open_cap_per_node=512, m2l_cap_per_node=64,
                    p2p_neighbor_cap=64, p2p_cap_budget=96)
    a1 = cfg.initial_scale_factor * 1.02

    sim = Simulation.from_arrays(cfg, pos, np.zeros_like(pos), engine="fmm")
    sim.run(n_steps=1, a_final=a1)
    assert sim.recoveries > 0
    assert sim.cfg.p2p_passes > 1                    # fallback engaged
    assert sim.cfg.p2p_neighbor_cap <= cfg.p2p_cap_budget

    # forces equal the roomy no-recovery configuration
    roomy = Simulation.from_arrays(
        cfg.replace(p2p_neighbor_cap=512), pos, np.zeros_like(pos),
        engine="fmm")
    roomy.run(n_steps=1, a_final=a1)
    assert roomy.recoveries == 0
    np.testing.assert_allclose(np.asarray(sim.state.pos),
                               np.asarray(roomy.state.pos),
                               rtol=0, atol=1e-12)
