"""Multi-chip (8 virtual CPU devices) tests: pencil FFT, migration, ghost
halo, rebalancing, and the full sharded step vs single-device evolution
(SURVEY.md section 4, rebuild test 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from photons_tpu.parallel.step import shard_map

from photons_tpu.config import SimConfig
from photons_tpu.parallel.fft import green_function_yslice, pencil_poisson
from photons_tpu.parallel.halo import gather_ghosts
from photons_tpu.parallel.migrate import migrate
from photons_tpu.parallel.step import (ShardedSimulation, gather_state,
                                       make_sharded_state, rebalance_bounds)

L = 50.0


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


def test_pencil_fft_matches_single_device(mesh):
    from photons_tpu.pm.solver import green_function, pm_potential

    n, rs = 32, 1.953
    dens = jnp.asarray(np.random.default_rng(0).normal(size=(n, n, n)))
    phi_ref = pm_potential(dens, green_function(n, L, rs, dtype=jnp.float64))
    gfp = green_function_yslice(n, L, rs, jnp.float64)
    f = shard_map(lambda d_, g_: pencil_poisson(d_, g_, "x"), mesh=mesh,
                  in_specs=(P("x"), P(None, "x", None)), out_specs=P("x"),
                  check_rep=False)
    np.testing.assert_allclose(np.asarray(f(dens, gfp)),
                               np.asarray(phi_ref), atol=1e-12)


def test_migration_routes_all_particles(mesh):
    d = 8
    cap = 64
    rng = np.random.default_rng(1)
    # every shard starts with particles spread over the whole box
    pos = jnp.asarray(rng.uniform(0, L, (d * cap, 3)))
    vel = jnp.asarray(rng.normal(size=(d * cap, 3)))
    valid = jnp.asarray(rng.uniform(size=(d * cap,)) < 0.5)
    bounds = jnp.asarray(np.linspace(0, L, d + 1))

    f = shard_map(
        lambda p, v, m, b: migrate((p, v), m, b, send_cap=cap, axis="x"),
        mesh=mesh, in_specs=(P("x"), P("x"), P("x"), P()),
        out_specs=((P("x"), P("x")), P("x"), P()), check_rep=False)
    (pos2, vel2), valid2, ovf = f(pos, vel, valid, bounds)
    assert not bool(ovf)

    # conservation: same multiset of particles
    a = np.asarray(pos)[np.asarray(valid)]
    b = np.asarray(pos2)[np.asarray(valid2)]
    assert len(a) == len(b)
    np.testing.assert_allclose(np.sort(a, axis=0), np.sort(b, axis=0),
                               rtol=1e-12)
    # ownership: every valid particle sits in its shard's slab
    v2 = np.asarray(valid2).reshape(d, cap)
    x2 = np.asarray(pos2)[:, 0].reshape(d, cap)
    for i in range(d):
        xs = x2[i][v2[i]]
        assert ((xs >= i * L / d) & (xs < (i + 1) * L / d)).all()


def test_ghost_halo_completeness(mesh):
    d, cap = 8, 32
    cutoff = 9.0                      # > slab width: needs 2+ hops
    rng = np.random.default_rng(2)
    bounds = np.linspace(0, L, d + 1)
    # one particle per shard at a known x
    pos = np.zeros((d * cap, 3))
    valid = np.zeros((d * cap,), bool)
    for i in range(d):
        pos[i * cap] = [(i + 0.5) * L / d, 25.0, 25.0]
        valid[i * cap] = True
    n_hops = 3

    f = shard_map(
        lambda p, v, b: gather_ghosts(p, v, b, cutoff, L, cap, n_hops, "x"),
        mesh=mesh, in_specs=(P("x"), P("x"), P()),
        out_specs=(P("x"), P("x"), P(), P()), check_rep=False)
    gpos, gval, ovf, bad = f(jnp.asarray(pos), jnp.asarray(valid),
                             jnp.asarray(bounds))
    assert not bool(ovf) and not bool(bad)
    # shard 0 must see exactly the particles within cutoff of its slab
    # (min-image): shard 1 at x=9.375 (gap 3.125) and shard 7 at x=46.875
    # (wrapped gap 3.125); shards 2/6 sit 9.375 away -- just beyond cutoff
    gp = np.asarray(gpos).reshape(d, -1, 3)
    gv = np.asarray(gval).reshape(d, -1)
    seen_x = set(np.round(gp[0][gv[0]][:, 0], 3))
    assert seen_x == {9.375, 46.875}


def test_rebalance_moves_toward_equal_cost():
    bounds = jnp.asarray(np.linspace(0, L, 9))
    cost = jnp.asarray([8.0, 1, 1, 1, 1, 1, 1, 1])   # shard 0 overloaded
    nb = np.asarray(rebalance_bounds(bounds, cost))
    assert nb[1] < float(bounds[1])   # boundary moves into shard 0
    assert (np.diff(nb) > 0).all()
    assert nb[0] == 0 and nb[-1] == L


def test_sharded_step_matches_single_device(mesh):
    from photons_tpu.sim import Simulation

    # SHIPPED defaults (pm_interlace='read', pm_gradient='fd4k'): the
    # sharded PM implements the full single-chip accuracy state (in-trace
    # pencil Green, k-space gradient, interlaced readout + momentum
    # projection), so default-config parity compares identical numerics
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=512, dtype="float64",
                    leaf_size=16, initial_redshift=49.0)
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, L, (512, 3))
    vel = rng.normal(size=(512, 3)) * 1e-4

    sim1 = Simulation.from_arrays(cfg, pos, vel, engine="fmm")
    a1 = cfg.initial_scale_factor * 1.05
    sim1.run(n_steps=2, a_final=a1)

    sim8 = ShardedSimulation.from_arrays(cfg, mesh, pos, vel)
    sim8.run(n_steps=2, a_final=a1)
    assert not int(sim8.last_diag["overflow"])

    p1 = np.asarray(sim1.state.pos)
    p8, v8, _ = gather_state(sim8.state)
    assert len(p8) == 512
    key = lambda p: np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    np.testing.assert_allclose(p1[key(p1)], p8[key(p8)], atol=1e-5)


def test_toptree_global_invariants(mesh):
    """domain_tree_moments: global root monopole = total mass, COM correct
    (connect_local_toptree + walk_toptree_m2m parity)."""
    from photons_tpu.parallel.toptree import domain_tree_moments
    from photons_tpu.tree.build import build_tree

    rng = np.random.default_rng(5)
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=512, dtype="float64")
    state = make_sharded_state(cfg, mesh, rng.uniform(0, L, (512, 3)),
                               np.zeros((512, 3)), 0.02)

    def body(pos, valid):
        t = build_tree(pos, mass=2.0, leaf_size=16, lo=0.0, hi=L,
                       valid=valid)
        cs, ms, ns = domain_tree_moments(t, "x")
        return ms[0][0], cs[0][0], ns[0][0]

    f = shard_map(body, mesh=mesh, in_specs=(P("x"), P("x")),
                  out_specs=(P(), P(), P()), check_rep=False)
    m_root, c_root, n_root = f(state.pos, state.valid)
    assert int(n_root) == 512
    assert float(m_root[0]) == pytest.approx(2.0 * 512, rel=1e-12)
    # COM from dipole: com = c - M[1:4]/M[0]
    pos_all = np.asarray(state.pos)[np.asarray(state.valid)]
    com = np.asarray(c_root) - np.asarray(m_root)[1:4] / float(m_root[0])
    np.testing.assert_allclose(com, pos_all.mean(axis=0), rtol=1e-10)


@pytest.fixture(scope="module")
def mesh42():
    return Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("x", "y"))


def test_pencil_fft_2d_matches_single_device(mesh42):
    """True 2DECOMP parity: the (4,2) process-grid pencil FFT (two
    all_to_all transposes) against the single-device solve."""
    from photons_tpu.parallel.fft import (green_function_pencil2d,
                                          pencil_poisson_2d)
    from photons_tpu.pm.solver import green_function, pm_potential

    n, rs = 32, 1.953
    dens = jnp.asarray(np.random.default_rng(0).normal(size=(n, n, n)))
    phi_ref = pm_potential(dens, green_function(n, L, rs, dtype=jnp.float64))
    gf2 = green_function_pencil2d(n, L, rs, jnp.float64, dy=2)
    f = shard_map(lambda d_, g_: pencil_poisson_2d(d_, g_, "x", "y"),
                  mesh=mesh42, in_specs=(P("x", "y"), P(None, "x", "y")),
                  out_specs=P("x", "y"), check_rep=False)
    np.testing.assert_allclose(np.asarray(f(dens, gf2)),
                               np.asarray(phi_ref), atol=1e-12)


def test_migration_2d_routes_to_bricks(mesh42):
    from photons_tpu.parallel.migrate import migrate_2d

    dx, dy, cap = 4, 2, 64
    rng = np.random.default_rng(4)
    pos = jnp.asarray(rng.uniform(0, L, (dx * dy * cap, 3)))
    vel = jnp.asarray(rng.normal(size=(dx * dy * cap, 3)))
    valid = jnp.asarray(rng.uniform(size=(dx * dy * cap,)) < 0.5)
    xb = jnp.asarray(np.linspace(0, L, dx + 1))
    yb = jnp.asarray(np.linspace(0, L, dy + 1))

    f = shard_map(
        lambda p, v, m, b1, b2: migrate_2d((p, v), m, b1, b2, send_cap=cap,
                                           ax="x", ay="y"),
        mesh=mesh42, in_specs=(P(("x", "y")), P(("x", "y")), P(("x", "y")),
                               P(), P()),
        out_specs=((P(("x", "y")), P(("x", "y"))), P(("x", "y")), P()),
        check_rep=False)
    (pos2, vel2), valid2, ovf = f(pos, vel, valid, xb, yb)
    assert not bool(ovf)

    a = np.asarray(pos)[np.asarray(valid)]
    b = np.asarray(pos2)[np.asarray(valid2)]
    assert len(a) == len(b)
    np.testing.assert_allclose(np.sort(a, axis=0), np.sort(b, axis=0),
                               rtol=1e-12)
    # ownership: every valid particle sits in its brick
    v2 = np.asarray(valid2).reshape(dx * dy, cap)
    p2 = np.asarray(pos2).reshape(dx * dy, cap, 3)
    for i in range(dx):
        for j in range(dy):
            sel = p2[i * dy + j][v2[i * dy + j]]
            assert ((sel[:, 0] >= i * L / dx)
                    & (sel[:, 0] < (i + 1) * L / dx)).all()
            assert ((sel[:, 1] >= j * L / dy)
                    & (sel[:, 1] < (j + 1) * L / dy)).all()


def test_sharded_step_2d_grid_matches_single_device(mesh42):
    """The (4,2) brick-decomposed step (2-D halos + staged migration + 2-D
    pencil FFT) reproduces the single-device TreePM evolution."""
    from photons_tpu.sim import Simulation

    # SHIPPED defaults (pm_interlace='read' + fd4k) -- the sharded PM
    # now carries the single-chip accuracy state end-to-end
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=512, dtype="float64",
                    leaf_size=16, initial_redshift=49.0)
    rng = np.random.default_rng(9)
    pos = rng.uniform(0, L, (512, 3))
    vel = rng.normal(size=(512, 3)) * 1e-4
    a1 = cfg.initial_scale_factor * 1.05

    sim1 = Simulation.from_arrays(cfg, pos, vel, engine="fmm")
    sim1.run(n_steps=2, a_final=a1)

    sim8 = ShardedSimulation.from_arrays(cfg, mesh42, pos, vel)
    assert sim8.mesh.devices.shape == (4, 2)
    sim8.run(n_steps=2, a_final=a1)
    assert not int(sim8.last_diag["overflow"])

    p1 = np.asarray(sim1.state.pos)
    p8, v8, _ = gather_state(sim8.state)
    assert len(p8) == 512
    key = lambda p: np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    np.testing.assert_allclose(p1[key(p1)], p8[key(p8)], atol=1e-5)


@pytest.mark.parametrize("grid", [(4, 2), (1, 1)])
def test_sharded_pm_pallas_matches_xla(grid):
    """The leaf-brick Pallas paint/readout inside shard_map
    (pm/brick_pallas) reproduces the XLA corner-scatter PM path on both a
    real 2-D grid and a 1-device mesh (full-axis wrap seam); VERDICT r2
    next-5: sharded engine at single-chip kernel speed."""
    from photons_tpu.parallel.step import _pm_shard, make_sharded_state

    dx, dy = grid
    m = Mesh(np.array(jax.devices()[:dx * dy]).reshape(dx, dy), ("x", "y"))
    n = 32
    cfg = SimConfig(boxsize=L, n_side=n, n_part_total=4096, dtype="float32",
                    leaf_size=32, initial_redshift=49.0)
    rng = np.random.default_rng(13)
    # clustered + uniform mix so leaf bricks span several tiles
    pos = np.concatenate([
        rng.uniform(0, L, (2048, 3)),
        rng.normal(0, L / 20, (2048, 3)) + L / 2])
    pos = np.mod(pos, L)
    state = make_sharded_state(cfg, m, pos, np.zeros_like(pos), a=1.0)

    def run(use_pallas):
        f = shard_map(
            lambda p, v, xb, yb: _pm_shard(p, v, xb, yb, cfg,
                                           use_pallas=use_pallas),
            mesh=m,
            in_specs=(P(("x", "y")), P(("x", "y")), P(), P()),
            out_specs=(P(("x", "y")), P()), check_rep=False)
        acc, ovf = jax.jit(f)(state.pos, state.valid, state.xbounds,
                              state.ybounds)
        return np.asarray(acc), bool(np.any(np.asarray(ovf)))

    acc_x, ovf_x = run(False)
    acc_p, ovf_p = run(True)
    assert not ovf_x and not ovf_p
    scale = np.abs(acc_x).max()
    np.testing.assert_allclose(acc_p, acc_x, atol=2e-5 * scale)


def test_config_grid_shape_honored(mesh):
    """NprocVertical/NprocHorizon from the parameter file fix the 2-D grid
    (initial.c:253-254)."""
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=256, dtype="float64",
                    leaf_size=16, n_proc_vertical=2, n_proc_horizon=4)
    sim = ShardedSimulation.from_arrays(
        cfg, mesh, np.random.default_rng(0).uniform(0, L, (256, 3)),
        np.zeros((256, 3)))
    assert sim.mesh.devices.shape == (2, 4)


def test_sharded_run_io_and_log(mesh, tmp_path, monkeypatch):
    """Per-rank IO parity (snapshot.c:538-549 + photoNs.c:318): the sharded
    run writes per-shard snapshots that read_gadget reassembles, a run log
    with measured imbalance, and a resumable checkpoint."""
    from photons_tpu.io.gadget import read_gadget

    # this test asserts the log lands at output_path -- point the
    # conftest-wide run-scoped override (PHOTONS_LOG_DIR) at the same dir
    monkeypatch.setenv("PHOTONS_LOG_DIR", str(tmp_path))

    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=512, dtype="float64",
                    leaf_size=16, initial_redshift=49.0,
                    output_path=str(tmp_path), output_name="shardy",
                    code_proj="shardy")
    rng = np.random.default_rng(7)
    pos = rng.uniform(0, L, (512, 3))
    vel = rng.normal(size=(512, 3)) * 1e-4
    a1 = cfg.initial_scale_factor * 1.05

    sim = ShardedSimulation.from_arrays(cfg, mesh, pos, vel)
    sim.run(n_steps=2, a_final=a1, snapshot_times=[a1], log=True,
            checkpoint_path=str(tmp_path / "ck"), checkpoint_interval=2)

    # snapshots: 8 per-shard files, reassembled = the full particle set
    head, p_r, v_r = read_gadget(str(tmp_path / f"shardy_{a1:.4f}"), 8)
    assert head.num_files == 8 and head.n_total == 512
    assert p_r.shape == (512, 3)
    p_live, v_live, _ = gather_state(sim.state)
    key = lambda p: np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    np.testing.assert_allclose(p_r[key(p_r)], p_live[key(p_live)],
                               atol=1e-4)          # float32 on disk

    # run log: the reference's full per-step column set (utility.c:8-27;
    # VERDICT r2 next-10) -- step, ADAPTIVE LEVEL, a, imbalance, the phase
    # timer columns (profiled, so pm/fmm are real nonzero times), counters
    rows = [l.split() for l in open(tmp_path / "LOGshardy.TXT")
            if not l.startswith("#")]
    assert len(rows) == 2
    assert int(rows[-1][-2]) > 0                    # n_p2p
    assert int(rows[-1][1]) == 0                    # level (fixed stepping)
    assert 0.0 <= float(rows[-1][3]) < 1.0          # imbalance
    header = [l for l in open(tmp_path / "LOGshardy.TXT")
              if l.startswith("# step")][0].split()[1:]
    row = dict(zip(header, rows[-1]))
    assert float(row["pm"]) > 0.0                   # profiled phase columns
    assert float(row["fmm"]) > 0.0
    assert float(row["ext"]) > 0.0                  # halo ring
    assert float(row["step_time"]) > 0.0

    # checkpoint: 8 shard files; resume reproduces the particle multiset
    sim2 = ShardedSimulation.resume_from_checkpoint(str(tmp_path / "ck"),
                                                    mesh)
    p2, _, a2 = gather_state(sim2.state)
    assert a2 == pytest.approx(float(sim.state.a))
    np.testing.assert_allclose(p2[key(p2)], p_live[key(p_live)], atol=1e-12)


def _merger_like(n, seed=9):
    """Two clusters + a sparse background (exercises near AND far domains)."""
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n // 4, 3)) * 3.0 + np.array([12.0, 25.0, 25.0])
    b = rng.normal(size=(n // 4, 3)) * 3.0 + np.array([38.0, 25.0, 25.0])
    c = rng.uniform(0, L, (n - 2 * (n // 4), 3))
    return np.clip(np.concatenate([a, b, c]), 0.1, L - 0.1)


def test_sharded_open_boundary_forces_match_direct(mesh42):
    """VERDICT missing #4/#6: multi-chip open-boundary Newtonian forces --
    leaf-aligned ghost exchange + remote-tree M2L far field (farfield.py;
    ref remotes.c:337-446 send-trees + toptree.c:204-244 domain MAC) --
    against the O(N^2) direct sum, < 1e-3 RMS on a (4,2) brick grid."""
    from photons_tpu.ops.direct import direct_forces

    n = 1024
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=n, dtype="float64",
                    leaf_size=16, longshort=False, periodic=False,
                    shard_capacity_factor=8.0, ghost_cap_factor=1.0)
    pos = _merger_like(n)
    sim = ShardedSimulation.from_arrays(cfg, mesh42, pos, np.zeros_like(pos))
    state, diag = sim._init_forces(sim.state)
    assert not int(np.asarray(diag["overflow"]))

    valid = np.asarray(state.valid)
    p = np.asarray(state.pos)[valid]
    acc = np.asarray(state.acc)[valid]
    assert np.abs(np.asarray(state.acc_pm)).max() == 0.0   # no PM in open mode

    ref = direct_forces(jnp.asarray(p), mass=cfg.particle_mass,
                        eps=cfg.soften_scale)
    rms = float(np.sqrt((np.asarray(ref) ** 2).sum(-1)).mean())
    err = np.sqrt(((acc - np.asarray(ref)) ** 2).sum(-1))
    assert np.sqrt((err ** 2).mean()) / rms < 1e-3

    # surface-leaf ring pruning (VERDICT r2 next-8; remotes.c:337-446):
    # a capped carry (half the leaves) must ship strictly fewer bytes per
    # ring stage and reproduce the forces bit-for-bit -- every ghosted
    # leaf is provably within the horizon of its sender's brick boundary,
    # so the pruned buffer delivers the identical ghost set
    full_bytes = int(np.asarray(diag["ring_bytes"]))
    sim_s = ShardedSimulation.from_arrays(
        cfg.replace(surface_leaf_frac=0.5), mesh42, pos,
        np.zeros_like(pos))
    state_s, diag_s = sim_s._init_forces(sim_s.state)
    assert not int(np.asarray(diag_s["overflow"]))
    assert int(np.asarray(diag_s["ring_bytes"])) < full_bytes
    np.testing.assert_array_equal(
        np.asarray(state_s.acc)[np.asarray(state_s.valid)], acc)


@pytest.mark.slow
def test_sharded_open_boundary_run_matches_single_device(mesh):
    """Two open-boundary KDK steps on 8 slabs vs the single-device engine:
    same physics to force-approximation accuracy (both sides are
    MAC-truncated FMM, so agreement is at the truncation scale)."""
    from photons_tpu.sim import Simulation

    n = 512
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=n, dtype="float64",
                    leaf_size=16, longshort=False, periodic=False,
                    shard_capacity_factor=8.0, ghost_cap_factor=1.0)
    pos = _merger_like(n, seed=11)
    vel = np.random.default_rng(12).normal(size=(n, 3)) * 1e-3

    sim1 = Simulation.from_arrays(cfg, pos, vel, engine="fmm")
    a1 = cfg.initial_scale_factor * 1.05
    sim1.run(n_steps=2, a_final=a1)

    sim8 = ShardedSimulation.from_arrays(cfg, mesh, pos, vel)
    sim8.run(n_steps=2, a_final=a1)
    assert not int(sim8.last_diag["overflow"])

    p1 = np.asarray(sim1.state.pos)
    p8, _, _ = gather_state(sim8.state)
    assert len(p8) == n
    key = lambda p: np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    np.testing.assert_allclose(p1[key(p1)], p8[key(p8)], atol=2e-4)


def test_sharded_longshort_open_box_raises(mesh):
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=512, dtype="float64",
                    longshort=True, periodic=False)
    with pytest.raises(NotImplementedError):
        ShardedSimulation.from_arrays(
            cfg, mesh, np.random.default_rng(0).uniform(0, L, (512, 3)),
            np.zeros((512, 3)))


def test_sharded_power_spectrum_matches_host(mesh42):
    """Sharded P(k) (brick paint -> pencil FFT -> binned psum) against the
    host-gather diagnostics.power_spectrum, bin for bin (the reference's
    vestigial powerspectrum(), inc/partmesh.h:13-16, done at scale)."""
    from photons_tpu.diagnostics import power_spectrum

    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=4096,
                    dtype="float64", leaf_size=16,
                    shard_capacity_factor=8.0)
    rng = np.random.default_rng(9)
    # mildly clustered: uniform + a gaussian blob (non-trivial spectrum)
    pos = np.concatenate([
        rng.uniform(0, L, (2048, 3)),
        np.mod(rng.normal(loc=0.3 * L, scale=0.05 * L, size=(2048, 3)), L)])
    sim = ShardedSimulation.from_arrays(cfg, mesh42, pos,
                                        np.zeros_like(pos))
    k_s, pk_s, nm_s = sim.power_spectrum()
    k_h, pk_h, nm_h = power_spectrum(pos, L, 32)
    np.testing.assert_allclose(nm_s, nm_h, rtol=0, atol=0)
    np.testing.assert_allclose(k_s, k_h, rtol=1e-10)
    np.testing.assert_allclose(pk_s, pk_h, rtol=1e-8)


def test_sharded_gadget_entry(mesh, tmp_path):
    """ShardedSimulation.from_config: parameter file + per-shard sliced
    Gadget reads (snapshot.c:211-293, initial.c:359-369) land the same
    state as the host-reader path."""
    from photons_tpu.io.gadget import GadgetHeader, write_gadget
    from photons_tpu.config import load_parameter_file

    n, z = 512, 49.0
    rng = np.random.default_rng(21)
    pos = rng.uniform(0, L, (n, 3)).astype(np.float32)
    vel_disk = rng.normal(size=(n, 3)).astype(np.float32)
    head = GadgetHeader(npart=(0, n, 0, 0, 0, 0),
                        npart_total=(0, n, 0, 0, 0, 0),
                        mass=(0.0, 2.5, 0.0, 0.0, 0.0, 0.0),
                        time=1.0 / (1.0 + z), redshift=z, boxsize=L,
                        omega_m=0.25, omega_x=0.75, hubble=0.7)
    ic = str(tmp_path / "ic.gdt2")
    # write_gadget divides by a^1.5 on disk; hand it internal-unit vels
    a0 = 1.0 / (1.0 + z)
    write_gadget(ic, head, pos, vel_disk * a0**1.5)

    param = tmp_path / "t.run"
    param.write_text(
        f"InputPath {ic}\nOutputPath {tmp_path}\nCodeProj t\n"
        f"NumPart {n}\nBOXSIZE {L}\nOMEGAM 0.25\nOMEGAX 0.75\n"
        "HUBBLE 0.7\nINITIALTIME 49.0\nNumMeshSide 32\nSnapFormat 2\n")
    cfg = load_parameter_file(str(param))
    sim = ShardedSimulation.from_config(cfg, mesh)
    assert sim.cfg.n_part_total == n
    assert sim.cfg.boxsize == pytest.approx(L)
    p8, v8, a8 = gather_state(sim.state)
    assert a8 == pytest.approx(a0)
    key = lambda p: np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    np.testing.assert_allclose(p8[key(p8)], pos[key(pos)], atol=1e-5)
    np.testing.assert_allclose(v8[key(p8)], (vel_disk * a0**1.5)[key(pos)],
                               rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_sharded_soak_clustered(mesh):
    """Multi-chip soak (VERDICT r1 item 6): clustered Zel'dovich ICs,
    6 steps with rebalancing on -- particles migrate across bricks, the
    domain-tree n_global invariant holds every sync, no capacity overflow,
    and the trajectory matches the single-device engine."""
    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.sim import Simulation

    n_side = 16
    cfg = lcdm_config(n_part=n_side**3, n_side=n_side, dtype="float64",
                      boxsize=L).replace(leaf_size=16)
    pos, vel = ic_zeldovich(cfg, seed=31, spectral_index="lcdm")
    a1 = cfg.initial_scale_factor * 2.5       # big steps: forces migration

    sim1 = Simulation.from_arrays(cfg, pos, vel, engine="fmm")
    sim1.run(n_steps=6, a_final=a1)

    sim8 = ShardedSimulation.from_arrays(cfg, mesh, pos, vel)
    counts0 = np.asarray(sim8.state.valid).reshape(8, -1).sum(axis=1)
    xb0 = np.asarray(sim8.state.xbounds).copy()
    sim8.run(n_steps=6, a_final=a1)
    assert not int(sim8.last_diag["overflow"])
    assert int(sim8.last_diag["n_global"]) == n_side**3

    # rebalancing moved the grid lines (costs stay equal while the ICs
    # are near-uniform, so the movement lands late in the segment)
    assert not np.allclose(np.asarray(sim8.state.xbounds), xb0)

    # trajectory parity against the single-device engine at a1, compared
    # as CIC density fields: particle-row pairing by coordinate sort is
    # fragile (periodic-seam wraps reorder rows; ~1e-4 engine-level
    # divergence after 6 large steps flips near-ties), while the density
    # field is pairing-free and still catches any wrong-physics bug
    # (missing far field / broken migration => O(1) structure errors).
    # Fine-grained force parity is covered by the 2-step tests above.
    from photons_tpu.pm.mesh import cic_paint
    p1 = np.asarray(sim1.state.pos)
    p8, _, _ = gather_state(sim8.state)
    assert len(p8) == n_side**3
    m1 = np.asarray(cic_paint(jnp.asarray(p1, jnp.float64), L, n_side))
    m8 = np.asarray(cic_paint(jnp.asarray(p8, jnp.float64), L, n_side))
    assert np.abs(m1 - m8).max() < 0.05 * m1.max()

    # two more steps so the moved grid lines take effect.  Migration is
    # LAZY by design (ownership by the bounds at the step's start; the
    # end-of-step rebalance's reassignment is handed over by the NEXT
    # step's all_to_all -- domains.c has the same one-step lag), so the
    # valid counts may trail the final bounds' occupancy by exactly the
    # last rebalance's strip.  Migration activity itself is asserted by
    # the clustered dryrun gate (__graft_entry__: migrated > 0).
    sim8.run(n_steps=2, a_final=a1 * 1.1)
    assert int(sim8.last_diag["n_global"]) == n_side**3
    counts2 = np.asarray(sim8.state.valid).reshape(8, -1).sum(axis=1)
    pf, _, _ = gather_state(sim8.state)
    xb = np.asarray(sim8.state.xbounds)
    yb = np.asarray(sim8.state.ybounds)
    ix = np.searchsorted(xb[1:-1], pf[:, 0], side="right")
    iy = np.searchsorted(yb[1:-1], pf[:, 1], side="right")
    own = np.bincount(ix * (len(yb) - 1) + iy, minlength=8)
    # every shard's count within the pending-handover strip of its
    # brick's true occupancy.  The strip is one rebalance's line move;
    # since round 4 the initial bounds are count-quantiles, so the
    # measured-COST rebalance (clustered bricks cost more per particle)
    # legitimately moves lines by large strips in the first steps --
    # bound by half a shard rather than the old uniform-init 32
    assert np.abs(counts2 - own).max() <= n_side ** 3 // 16


@pytest.mark.slow
def test_sharded_block_timesteps(mesh):
    """Sharded per-particle block KDK (VERDICT r1 item 8): a generous eta
    reduces exactly to fixed stepping; a tight pair refines only its own
    shard's rows while the smooth background stays at level 0."""
    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=512, dtype="float64",
                    leaf_size=16, initial_redshift=49.0,
                    shard_capacity_factor=4.0)
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, L, (512, 3))
    vel = rng.normal(size=(512, 3)) * 1e-4
    a1 = cfg.initial_scale_factor * 1.05

    sim_f = ShardedSimulation.from_arrays(cfg, mesh, pos, vel)
    sim_f.run(n_steps=2, a_final=a1)
    sim_b = ShardedSimulation.from_arrays(cfg, mesh, pos, vel)
    sim_b.run_block(n_steps=2, a_final=a1, eta=1e6)
    assert sim_b.max_adaptive_level == 0
    key = lambda p: np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    pf, _, _ = gather_state(sim_f.state)
    pb, _, _ = gather_state(sim_b.state)
    np.testing.assert_allclose(pf[key(pf)], pb[key(pb)], atol=1e-5)

    # drop a tight pair into one brick: only its rows refine
    pos2 = pos.copy()
    pos2[0] = [0.30 * L, 0.5 * L, 0.5 * L]
    pos2[1] = pos2[0] + np.array([cfg.soften_scale * 0.4, 0, 0])
    sim_t = ShardedSimulation.from_arrays(cfg, mesh, pos2, vel)
    sim_t.run_block(n_steps=1, a_final=cfg.initial_scale_factor * 1.02,
                    eta=0.05, max_level=4)
    assert sim_t.max_adaptive_level > 0
    assert int(sim_t.last_diag["n_global"]) == 512
    lv = sim_t.last_levels
    v_sh = np.asarray(sim_t.state.valid)
    # refinement is selective: the tight pair's rows carry the deepest
    # level while the bulk of the smooth background stays at level 0
    hot = v_sh & (lv > 0)
    assert hot.sum() >= 2
    assert (lv[v_sh] == 0).sum() > 0.9 * v_sh.sum()
    assert np.isfinite(np.asarray(sim_t.state.pos)).all()


def test_green_local_xpencil_matches_host_slices(mesh42):
    """The in-trace per-pencil Green (green_local_xpencil) equals the
    host-materialized green_function_pencil2d sliced with P(None, x, y)
    on every device of the (4, 2) grid -- the VERDICT r4 missing-2c
    closure (no more 2.16 GB captured constant at mesh 1024;
    conv.f90:183-233 computes its Green per-pencil the same way)."""
    from photons_tpu.parallel.fft import (green_function_pencil2d,
                                          green_local_xpencil)

    n, rs = 32, 1.953
    dx, dy = 4, 2
    gf_host = np.asarray(green_function_pencil2d(n, L, rs, jnp.float64, dy))

    f = jax.jit(shard_map(
        lambda: green_local_xpencil(n, L, rs, "x", "y", jnp.float64),
        mesh=mesh42, in_specs=(), out_specs=P(None, "x", "y"),
        check_rep=False))
    gf_trace = np.asarray(f())
    assert gf_trace.shape == gf_host.shape
    np.testing.assert_allclose(gf_trace, gf_host, rtol=1e-13, atol=1e-13)


@pytest.mark.parametrize("interlace,gradient", [
    ("read", "fd4k"),            # the shipped defaults
    ("full", "fd4k"),
    ("off", "spectral"),
    ("off", "fd4"),              # legacy real-space path still exact
])
def test_sharded_pm_matches_single_chip_accuracy_state(mesh42, interlace,
                                                       gradient):
    """_pm_shard at the shipped accuracy state (k-space fd4k gradient +
    interlaced readout + momentum projection, all per-pencil in-trace)
    reproduces the single-chip pm_accel on the same particles -- the
    VERDICT r4 missing-2 parity gate."""
    from photons_tpu.parallel.step import _pm_shard, make_sharded_state
    from photons_tpu.pm.solver import green_function, pm_accel

    n = 32
    # pm_patch_factor 2.5: the quantile xbounds of this clustered state
    # give the widest brick ~18 mesh rows vs the uniform 8 -- the default
    # 1.5 factor would trip the (correct) patch-extent overflow
    cfg = SimConfig(boxsize=L, n_side=n, n_part_total=2048, dtype="float64",
                    leaf_size=16, initial_redshift=49.0, pm_patch_factor=2.5,
                    pm_interlace=interlace, pm_gradient=gradient)
    rng = np.random.default_rng(21)
    pos = np.concatenate([
        rng.uniform(0, L, (1024, 3)),
        np.mod(rng.normal(0, L / 16, (1024, 3)) + L / 3, L)])
    state = make_sharded_state(cfg, mesh42, pos, np.zeros_like(pos), a=1.0)

    from jax import lax

    def fn(p, v, xb, yb):
        acc, ovf = _pm_shard(p, v, xb, yb, cfg, use_pallas=False)
        # _pm_shard's flag is per-device; reduce like _force_shard does
        return acc, lax.pmax(ovf.astype(jnp.int32), ("x", "y"))
    f = shard_map(
        fn, mesh=mesh42,
        in_specs=(P(("x", "y")), P(("x", "y")), P(), P()),
        out_specs=(P(("x", "y")), P()), check_rep=False)
    acc_sh, ovf = jax.jit(f)(state.pos, state.valid, state.xbounds,
                             state.ybounds)
    assert not bool(np.any(np.asarray(ovf)))

    gf = green_function(n, L, cfg.split_radius, dtype=jnp.float64)
    acc_ref = np.asarray(pm_accel(
        jnp.asarray(pos, jnp.float64), gf, mass=cfg.particle_mass,
        boxsize=L, n_side=n, gradient=gradient, interlace=interlace))

    # unscramble the sharded layout back to input order via positions
    acc_sh = np.asarray(acc_sh).reshape(-1, 3)
    pos_sh = np.asarray(state.pos).reshape(-1, 3)
    val_sh = np.asarray(state.valid).reshape(-1)
    key = lambda p: np.lexsort((p[:, 2], p[:, 1], p[:, 0]))
    k_ref, k_sh = key(pos), key(pos_sh[val_sh])
    scale = np.abs(acc_ref).max()
    # measured 2e-21 abs (fd4k) / 2e-14 abs (spectral, exact-ik amplifies
    # high k) on 5e-6 scale -- f64 roundoff either way
    np.testing.assert_allclose(acc_sh[val_sh][k_sh], acc_ref[k_ref],
                               atol=1e-7 * scale)
