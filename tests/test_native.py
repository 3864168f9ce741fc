"""Native (C++) runtime component tests: host traversal parity with the
jitted traversal, and Gadget IO parity with the Python reader/writer."""

import numpy as np
import jax.numpy as jnp
import pytest

from photons_tpu.native import (load_native, native_traversal,
                                native_read_gadget_slice,
                                native_write_gadget)
from photons_tpu.tree.build import build_tree
from photons_tpu.ops.traversal import dual_tree_traversal

L = 50.0

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="native toolchain unavailable")


def _pairs_set(pairs):
    return set(map(tuple, np.asarray(pairs)[np.asarray(pairs)[:, 0] >= 0]
                   .tolist()))


def _table_set(table):
    """Per-target table (R, cap) -> set of (target, source) pairs."""
    t = np.asarray(table)
    rows, cols = np.nonzero(t >= 0)
    return set(zip(rows.tolist(), t[rows, cols].tolist()))


@pytest.mark.parametrize("cutoff,box", [(None, None), (8.789, L)])
def test_native_traversal_matches_jitted(cutoff, box):
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, L, (2048, 3)))
    tree = build_tree(pos, mass=1.0, leaf_size=16, lo=0.0, hi=L)
    lists = dual_tree_traversal(tree, theta=0.4, cutoff=cutoff, boxsize=box,
                                open_cap=512, m2l_cap=64, p2p_cap=256,
                                adjacency_eps=1e-9 * L)
    m2l, m2l_lv, p2p = native_traversal(tree, 0.4, cutoff, box, 1e-9 * L)

    assert _pairs_set(p2p) == _table_set(lists.p2p)
    for lvl, tbl in enumerate(lists.m2l):
        dev = _table_set(tbl)
        nat = _pairs_set(m2l[m2l_lv == lvl + 1])
        assert nat == dev, f"level {lvl + 1} mismatch"


def test_native_gadget_roundtrip(tmp_path):
    from photons_tpu.io.gadget import GadgetHeader, read_gadget

    rng = np.random.default_rng(1)
    n = 333
    pos = rng.uniform(0, 100, (n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    z = 49.0
    head = GadgetHeader(npart=(0, n, 0, 0, 0, 0),
                        npart_total=(0, n, 0, 0, 0, 0),
                        mass=(0, 1.5, 0, 0, 0, 0), time=1 / (1 + z),
                        redshift=z, boxsize=100.0,
                        omega_m=0.25, omega_x=0.75, hubble=0.7)
    path = str(tmp_path / "nat.gdt2")
    native_write_gadget(path, head.pack(), pos, vel)

    # python reader sees the same data (vel gets the a^1.5 unit factor)
    h2, p2, v2 = read_gadget(path)
    unit = (1.0 / (1.0 + z)) ** 1.5
    np.testing.assert_allclose(p2, pos, rtol=1e-6)
    np.testing.assert_allclose(v2, vel * unit, rtol=1e-6)

    # native slice read
    ps, vs = native_read_gadget_slice(path, n, 100, 50)
    np.testing.assert_array_equal(ps, pos[100:150])
    np.testing.assert_array_equal(vs, vel[100:150])


def test_pipelined_simulation_matches_in_jit(tmp_path):
    """Dual-buffer pipeline parity (fmm.c:378-400): the host-walk engine
    must reproduce the in-jit traversal engine's trajectory (same MAC, same
    tables -- only the walk's execution venue differs)."""
    from photons_tpu.config import SimConfig
    from photons_tpu.pipeline import PipelinedSimulation
    from photons_tpu.sim import Simulation

    cfg = SimConfig(boxsize=L, n_side=32, n_part_total=2048, dtype="float64",
                    leaf_size=16, open_angle=0.4)
    rng = np.random.default_rng(21)
    pos = rng.uniform(0, L, (2048, 3))
    vel = rng.normal(size=(2048, 3)) * 1e-3

    sim_a = Simulation.from_arrays(cfg, pos, vel, engine="fmm")
    a1 = cfg.initial_scale_factor * 1.05
    sim_a.run(n_steps=3, a_final=a1)

    sim_b = PipelinedSimulation.from_arrays(cfg, pos, vel)
    sim_b.run(n_steps=3, a_final=a1)

    np.testing.assert_allclose(np.asarray(sim_a.state.pos),
                               np.asarray(sim_b.state.pos),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sim_a.state.vel),
                               np.asarray(sim_b.state.vel),
                               rtol=0, atol=1e-12)
