"""Parity against the reference's PACKAGED demo ICs (VERDICT r2 missing-1).

The reference's only runnable check is `make demo` on demo/ic_lcdm.gdt2
(1_Indexing/Makefile:53-58); a second packaged IC (ic_merger.gdt2) holds a
60000-particle two-type galaxy with a zeroed header (open boundary,
Newtonian).  These tests read the ACTUAL packaged bytes -- not regenerated
equivalents -- and check the framework reproduces the headers, units and
basic dynamical invariants.  Skipped when the reference tree is absent.
"""

import os

import numpy as np
import pytest

REF_DEMO = "/root/reference/1_Indexing/demo"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DEMO), reason="reference tree not mounted")


def test_packaged_lcdm_header_and_read():
    """Header parity with SURVEY.md Appendix A (N=32^3, L=10^5 kpc/h,
    z=49, Om=.25, OL=.75, h=.7, m_p~211.75) and the reader conventions
    (a^1.5 velocity unit, snapshot.c:261; type loop snapshot.c:244)."""
    from photons_tpu.io.gadget import read_gadget, read_gadget_header

    path = os.path.join(REF_DEMO, "ic_lcdm.gdt2")
    h = read_gadget_header(path)
    assert h.npart[1] == 32768 and sum(h.npart) == 32768
    assert h.boxsize == 100000.0
    assert h.redshift == 49.0
    assert (h.omega_m, h.omega_x, h.hubble) == (0.25, 0.75, 0.7)
    np.testing.assert_allclose(h.mass[1], 211.754, rtol=1e-4)

    head, pos, vel = read_gadget(path)
    assert pos.shape == (32768, 3)
    assert np.all((pos >= 0) & (pos <= h.boxsize))
    # raw file velocities are ~100s of km/s; the internal unit applies
    # a^1.5 = 0.02^1.5 ~ 2.8e-3
    assert 0 < np.abs(vel).max() < 10.0


def test_packaged_lcdm_native_slice_matches():
    """The native sliced reader (gadget_io.cpp) must return the same bytes
    as the python reader for an interior slice (modulo the a^1.5 velocity
    unit, which the python reader applies and the native reader leaves
    raw -- parallel/step.py:649-660 applies it at the call site)."""
    from photons_tpu.io.gadget import read_gadget
    from photons_tpu.native import native_read_gadget_slice

    path = os.path.join(REF_DEMO, "ic_lcdm.gdt2")
    head, pos, vel = read_gadget(path)
    try:
        ps, vs = native_read_gadget_slice(path, 32768, 1000, 500)
    except (RuntimeError, OSError):
        pytest.skip("native gadget_io library unavailable")
    np.testing.assert_array_equal(ps, pos[1000:1500])
    a0 = 1.0 / (1.0 + head.redshift)
    np.testing.assert_allclose(vs * a0 ** 1.5, vel[1000:1500], rtol=1e-6)


def test_packaged_merger_reads_and_steps():
    """The merger IC loads through merger_from_reference (reference-parity
    scalar mass = header.mass[1], snapshot.c:251 commented-out per-type
    mass) and a short Newtonian run conserves momentum and keeps the
    galaxy bound (no particle ejected to the box edge)."""
    from photons_tpu.models.merger import merger_from_reference

    # subsample 8: the full galaxy's near-field-dense P2P table (the
    # reference sizes for <= 1000 neighbor leaves/leaf, fmm.c:774) is a
    # device workload; scripts/run_reference_ics.py runs all 60000 on TPU
    sim = merger_from_reference(
        os.path.join(REF_DEMO, "ic_merger.gdt2"), engine="fmm",
        dtype="float64", leaf_size=64, subsample=8,
        open_angle=0.7, p2p_neighbor_cap=512,
        output_path="/tmp/pt_refics")
    assert sim.cfg.n_part_total == 7500
    assert sim.cfg.newtonian and not sim.cfg.periodic
    np.testing.assert_allclose(sim.cfg.mass_part, 8 * 1.0463387e-3,
                               rtol=1e-5)

    pos0 = np.asarray(sim.state.pos)
    p0 = np.asarray(sim.state.vel).mean(0)
    sim.run(n_steps=2, a_final=0.02)         # 2 x 10 Myr Newtonian steps
    pos1 = np.asarray(sim.state.pos)
    p1 = np.asarray(sim.state.vel).mean(0)

    assert np.isfinite(pos1).all()
    # bulk momentum conserved (pairwise forces cancel; G*dk kick scale)
    np.testing.assert_allclose(p1, p0, atol=1e-3 * np.abs(
        np.asarray(sim.state.vel)).max())
    # bound: nothing flew anywhere near the (padded) box edge
    L = sim.cfg.boxsize
    assert np.all((pos1 > 0.02 * L) & (pos1 < 0.98 * L))
    # and the system actually evolved
    assert np.abs(pos1 - pos0).max() > 0
