"""Config parser and Gadget-2 IO round-trip tests."""

import numpy as np
import pytest

from photons_tpu.config import SimConfig, load_parameter_file
from photons_tpu.io.gadget import GadgetHeader, read_gadget, read_gadget_header, write_gadget

DEMO_RUN = """\
# demo parameter file (format of demo/lcdm_g2.run)
CodeProj         demo
InputPath        ./ic.gdt2
SnapNumber       1   # files per snapshot
SnapFormat       2
SnapTime         1.0
OutputPath       ./
OutputName       demo
OPENANGLE        0.4
MaxPackage       8
NumMeshSide      32
NumThread        1
GravConstant     43007.105732
"""


def test_parse_demo_run(tmp_path):
    p = tmp_path / "lcdm.run"
    p.write_text(DEMO_RUN)
    cfg = load_parameter_file(str(p))
    assert cfg.open_angle == 0.4
    assert cfg.leaf_size == 8
    assert cfg.n_side == 32
    assert cfg.grav_const == pytest.approx(43007.105732)
    assert cfg.snap_times == (1.0,)
    assert cfg.input_path == "./ic.gdt2"


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.run"
    p.write_text("NotAKey 42\n")
    with pytest.raises(ValueError):
        load_parameter_file(str(p))


def test_derived_parameters():
    # initial.c:324-346: splitRadius = 1.25 L/NSIDE, cutoff = 4.5 split,
    # eps = 0.03 L / N^(1/3)
    cfg = SimConfig(boxsize=100000.0, n_side=32, n_part_total=32768)
    assert cfg.split_radius == pytest.approx(1.25 * 100000.0 / 32)
    assert cfg.cutoff_radius == pytest.approx(4.5 * cfg.split_radius)
    assert cfg.soften_scale == pytest.approx(0.03 * 100000.0 / 32.0, rel=1e-6)
    # overrides (initial.c:339-353)
    cfg2 = cfg.replace(split_scale=2000.0, softening=100.0)
    assert cfg2.split_radius == 2000.0
    assert cfg2.cutoff_radius == 9000.0
    assert cfg2.soften_scale == 100.0


def test_particle_mass_matches_reference_formula():
    # m = Omega_m * 3*0.01/(8 pi G) * V/N (initial.c:605-606)
    cfg = SimConfig(boxsize=100000.0, n_part_total=32768, omega_m=0.25,
                    grav_const=43007.105732)
    expected = 0.25 * 3 * 0.01 / (8 * np.pi * 43007.105732) * 100000.0**3 / 32768
    assert cfg.particle_mass == pytest.approx(expected)


def test_gadget_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n = 100
    z = 49.0
    pos = rng.uniform(0, 1000.0, (n, 3))
    vel = rng.normal(size=(n, 3))
    head = GadgetHeader(
        npart=(0, n, 0, 0, 0, 0), mass=(0, 2.5, 0, 0, 0, 0),
        time=1 / (1 + z), redshift=z,
        npart_total=(0, n, 0, 0, 0, 0),
        boxsize=1000.0, omega_m=0.25, omega_x=0.75, hubble=0.7)
    path = str(tmp_path / "snap.gdt2")
    write_gadget(path, head, pos, vel)

    h2 = read_gadget_header(path)
    assert h2.boxsize == 1000.0
    assert h2.n_total == n
    assert h2.mass[1] == 2.5
    assert h2.redshift == pytest.approx(z)

    h3, pos2, vel2 = read_gadget(path)
    # float32 on disk; velocity scaled by a^1.5 both ways (snapshot.c:261)
    np.testing.assert_allclose(pos2, pos, rtol=1e-6)
    np.testing.assert_allclose(vel2, vel, rtol=1e-5, atol=1e-7)


def test_gadget_reads_reference_demo_ic_layout(tmp_path):
    """Byte-level check: header struct is 256 bytes with reference field
    offsets (snapshot.c:5-22)."""
    head = GadgetHeader(npart=(0, 8, 0, 0, 0, 0), npart_total=(0, 8, 0, 0, 0, 0),
                        mass=(0, 1.0, 0, 0, 0, 0), boxsize=123.0,
                        omega_m=0.25, omega_x=0.75, hubble=0.7, redshift=49.0,
                        time=0.02)
    buf = head.pack()
    assert len(buf) == 256
    import struct
    assert struct.unpack_from("<6i", buf, 0)[1] == 8           # npart
    assert struct.unpack_from("<d", buf, 24 + 8)[0] == 1.0     # mass[1]
    assert struct.unpack_from("<d", buf, 24 + 48)[0] == 0.02   # time
    assert struct.unpack_from("<d", buf, 24 + 56)[0] == 49.0   # redshift


def test_text_snapshot_roundtrip_and_entry(tmp_path):
    """SnapFormat 0 text IC (read_Particle_text snapshot.c:365-394, routed
    via initial.c:380-386): 6-column x y z vx vy vz rows, no header, no
    velocity unit scaling; write side is 3-column positions
    (write_Particle_text snapshot.c:505-535)."""
    from photons_tpu.config import SimConfig
    from photons_tpu.io.gadget import read_particle_text, write_particle_text
    from photons_tpu.sim import Simulation

    rng = np.random.default_rng(4)
    pos = rng.uniform(0, 50.0, (32, 3))
    vel = rng.normal(size=(32, 3))
    path = str(tmp_path / "ic.txt")
    with open(path, "w") as fh:
        for p, v in zip(pos, vel):
            fh.write(f"{p[0]} {p[1]} {p[2]} {v[0]} {v[1]} {v[2]}\n")

    p2, v2 = read_particle_text(path)
    np.testing.assert_allclose(p2, pos, rtol=1e-12)
    np.testing.assert_allclose(v2, vel, rtol=1e-12)
    p3, _ = read_particle_text(path, n_start=8, n_count=4)
    np.testing.assert_allclose(p3, pos[8:12], rtol=1e-12)

    cfg = SimConfig(boxsize=50.0, n_side=16, n_part_total=32,
                    dtype="float64", snap_format=0, input_path=path)
    sim = Simulation.from_config(cfg, engine="pm")
    np.testing.assert_allclose(np.asarray(sim.state.pos), pos, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sim.state.vel), vel, rtol=1e-12)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="SnapNumber"):
        Simulation.from_config(cfg.replace(snap_number=2))

    out = str(tmp_path / "out.txt")
    write_particle_text(out, pos)
    cols = np.loadtxt(out)
    assert cols.shape == (32, 3)
    np.testing.assert_allclose(cols, pos, atol=1e-6)
