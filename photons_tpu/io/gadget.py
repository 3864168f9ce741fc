"""Gadget-2 (format 1) snapshot reader/writer.

Binary layout mirrors the reference (``snapshot.c:5-22`` header struct,
``read_Particle_Gadget2`` snapshot.c:211-293, ``write_Particle_Gadget2``
snapshot.c:397-503): Fortran-style 4-byte record markers around a 256-byte
header, a float32 position block, a float32 velocity block, and (on write)
a uint32 id block.

Velocity unit convention: internal velocities are Gadget velocities times
a^1.5 (gdt2unit, snapshot.c:261 on read, :470-479 on write).

Multi-file snapshots (``<name>.<i>``) are supported on read
(snapshot.c:121-209) and written per shard on save (snapshot.c:538-549).
"""

from __future__ import annotations

import dataclasses
import os
import struct
from typing import List, Optional, Tuple

import numpy as np

_HDR_FMT = "<6i6d d d 2i 6i 2i d 3d"  # npart, mass, time, z, sfr/fb, npartTotal, cooling/nfiles, box, Om/OL/h
_HDR_USED = struct.calcsize(_HDR_FMT)  # 196 bytes; rest is fill to 256


@dataclasses.dataclass
class GadgetHeader:
    npart: Tuple[int, ...] = (0, 0, 0, 0, 0, 0)
    mass: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    time: float = 0.0            # scale factor
    redshift: float = 0.0
    flag_sfr: int = 0
    flag_feedback: int = 0
    npart_total: Tuple[int, ...] = (0, 0, 0, 0, 0, 0)
    flag_cooling: int = 0
    num_files: int = 1
    boxsize: float = 0.0
    omega_m: float = 0.0
    omega_x: float = 0.0
    hubble: float = 0.0

    def pack(self) -> bytes:
        body = struct.pack(
            _HDR_FMT,
            *self.npart, *self.mass, self.time, self.redshift,
            self.flag_sfr, self.flag_feedback, *self.npart_total,
            self.flag_cooling, self.num_files, self.boxsize,
            self.omega_m, self.omega_x, self.hubble,
        )
        return body + b"\0" * (256 - len(body))

    @classmethod
    def unpack(cls, buf: bytes) -> "GadgetHeader":
        v = struct.unpack(_HDR_FMT, buf[:_HDR_USED])
        return cls(
            npart=v[0:6], mass=v[6:12], time=v[12], redshift=v[13],
            flag_sfr=v[14], flag_feedback=v[15], npart_total=v[16:22],
            flag_cooling=v[22], num_files=v[23], boxsize=v[24],
            omega_m=v[25], omega_x=v[26], hubble=v[27],
        )

    @property
    def n_total(self) -> int:
        return int(sum(self.npart_total))


def _read_record(fh) -> bytes:
    raw = fh.read(4)
    if len(raw) < 4:
        raise EOFError("truncated Gadget file")
    (size,) = struct.unpack("<i", raw)
    data = fh.read(size)
    fh.read(4)  # trailing marker
    return data


def _write_record(fh, data: bytes) -> None:
    marker = struct.pack("<i", len(data))
    fh.write(marker)
    fh.write(data)
    fh.write(marker)


def read_gadget_header(path: str) -> GadgetHeader:
    """Read just the 256-byte header (read_GadgetHeader, snapshot.c:64-119)."""
    with open(path, "rb") as fh:
        return GadgetHeader.unpack(_read_record(fh))


def _read_single(path: str):
    with open(path, "rb") as fh:
        head = GadgetHeader.unpack(_read_record(fh))
        n = int(sum(head.npart))
        pos = np.frombuffer(_read_record(fh), dtype="<f4").reshape(n, 3)
        vel = np.frombuffer(_read_record(fh), dtype="<f4").reshape(n, 3)
    return head, pos, vel


def read_gadget(path: str, num_files: int = 1):
    """Read a (possibly multi-file) snapshot -> (header, pos, vel) in
    internal units (velocities scaled by a^1.5, snapshot.c:261).

    For multi-file snapshots pass the basename; files are ``<path>.<i>``
    (npart_infile / read path, snapshot.c:30-60, initial.c:389-451).
    """
    if num_files <= 1 and os.path.exists(path):
        head, pos, vel = _read_single(path)
    else:
        parts: List[np.ndarray] = []
        vels: List[np.ndarray] = []
        head = None
        nf = num_files if num_files > 1 else 1
        for i in range(nf):
            h, p, v = _read_single(f"{path}.{i}")
            head = head or h
            parts.append(p)
            vels.append(v)
        pos = np.concatenate(parts)
        vel = np.concatenate(vels)
    unit = (1.0 / (1.0 + head.redshift)) ** 1.5
    return head, pos.astype(np.float64), vel.astype(np.float64) * unit


def read_particle_text(path: str, n_start: int = 0,
                       n_count: Optional[int] = None):
    """SnapFormat 0: whitespace text, one ``x y z vx vy vz`` row per
    particle (read_Particle_text, snapshot.c:365-394; routed from
    initial.c:380-386, which requires SnapNumber == 1).

    No header exists in this format, so box geometry and cosmology come
    from the parameter file, and velocities are taken verbatim (the
    reference applies no a^1.5 unit here).  Returns (pos, vel) float64.
    """
    data = np.loadtxt(path, dtype=np.float64)
    if data.ndim == 1:
        data = data[None, :]
    if data.shape[1] != 6:
        raise ValueError(f"text snapshot {path}: expected 6 columns "
                         f"(x y z vx vy vz), got {data.shape[1]}")
    stop = None if n_count is None else n_start + n_count
    data = data[n_start:stop]
    return np.ascontiguousarray(data[:, :3]), np.ascontiguousarray(data[:, 3:])


def write_particle_text(path: str, pos: np.ndarray) -> None:
    """SnapFormat 0 write: positions only, one row per particle
    (write_Particle_text, snapshot.c:505-535 -- the reference writes 3
    columns even though its reader expects 6; we keep the read side
    6-column and the write side 3-column for byte parity)."""
    np.savetxt(path, np.asarray(pos, np.float64), fmt="%f")


def write_gadget(path: str, head: GadgetHeader, pos: np.ndarray,
                 vel: np.ndarray, ids: Optional[np.ndarray] = None) -> None:
    """Write one snapshot file (write_Particle_Gadget2, snapshot.c:397-503).

    ``vel`` is in internal units and is divided by a^1.5 on disk.
    """
    n = pos.shape[0]
    head = dataclasses.replace(
        head, npart=(0, n, 0, 0, 0, 0))
    unit = (1.0 / (1.0 + head.redshift)) ** 1.5
    with open(path, "wb") as fh:
        _write_record(fh, head.pack())
        _write_record(fh, np.asarray(pos, "<f4").tobytes())
        _write_record(fh, (np.asarray(vel, np.float64) / unit).astype("<f4").tobytes())
        if ids is None:
            ids = np.arange(n, dtype="<u4")
        _write_record(fh, np.asarray(ids, "<u4").tobytes())
