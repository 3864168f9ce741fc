"""ctypes bindings for the native (C++) runtime components.

The library is built on demand from ``native/`` (g++, no external deps)
and cached next to the sources.  Everything here has a pure-Python/JAX
fallback, so the framework works without a compiler; the native paths are
the performance/runtime components the reference implements in C
(host tree walk, snapshot streaming).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libphotons_native.so")


@lru_cache(None)
def load_native() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    try:
        if not os.path.exists(_LIB_PATH) or any(
                os.path.getmtime(os.path.join(_NATIVE_DIR, f)) >
                os.path.getmtime(_LIB_PATH)
                for f in ("traversal.cpp", "gadget_io.cpp")):
            subprocess.run(["make", "-s", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError):
        return None

    lib.photons_dual_tree_traverse.restype = ctypes.c_int
    lib.photons_dual_tree_traverse.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.photons_gadget_read_header.restype = ctypes.c_int
    lib.photons_gadget_read_slice.restype = ctypes.c_int
    lib.photons_gadget_write.restype = ctypes.c_int
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def native_traversal(tree, theta: float, cutoff: Optional[float],
                     boxsize: Optional[float], adjacency_eps: float,
                     m2l_cap: int = 1 << 22, p2p_cap: int = 1 << 22):
    """Host-side dual-tree walk on a built Tree -> numpy interaction lists.

    Returns (m2l_pairs (M,2), m2l_levels (M,), p2p_pairs (P,2)); raises on
    capacity overflow.  Semantically identical to
    ops.traversal.dual_tree_traversal (cross-checked in tests).
    """
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed)")

    centers = np.concatenate([np.asarray(c, np.float64)
                              for c in tree.centers])
    widths = np.concatenate([np.asarray(w, np.float64) for w in tree.widths])
    counts = np.concatenate([np.asarray(c, np.int64) for c in tree.counts])
    depth = tree.depth

    m2l = np.empty((m2l_cap, 2), np.int32)
    m2l_lv = np.empty((m2l_cap,), np.int32)
    p2p = np.empty((p2p_cap, 2), np.int32)
    lvl_cnt = np.zeros((depth + 1,), np.int64)
    m2l_total = np.zeros((1,), np.int64)
    p2p_count = np.zeros((1,), np.int64)

    rc = lib.photons_dual_tree_traverse(
        _ptr(centers, ctypes.c_double), _ptr(widths, ctypes.c_double),
        _ptr(counts, ctypes.c_int64), depth,
        float(theta), -1.0 if cutoff is None else float(cutoff),
        -1.0 if boxsize is None else float(boxsize), float(adjacency_eps),
        _ptr(m2l, ctypes.c_int32), _ptr(m2l_lv, ctypes.c_int32), m2l_cap,
        _ptr(p2p, ctypes.c_int32), p2p_cap,
        _ptr(lvl_cnt, ctypes.c_int64), _ptr(m2l_total, ctypes.c_int64),
        _ptr(p2p_count, ctypes.c_int64))
    if rc:
        raise RuntimeError(
            f"native traversal overflow: m2l={int(m2l_total[0])} "
            f"p2p={int(p2p_count[0])} (caps {m2l_cap}/{p2p_cap})")
    m = int(m2l_total[0])
    p = int(p2p_count[0])
    return m2l[:m].copy(), m2l_lv[:m].copy(), p2p[:p].copy()


def native_read_gadget_slice(path: str, n_total: int, start: int,
                             count: int):
    """Stream one particle slice (start, count) from a Gadget-2 file."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    pos = np.empty((count, 3), np.float32)
    vel = np.empty((count, 3), np.float32)
    rc = lib.photons_gadget_read_slice(
        path.encode(), n_total, start, count,
        _ptr(pos, ctypes.c_float), _ptr(vel, ctypes.c_float))
    if rc:
        raise IOError(f"native gadget read failed for {path}")
    return pos, vel


def native_write_gadget(path: str, header: bytes, pos, vel, ids=None):
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = pos.shape[0]
    pos = np.ascontiguousarray(pos, np.float32)
    vel = np.ascontiguousarray(vel, np.float32)
    if ids is None:
        ids = np.arange(n, dtype=np.uint32)
    ids = np.ascontiguousarray(ids, np.uint32)
    hdr = np.frombuffer(header, np.uint8)
    rc = lib.photons_gadget_write(
        path.encode(), _ptr(hdr, ctypes.c_ubyte), n,
        _ptr(pos, ctypes.c_float), _ptr(vel, ctypes.c_float),
        _ptr(ids, ctypes.c_uint32))
    if rc:
        raise IOError(f"native gadget write failed for {path}")
