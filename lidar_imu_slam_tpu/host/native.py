"""ctypes bindings for the native host runtime (native/scan_packer.cpp).

Compiles the shared library on first use (g++ is in the image; pybind11 is
not, hence the plain C ABI). Falls back to None when no compiler is
available — callers must handle that and use the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "scan_packer.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libscanpack.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _PackParams(ctypes.Structure):
    _fields_ = [
        ("min_range", ctypes.c_double),
        ("max_range", ctypes.c_double),
        ("stamp", ctypes.c_double),
        ("frame_rate", ctypes.c_double),
        ("angle_limit", ctypes.c_double),
        ("num_scan_lines", ctypes.c_int32),
        ("max_points", ctypes.c_int32),
    ]


def _src_hash() -> str:
    import hashlib

    with open(os.path.abspath(_SRC), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> Optional[str]:
    # no -march=native: the library must stay loadable on any host CPU
    os.makedirs(_BUILD_DIR, exist_ok=True)
    src = os.path.abspath(_SRC)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
        )
        with open(_LIB_PATH + ".srchash", "w") as f:
            f.write(_src_hash())
        return _LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _prebuilt_current() -> bool:
    """A prebuilt library is only trusted if its source-hash sidecar matches
    the current scan_packer.cpp — otherwise an edit would silently keep
    executing a stale binary."""
    if not os.path.exists(_LIB_PATH):
        return False
    try:
        with open(_LIB_PATH + ".srchash") as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH if _prebuilt_current() else _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.pack_scan.restype = ctypes.c_int
        lib.pack_scan.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(_PackParams),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.voxel_downsample.restype = ctypes.c_int
        lib.voxel_downsample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def pack_scan_native(
    xyz: np.ndarray,
    time: Optional[np.ndarray],
    ring: Optional[np.ndarray],
    stamp: float,
    lidar_cfg,
):
    """Native equivalent of host packing + preprocess: returns the arrays
    of a `Scan` (xyz, tau, rel_t, mask, t_begin, t_end) as numpy, matching
    ops/preprocess.preprocess_scan semantics."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    cap = lidar_cfg.max_points
    t = np.ascontiguousarray(time, np.float64) if time is not None else None
    r = np.ascontiguousarray(ring, np.int32) if ring is not None else None

    out_xyz = np.zeros((cap, 3), np.float32)
    out_tau = np.zeros((cap,), np.float32)
    out_rel = np.zeros((cap,), np.float64)
    out_mask = np.zeros((cap,), np.uint8)
    t_begin = ctypes.c_double()
    t_end = ctypes.c_double()
    params = _PackParams(
        min_range=lidar_cfg.min_range,
        max_range=lidar_cfg.max_range,
        stamp=float(stamp),
        frame_rate=lidar_cfg.frame_rate,
        angle_limit=lidar_cfg.angle_limit,
        num_scan_lines=lidar_cfg.num_scan_lines,
        max_points=cap,
    )

    def ptr(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct)) if a is not None else None

    lib.pack_scan(
        ptr(xyz, ctypes.c_float),
        ptr(t, ctypes.c_double),
        ptr(r, ctypes.c_int32),
        n,
        ctypes.byref(params),
        ptr(out_xyz, ctypes.c_float),
        ptr(out_tau, ctypes.c_float),
        ptr(out_rel, ctypes.c_double),
        ptr(out_mask, ctypes.c_uint8),
        ctypes.byref(t_begin),
        ctypes.byref(t_end),
    )
    return out_xyz, out_tau, out_rel, out_mask.astype(bool), t_begin.value, t_end.value


def voxel_downsample_native(xyz: np.ndarray, voxel_size: float, out_cap: int):
    lib = get_lib()
    assert lib is not None
    xyz = np.ascontiguousarray(xyz, np.float32)
    out = np.zeros((out_cap, 3), np.float32)
    m = lib.voxel_downsample(
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(xyz),
        voxel_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_cap,
    )
    return out[:m]
