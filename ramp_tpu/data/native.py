"""ctypes bindings for the native planning core (`native/astar.cpp`).

Loads `native/libramp_native.so`, building it with `make` on first use when
a toolchain is available. All entry points have pure-Python fallbacks in
`ramp_tpu.data.generator`; `plan_trajectory_native` returns None when the
library is unavailable so callers can fall back transparently.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libramp_native.so")

_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ramp_occupancy_grid.argtypes = [f32p, f32p, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_float, u8p]
    lib.ramp_occupancy_grid.restype = None
    lib.ramp_plan_trajectory.argtypes = [u8p, ctypes.c_int, ctypes.c_float,
                                         ctypes.c_float, ctypes.c_float,
                                         ctypes.c_float, ctypes.c_int,
                                         ctypes.c_float, ctypes.c_uint64, f32p]
    lib.ramp_plan_trajectory.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def occupancy_grid_native(box_centers, box_sizes, n_cells: int = 64,
                          margin: float = 0.05) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    centers = np.ascontiguousarray(box_centers, np.float32)
    sizes = np.ascontiguousarray(box_sizes, np.float32)
    occ = np.zeros((n_cells, n_cells), np.uint8)
    lib.ramp_occupancy_grid(
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(centers), n_cells, margin,
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return occ


def plan_trajectory_native(occ: np.ndarray, start_xy, goal_xy, horizon: int,
                           seed: int, dt: float = 0.1) -> Optional[np.ndarray]:
    """[H, 4] trajectory or None (library missing / goal unreachable)."""
    lib = _load()
    if lib is None:
        return None
    occ = np.ascontiguousarray(occ, np.uint8)
    out = np.zeros((horizon, 4), np.float32)
    ok = lib.ramp_plan_trajectory(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), occ.shape[0],
        float(start_xy[0]), float(start_xy[1]),
        float(goal_xy[0]), float(goal_xy[1]),
        horizon, dt, seed & 0xFFFFFFFFFFFFFFFF,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if ok else None
