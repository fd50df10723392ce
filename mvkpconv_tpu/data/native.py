"""ctypes bindings for the native host ops (native/host_ops.cpp).

Auto-compiles the shared library with g++ on first use (cached next to the
source); every entry point has a numpy fallback so the package works without
a toolchain. This mirrors the reference's cpp_wrappers role (C++ host-side
point ops) with a plain C ABI instead of CPython wrapper modules.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "host_ops.cpp"
_LIB_PATH = _NATIVE_DIR / "libhost_ops.so"
# Written after a successful local build. A .so without a marker (or older
# than it) was built elsewhere and may use ISA extensions this CPU lacks
# (-march=native) — loading it would SIGILL past the except below — so such
# libraries are always rebuilt locally. The binary itself is gitignored.
_MARKER = _NATIVE_DIR / ".libhost_ops.built_here"
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        stale = (
            not _LIB_PATH.exists()
            or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime
            or not _MARKER.exists()
            or _MARKER.stat().st_mtime < _LIB_PATH.stat().st_mtime
        )
        if stale:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(_SRC), "-o", str(_LIB_PATH)],
                check=True, capture_output=True,
            )
            _MARKER.touch()
        lib = ctypes.CDLL(str(_LIB_PATH))
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.grid_subsample.restype = ctypes.c_int64
        lib.grid_subsample.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, i32p, ctypes.c_int32,
            ctypes.c_float, f32p, f32p, i32p, ctypes.c_int32, ctypes.c_int64,
        ]
        lib.nearest_neighbor_1nn.restype = None
        lib.nearest_neighbor_1nn.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_float, i64p, f32p,
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grid_subsample_native(
    points: np.ndarray,
    colors: np.ndarray,
    labels: np.ndarray,
    cell: float,
    num_classes: int = 20,
    ignore_label: int = -1,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """C++ voxel-barycenter subsample; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    cols = np.ascontiguousarray(colors, np.float32)
    labs = np.ascontiguousarray(labels, np.int32)
    n = len(pts)
    out_p = np.empty((n, 3), np.float32)
    out_f = np.empty((n, cols.shape[1]), np.float32)
    out_l = np.empty((n,), np.int32)
    count = lib.grid_subsample(
        _f32p(pts), n, _f32p(cols), cols.shape[1],
        labs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_classes,
        ctypes.c_float(cell), _f32p(out_p), _f32p(out_f),
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ignore_label, n,
    )
    count = min(count, n)
    return out_p[:count].copy(), out_f[:count].copy(), out_l[:count].copy()


def nearest_neighbor_1nn_native(
    queries: np.ndarray, supports: np.ndarray, cell: Optional[float] = None
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Exact hash-grid 1-NN; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(queries, np.float32)
    s = np.ascontiguousarray(supports, np.float32)
    if cell is None:
        # heuristic: cell ≈ average support spacing
        extent = s.max(0) - s.min(0) + 1e-6
        cell = float((extent.prod() / max(len(s), 1)) ** (1 / 3) + 1e-6)
    idx = np.empty(len(q), np.int64)
    d2 = np.empty(len(q), np.float32)
    lib.nearest_neighbor_1nn(
        _f32p(q), len(q), _f32p(s), len(s), ctypes.c_float(cell),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), _f32p(d2),
    )
    return idx, d2
