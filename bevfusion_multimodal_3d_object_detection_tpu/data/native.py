"""ctypes bindings for the native point-prep library (csrc/pointprep.cc).

Lazily compiles `csrc/pointprep.cc` with g++ on first use (cached as
`csrc/libpointprep.so`) and falls back to the pure-numpy path transparently if
no compiler or load failure — the Python pipeline stays fully functional
without it.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_SO = _CSRC / "libpointprep.so"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = _CSRC / "pointprep.cc"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _CSRC / "pointprep.cc"
    stale = (
        _SO.exists()
        and src.exists()
        and src.stat().st_mtime > _SO.stat().st_mtime
    )
    if (not _SO.exists() or stale) and not _build():
        # no .so, or only a stale one that would silently run OLD native
        # code against new Python expectations — fall back to numpy
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.pointprep_load_lidar.restype = ctypes.c_int
        lib.pointprep_load_lidar.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
        ]
        lib.pointprep_filter_pad.restype = ctypes.c_int
        lib.pointprep_filter_pad.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_uint64,
        ]
        lib.pointprep_normalize_image.restype = None
        lib.pointprep_normalize_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_lidar_native(
    path: str,
    record_floats: int,
    max_points: int,
    out_channels: int,
    pc_range: Tuple[float, ...],
    seed: int,
) -> Optional[np.ndarray]:
    """Native .bin read + range filter + pad/subsample -> (max_points, C)
    float32, or None when the native lib is unavailable / IO failed."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((max_points, out_channels), np.float32)
    r6 = np.asarray(pc_range, np.float32)
    n = lib.pointprep_load_lidar(
        str(path).encode(), record_floats, _fptr(out), max_points,
        out_channels, _fptr(r6), seed & 0xFFFFFFFFFFFFFFFF,
    )
    if n < 0:
        return None
    return out


def filter_pad_native(
    points: np.ndarray,
    max_points: int,
    out_channels: int,
    pc_range: Tuple[float, ...],
    seed: int,
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty((max_points, out_channels), np.float32)
    r6 = np.asarray(pc_range, np.float32)
    n = lib.pointprep_filter_pad(
        _fptr(pts), pts.shape[0], pts.shape[1], _fptr(out), max_points,
        out_channels, _fptr(r6), seed & 0xFFFFFFFFFFFFFFFF,
    )
    if n < 0:
        return None
    return out


def normalize_image_native(
    rgb: np.ndarray, mean, std
) -> Optional[np.ndarray]:
    """(H, W, 3) uint8 -> ImageNet-normalized float32, or None if lib absent."""
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    out = np.empty(rgb.shape, np.float32)
    lib.pointprep_normalize_image(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rgb.shape[0] * rgb.shape[1],
        _fptr(np.asarray(mean, np.float32)),
        _fptr(np.asarray(std, np.float32)),
        _fptr(out),
    )
    return out
