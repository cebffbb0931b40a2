"""ctypes bindings for the native (C++) transform kernels.

Compiles runtime/transforms.cpp on first use with the system toolchain and
caches the shared object next to the source. Every entry point degrades
gracefully: when no compiler is available (or the build fails) callers fall
back to the pure-Python/numpy implementations in data/transforms.py, which
are the semantic ground truth. Bit-parity of the native kernels against the
Python paths is pinned by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "transforms.cpp"
_LIB_NAME = "libtat_transforms.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(dest: Path) -> bool:
    cmd = [
        "g++", "-O2", "-march=native", "-shared", "-fPIC",
        "-o", str(dest), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # retry without -march=native (portability)
        try:
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("TAT_DISABLE_NATIVE"):
            return None
        candidates = [_HERE / _LIB_NAME, Path(tempfile.gettempdir()) / _LIB_NAME]
        for so in candidates:
            if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
                try:
                    _lib = _bind(ctypes.CDLL(str(so)))
                    return _lib
                except OSError:
                    pass
        for so in candidates:
            try:
                so.parent.mkdir(parents=True, exist_ok=True)
                if _build(so):
                    _lib = _bind(ctypes.CDLL(str(so)))
                    return _lib
            except Exception:
                continue
        return None


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.tat_round_decimal.argtypes = [dp, ctypes.c_int64, ctypes.c_int, dp]
    lib.tat_round_decimal.restype = None
    lib.tat_percent_changes.argtypes = [dp, ctypes.c_int64, ctypes.c_int, dp, u8p]
    lib.tat_percent_changes.restype = ctypes.c_int64
    lib.tat_range_numeric.argtypes = [
        dp, ctypes.c_int64, ctypes.c_int, ctypes.c_int, dp, u8p, u8p,
    ]
    lib.tat_range_numeric.restype = None
    lib.tat_bin_assign.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int, i64p]
    lib.tat_bin_assign.restype = None
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.tat_factorize.argtypes = [dp, ctypes.c_int64, i32p, dp]
    lib.tat_factorize.restype = ctypes.c_int64
    return lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def round_decimal(values: np.ndarray, dp: int) -> Optional[np.ndarray]:
    """Correctly-rounded decimal rounding; None when native is unavailable."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(values, dtype=np.float64)
    out = np.empty_like(arr)
    lib.tat_round_decimal(_dptr(arr), arr.size, dp, _dptr(out))
    return out


def percent_changes(
    values: np.ndarray, dp: int
) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Returns (out, zero_mask, first_zero_index) or None."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(values, dtype=np.float64)
    out = np.empty_like(arr)
    mask = np.empty(arr.size, dtype=np.uint8)
    first_zero = lib.tat_percent_changes(
        _dptr(arr), arr.size, dp,
        _dptr(out), mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, mask.astype(bool), int(first_zero)


def range_numeric(
    values: np.ndarray, nwd: int, dp: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Returns (out, clip_lower_mask, clip_upper_int_mask) or None."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(values, dtype=np.float64)
    out = np.empty_like(arr)
    cl = np.empty(arr.size, dtype=np.uint8)
    cu = np.empty(arr.size, dtype=np.uint8)
    lib.tat_range_numeric(
        _dptr(arr), arr.size, nwd, dp, _dptr(out),
        cl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cu.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out, cl.astype(bool), cu.astype(bool)


def factorize(values: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Hash-based vocabulary build + tokenize for finite float64 data.

    Returns (int32 sorted-rank codes, sorted unique values) — semantically
    np.unique(values, return_inverse=True) — or None when native is
    unavailable. Callers must route NaN-containing inputs elsewhere.
    """
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(values, dtype=np.float64)
    codes = np.empty(arr.size, dtype=np.int32)
    uniq = np.empty(arr.size, dtype=np.float64)
    u = lib.tat_factorize(
        _dptr(arr), arr.size,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _dptr(uniq),
    )
    return codes, uniq[:u].copy()


def bin_assign(
    values: np.ndarray, pos_boundaries: np.ndarray
) -> Optional[np.ndarray]:
    """Returns int64 bin assignments or None."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(values, dtype=np.float64)
    b = np.ascontiguousarray(pos_boundaries, dtype=np.float64)
    out = np.empty(arr.size, dtype=np.int64)
    lib.tat_bin_assign(
        _dptr(arr), arr.size, _dptr(b), b.size - 1,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out
