"""Native (C++/OpenMP) host-side preprocessing runtime.

Lazy-builds ``libpreproc.so`` from :mod:`preproc.cpp` with the system
toolchain on first use (cached next to the source; falls back to a
temp dir when the package directory is read-only) and binds it via
ctypes.  Every entry point has a numpy fallback so the package works
without a compiler; ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

__all__ = ["available", "normalise_native", "proj_stats_native"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "preproc.cpp")
    if not os.path.exists(src):
        return None
    candidates = [
        os.path.join(os.path.dirname(__file__), "libpreproc.so"),
        os.path.join(tempfile.gettempdir(), "tomobar_tpu_libpreproc.so"),
    ]
    for lib_path in candidates:
        if os.path.exists(lib_path) and os.path.getmtime(lib_path) >= os.path.getmtime(src):
            try:
                return ctypes.CDLL(lib_path)
            except OSError:
                continue
        try:
            subprocess.run(
                [
                    "g++", "-O3", "-fopenmp", "-shared", "-fPIC",
                    src, "-o", lib_path,
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return ctypes.CDLL(lib_path)
        except (OSError, subprocess.SubprocessError):
            continue
    return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_and_load()
        if _LIB is not None:
            _LIB.normalise_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int32,
            ]
            _LIB.proj_stats_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            _LIB.n_threads.restype = ctypes.c_int32
    return _LIB


def available() -> bool:
    """True when the native library compiled and loaded."""
    return _lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def normalise_native(
    data: np.ndarray,
    flat: np.ndarray,
    dark: np.ndarray,
    log_transform: bool = True,
) -> Optional[np.ndarray]:
    """Fused (data - dark)/(flat - dark) [+ -log] over the leading axes.

    data: (..., n_inner) with flat/dark broadcast over the leading axes,
    i.e. flat.shape == dark.shape == data.shape[-flat.ndim:].
    Returns None when the native library is unavailable (caller falls back).
    """
    lib = _lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float32)
    flat = np.ascontiguousarray(flat, dtype=np.float32)
    dark = np.ascontiguousarray(dark, dtype=np.float32)
    n_inner = int(np.prod(flat.shape))
    if data.shape[-flat.ndim:] != flat.shape or flat.shape != dark.shape:
        return None
    n_outer = int(np.prod(data.shape)) // n_inner
    out = np.empty_like(data)
    lib.normalise_f32(
        _fptr(data), _fptr(flat), _fptr(dark), _fptr(out),
        ctypes.c_int64(n_outer), ctypes.c_int64(n_inner),
        ctypes.c_int32(1 if log_transform else 0),
    )
    return out


def proj_stats_native(data: np.ndarray):
    """Per-projection (min, max, mean) over data (n_proj, ...); None if the
    native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.float32)
    n_proj = data.shape[0]
    n_pix = int(np.prod(data.shape[1:]))
    mins = np.empty(n_proj, np.float32)
    maxs = np.empty(n_proj, np.float32)
    means = np.empty(n_proj, np.float32)
    lib.proj_stats_f32(
        _fptr(data), ctypes.c_int64(n_proj), ctypes.c_int64(n_pix),
        _fptr(mins), _fptr(maxs), _fptr(means),
    )
    return mins, maxs, means
