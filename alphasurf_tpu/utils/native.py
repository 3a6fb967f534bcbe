"""Loader for the native C++ runtime library (csrc/native.cpp).

Compiles on first use with g++ (no pybind11 in this image — plain C ABI via
ctypes) and caches the .so next to the source. Every entry point has a pure
NumPy fallback in its caller, so the framework works without a compiler;
the native path is the production one (threaded, allocation-free).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SRC = os.path.abspath(os.path.join(_CSRC, "native.cpp"))
_SO = os.path.abspath(os.path.join(_CSRC, "libalphasurf_native.so"))

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        stale = (
            not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        )
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.mt_run.restype = ctypes.c_void_p
        lib.mt_run.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.mt_fetch.restype = None
        lib.mt_fetch.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double)]
        lib.voxel_downsample.restype = ctypes.c_int64
        lib.voxel_downsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.shuffle_gather_f32.restype = None
        lib.shuffle_gather_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def marching_tetrahedra(field: np.ndarray, level: float = 0.0):
    """Native marching tetrahedra; returns (verts (V,3) f64, faces (F,3) i32)
    or None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f = np.ascontiguousarray(field, np.float32)
    X, Y, Z = f.shape
    n_tris = ctypes.c_int64(0)
    nth = min(os.cpu_count() or 1, 16)
    h = lib.mt_run(_fptr(f), X, Y, Z, float(level), ctypes.byref(n_tris), nth)
    T = n_tris.value
    verts = np.empty((T * 3, 3), np.float64)
    lib.mt_fetch(h, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    faces = np.arange(T * 3, dtype=np.int32).reshape(-1, 3)
    return verts, faces


def voxel_downsample_indices(pts: np.ndarray, radius: float):
    """Ascending indices of the first point per voxel cell, or None."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(pts, np.float32)
    idx = np.empty(len(p), np.int64)
    m = lib.voxel_downsample(
        _fptr(p), len(p), float(radius),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return idx[:m]


def shuffle_gather(src: np.ndarray, perm: np.ndarray):
    """out[i] = src[perm[i]] with a threaded row gather, or None."""
    lib = get_lib()
    if lib is None:
        return None
    s = np.ascontiguousarray(src, np.float32)
    flat = s.reshape(len(s), -1)
    p = np.ascontiguousarray(perm, np.int64)
    out = np.empty_like(flat)
    nth = min(os.cpu_count() or 1, 16)
    lib.shuffle_gather_f32(
        _fptr(flat), p.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _fptr(out), flat.shape[0], flat.shape[1], nth,
    )
    return out.reshape(s.shape)
