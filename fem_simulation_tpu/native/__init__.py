"""ctypes loader for the native topology builder (numpy fallback if absent).

Builds lazily with g++ on first import if the shared library is missing —
the native layer is the TPU framework's analog of the reference's Warp C++
runtime calls (SURVEY.md section 2.2). All entry points degrade gracefully to
the pure-numpy implementations in hierarchy.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "topology.cpp")
_LIB = os.path.join(_HERE, "libfemtopo.so")

_lib = None


def _build():
    cmd = ["g++", "-O2", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception:
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.galerkin_plan.restype = ctypes.c_int64
    lib.galerkin_plan.argtypes = [i32p, i32p, i32p, ctypes.c_int64,
                                  i32p, f32p, i32p, i32p, ctypes.c_int64,
                                  i32p, i32p, f32p, ctypes.c_int64]
    lib.hex_pairs_unique.restype = ctypes.c_int64
    lib.hex_pairs_unique.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.hex_slot_map.restype = ctypes.c_int64
    lib.hex_slot_map.argtypes = [i32p, ctypes.c_int64, i32p, i32p,
                                 ctypes.c_int64, i32p]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.points_inside_parity.restype = ctypes.c_int64
    lib.points_inside_parity.argtypes = [f64p, ctypes.c_int64, f64p,
                                         i32p, ctypes.c_int64, u8p]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def galerkin_plan(fi, fj, src_flat, p_idx, p_w, cnbr, cdeg, Kc):
    """Native Galerkin plan expansion; returns (g_src, g_dst, g_w) or None."""
    lib = load()
    if lib is None:
        return None
    fi = np.ascontiguousarray(fi, np.int32)
    fj = np.ascontiguousarray(fj, np.int32)
    src_flat = np.ascontiguousarray(src_flat, np.int32)
    p_idx_f = np.ascontiguousarray(p_idx.reshape(-1), np.int32)
    p_w_f = np.ascontiguousarray(p_w.reshape(-1), np.float32)
    cnbr_f = np.ascontiguousarray(cnbr.reshape(-1), np.int32)
    cdeg = np.ascontiguousarray(cdeg, np.int32)
    cap = fi.size * 64
    g_src = np.empty(cap, np.int32)
    g_dst = np.empty(cap, np.int32)
    g_w = np.empty(cap, np.float32)
    n = lib.galerkin_plan(fi, fj, src_flat, fi.size, p_idx_f, p_w_f,
                          cnbr_f, cdeg, cnbr.shape[1],
                          g_src, g_dst, g_w, cap)
    if n < 0:
        raise RuntimeError(f"galerkin_plan failed: {n}")
    return g_src[:n].copy(), g_dst[:n].copy(), g_w[:n].copy()


def hex_pairs_unique(hexes):
    lib = load()
    if lib is None:
        return None
    hexes_f = np.ascontiguousarray(hexes.reshape(-1), np.int32)
    H = hexes.shape[0]
    cap = H * 64
    out = np.empty((cap, 2), np.int32)
    n = lib.hex_pairs_unique(hexes_f, H, cap, out)
    if n < 0:
        raise RuntimeError(f"hex_pairs_unique failed: {n}")
    return out[:n].copy()


def points_inside(points, verts, tris):
    """Native ray-parity inside test (the voxelizer core; same semantics as
    mesh._points_inside's numpy path — tests assert bit-equality). Returns
    a (P,) bool array, or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float64)
    verts = np.ascontiguousarray(verts, np.float64)
    tris = np.ascontiguousarray(tris.reshape(-1), np.int32)
    out = np.empty(points.shape[0], np.uint8)
    n = lib.points_inside_parity(points, points.shape[0], verts,
                                 tris, tris.size // 3, out)
    if n != points.shape[0]:
        raise RuntimeError(f"points_inside_parity failed: {n}")
    return out.astype(bool)


def hex_slot_map(hexes, nbr, deg):
    lib = load()
    if lib is None:
        return None
    hexes_f = np.ascontiguousarray(hexes.reshape(-1), np.int32)
    nbr_f = np.ascontiguousarray(nbr.reshape(-1), np.int32)
    deg = np.ascontiguousarray(deg, np.int32)
    H = hexes.shape[0]
    out = np.empty(H * 64, np.int32)
    n = lib.hex_slot_map(hexes_f, H, nbr_f, deg, nbr.shape[1], out)
    if n < 0:
        raise RuntimeError("hex_slot_map: coupling not found in stencil")
    return out.reshape(H, 8, 8)
