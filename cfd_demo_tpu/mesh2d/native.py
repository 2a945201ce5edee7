"""ctypes loader for the native geometry core (native/geom.cpp).

Auto-builds ``libcfdgeom.so`` on first use when a compiler is present;
every entry point has a pure-Python/NumPy fallback in this package, so
the framework works without a toolchain. The accelerated paths are the
host-side hot spots: batched containment (rasterizers / mesh filters),
quadtree tesselation and face adjacency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build() -> Optional[str]:
    so = os.path.abspath(os.path.join(_ROOT, "libcfdgeom.so"))
    src = os.path.abspath(os.path.join(_ROOT, "geom.cpp"))
    if not os.path.exists(src):
        return None
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(src)):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", src, "-o", so],
            check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        c_d = ctypes.POINTER(ctypes.c_double)
        c_i64 = ctypes.POINTER(ctypes.c_int64)
        c_u8 = ctypes.POINTER(ctypes.c_uint8)
        lib.geom_contains_points.argtypes = [c_d, c_i64, ctypes.c_int64,
                                             c_d, ctypes.c_int64, c_u8]
        lib.geom_tesselate.restype = c_d
        lib.geom_tesselate.argtypes = [c_d, c_i64, ctypes.c_int64,
                                       ctypes.c_double, ctypes.c_double,
                                       ctypes.c_double, ctypes.c_double,
                                       ctypes.c_double, c_i64]
        lib.geom_face_adjacency.restype = c_i64
        lib.geom_face_adjacency.argtypes = [c_d, c_d, c_d, ctypes.c_int64,
                                            ctypes.c_int, ctypes.c_double,
                                            c_i64, c_i64]
        lib.geom_free.argtypes = [ctypes.c_void_p]
        lib.geom_seg_intersect.restype = ctypes.c_int
        lib.geom_seg_intersect.argtypes = [ctypes.c_double] * 8
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None


def _rings(polygon) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Flattened outer + hole rings, or None when the polygon has
    nested holes (islands) that the flat C ABI cannot express -- the
    caller then falls back to the recursive Python path."""
    if any(h.holes for h in polygon.holes):
        return None
    rings = [polygon.ring] + [h.ring for h in polygon.holes]
    offsets = np.zeros(len(rings) + 1, np.int64)
    np.cumsum([len(r) for r in rings], out=offsets[1:])
    xy = np.ascontiguousarray(np.concatenate(rings, axis=0), np.float64)
    return xy, offsets


def _pd(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _pi(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def contains_points(polygon, pts: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    rings = _rings(polygon)
    if rings is None:
        return None
    xy, off = rings
    p = np.ascontiguousarray(pts, np.float64).reshape(-1, 2)
    out = np.zeros(len(p), np.uint8)
    lib.geom_contains_points(
        _pd(xy), _pi(off), len(off) - 1, _pd(p), len(p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)


def tesselate_leaves(polygon, feature: float,
                     max_cell: float) -> Optional[np.ndarray]:
    """(n, 4) array of (cx, cy, hw, hh) leaf cells."""
    lib = load()
    if lib is None:
        return None
    rings = _rings(polygon)
    if rings is None:
        return None
    xy, off = rings
    sq = polygon.bounding_square()
    n = ctypes.c_int64(0)
    ptr = lib.geom_tesselate(_pd(xy), _pi(off), len(off) - 1,
                             sq.cx, sq.cy, sq.half_width,
                             feature, max_cell, ctypes.byref(n))
    out = np.ctypeslib.as_array(ptr, shape=(n.value, 4)).copy()
    lib.geom_free(ptr)
    return out


def face_adjacency(centers: np.ndarray, half_w: np.ndarray,
                   half_h: np.ndarray, face: int,
                   eps: float = 1e-6) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(offsets, indices) CSR for face 0=E 1=W 2=N 3=S."""
    lib = load()
    if lib is None:
        return None
    n = len(centers)
    c = np.ascontiguousarray(centers, np.float64)
    hw = np.ascontiguousarray(half_w, np.float64)
    hh = np.ascontiguousarray(half_h, np.float64)
    offsets = np.zeros(n + 1, np.int64)
    n_idx = ctypes.c_int64(0)
    ptr = lib.geom_face_adjacency(_pd(c), _pd(hw), _pd(hh), n, face, eps,
                                  _pi(offsets), ctypes.byref(n_idx))
    idx = (np.ctypeslib.as_array(ptr, shape=(n_idx.value,)).copy()
           if n_idx.value else np.zeros(0, np.int64))
    lib.geom_free(ptr)
    return offsets, idx
