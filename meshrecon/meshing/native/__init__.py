"""Native (C++) host-side meshing helpers.

The reference keeps its combinatorial meshing in native code (CGAL/PCL); this
package holds our C++ equivalents, built on demand with g++ and loaded via
ctypes. Every entry point has a NumPy fallback in the pure-Python modules, so
the framework works (slower) without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_DIR, "meshing_native.cpp")
    if not os.path.exists(src):
        return None
    so = os.path.join(_DIR, "_meshing_native.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        cmd = [
            "g++",
            "-O3",
            "-march=native",
            "-shared",
            "-fPIC",
            "-std=c++17",
            src,
            "-o",
            so,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception:
            return None
    try:
        _LIB = ctypes.CDLL(so)
    except OSError:
        return None
    return _LIB


def marching_tetrahedra_native(chi: np.ndarray, iso: float):
    """C++ marching tetrahedra; returns (verts, faces) or None if unavailable."""
    lib = _build_and_load()
    if lib is None or not hasattr(lib, "mt_extract"):
        return None
    g = chi.shape[0]
    chi = np.ascontiguousarray(chi, dtype=np.float32)
    # generous capacity: <= 2 triangles per tet, 6 tets per cell
    max_tris = 12 * (g - 1) ** 3
    # capacity is resized by a first counting pass inside the C++ side
    nv = ctypes.c_longlong(0)
    nf = ctypes.c_longlong(0)
    lib.mt_extract.restype = ctypes.c_int
    lib.mt_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    verts = np.empty((3 * max_tris, 3), dtype=np.float32)
    faces = np.empty((max_tris, 3), dtype=np.int32)
    rc = lib.mt_extract(
        chi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_longlong(g),
        ctypes.c_float(iso),
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_longlong(max_tris),
        ctypes.byref(nv),
        ctypes.byref(nf),
    )
    if rc != 0:
        return None
    return verts[: nv.value].copy(), faces[: nf.value].copy()


def greedy_suppress_native(order, score, density, nbr_ptr, nbr_idx, nbr_w, limit):
    """C++ greedy density suppression; returns kept indices or None."""
    lib = _build_and_load()
    if lib is None or not hasattr(lib, "greedy_suppress"):
        return None
    order = np.ascontiguousarray(order, dtype=np.int64)
    score = np.ascontiguousarray(score, dtype=np.float32)
    density = np.ascontiguousarray(density, dtype=np.float32)
    nbr_ptr = np.ascontiguousarray(nbr_ptr, dtype=np.int64)
    nbr_idx = np.ascontiguousarray(nbr_idx, dtype=np.int64)
    nbr_w = np.ascontiguousarray(nbr_w, dtype=np.float32)
    kept = np.empty(len(order), dtype=np.int64)
    lib.greedy_suppress.restype = ctypes.c_longlong
    nkept = lib.greedy_suppress(
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        ctypes.c_longlong(len(order)),
        score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        density.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nbr_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        nbr_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        nbr_w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(limit),
        kept.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
    )
    if nkept < 0:
        return None
    return kept[:nkept].copy()


def filter_points_full_native(points3, radius_sq, density_limit,
                              max_neighbors=64, max_iters=60):
    """Full native point filter (grid hash + density + greedy).

    Returns (kept_idx (M,), density (N,), score (N,)) or None if unavailable.
    """
    lib = _build_and_load()
    if lib is None or not hasattr(lib, "filter_points_native"):
        return None
    pts = np.ascontiguousarray(points3, dtype=np.float32)
    n = len(pts)
    kept = np.empty(n, dtype=np.int64)
    density = np.empty(n, dtype=np.float32)
    score = np.empty(n, dtype=np.float32)
    lib.filter_points_native.restype = ctypes.c_longlong
    nkept = lib.filter_points_native(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_longlong(n),
        ctypes.c_float(radius_sq),
        ctypes.c_float(density_limit),
        ctypes.c_int(max_neighbors),
        ctypes.c_int(max_iters),
        kept.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        density.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if nkept < 0:
        return None
    return kept[:nkept].copy(), density, score


def density_greedy_native(ei, ej, w, n, density_limit, max_iters=60):
    """C++ density iteration + greedy over a precomputed half-edge graph.

    Edges must be sorted/grouped by ei. Returns (kept, density, score) or None.
    """
    lib = _build_and_load()
    if lib is None or not hasattr(lib, "density_greedy_native"):
        return None
    ei = np.ascontiguousarray(ei, dtype=np.int64)
    ej = np.ascontiguousarray(ej, dtype=np.int64)
    w = np.ascontiguousarray(w, dtype=np.float32)
    kept = np.empty(n, dtype=np.int64)
    density = np.empty(n, dtype=np.float32)
    score = np.empty(n, dtype=np.float32)
    lib.density_greedy_native.restype = ctypes.c_longlong
    nkept = lib.density_greedy_native(
        ei.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        ej.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_longlong(len(ei)),
        ctypes.c_longlong(n),
        ctypes.c_float(density_limit),
        ctypes.c_int(max_iters),
        kept.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        density.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        score.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if nkept < 0:
        return None
    return kept[:nkept].copy(), density, score
