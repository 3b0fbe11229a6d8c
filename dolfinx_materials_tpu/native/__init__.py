"""ctypes bindings to the fastmesh C++ engine, with automatic build + fallback.

The library is compiled on first use (g++, ~1 s) and cached next to the source;
if no toolchain is available every entry point returns None and callers fall back
to the numpy implementations in fem/mesh.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastmesh.cpp")
_LIB = os.path.join(_HERE, "libfastmesh.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.structured_quad_mesh.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int32),
        ]
        lib.structured_hex_mesh.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.int32),
        ]
        lib.unique_faces.restype = ctypes.c_int64
        lib.unique_faces.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            ctypes.c_int64,
        ]
        lib.unique_edges.restype = ctypes.c_int64
        lib.unique_edges.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - toolchain-less environments
        from .. import PerformanceWarning

        warnings.warn(
            f"fastmesh C++ engine unavailable ({exc}); using numpy fallbacks",
            PerformanceWarning,
        )
        _lib = None
    return _lib


def structured_quad_mesh(nx, ny, p0, p1):
    lib = _load()
    if lib is None:
        return None
    points = np.empty(((nx + 1) * (ny + 1), 2))
    cells = np.empty((nx * ny, 4), dtype=np.int32)
    bounds = np.asarray([p0[0], p0[1], p1[0], p1[1]], dtype=np.float64)
    lib.structured_quad_mesh(nx, ny, bounds, points, cells)
    return points, cells


def structured_hex_mesh(nx, ny, nz, p0, p1):
    lib = _load()
    if lib is None:
        return None
    npts = (nx + 1) * (ny + 1) * (nz + 1)
    points = np.empty((npts, 3))
    cells = np.empty((nx * ny * nz, 8), dtype=np.int32)
    bounds = np.asarray(
        [p0[0], p0[1], p0[2], p1[0], p1[1], p1[2]], dtype=np.float64
    )
    lib.structured_hex_mesh(nx, ny, nz, bounds, points, cells)
    return points, cells


def unique_edges(ev):
    """ev: (ncells, nle, 2) int32 -> (edge_verts (ne,2), cell_edges (ncells,nle))."""
    lib = _load()
    if lib is None:
        return None
    ncells, nle, _ = ev.shape
    ev = np.ascontiguousarray(ev, dtype=np.int32)
    cell_edges = np.empty((ncells, nle), dtype=np.int32)
    cap = ncells * nle
    edge_verts = np.empty((cap, 2), dtype=np.int32)
    n = lib.unique_edges(ncells, nle, ev.reshape(-1), cell_edges.reshape(-1),
                         edge_verts.reshape(-1), cap)
    if n < 0:
        return None
    return edge_verts[:n].copy(), cell_edges


def unique_faces(fv):
    """fv: (ncells, nlf, nfv) int32 -> (face_verts (nf, nfv) sorted tuples,
    cell_faces (ncells, nlf)); None if the native engine is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ncells, nlf, nfv = fv.shape
    fv = np.ascontiguousarray(fv, dtype=np.int32)
    cell_faces = np.empty((ncells, nlf), dtype=np.int32)
    cap = ncells * nlf
    face_verts = np.empty((cap, nfv), dtype=np.int32)
    n = lib.unique_faces(ncells, nlf, nfv, fv.reshape(-1),
                         cell_faces.reshape(-1), face_verts.reshape(-1), cap)
    if n < 0:
        return None
    return face_verts[:n].copy(), cell_faces
