"""ctypes bindings for the native OBJ loader / atlas packer.

Builds lazily with g++ on first use (cached as libobjio.so next to the
source); all callers fall back to the pure-numpy implementations when the
toolchain is unavailable."""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libobjio.so"
_LIB = None


class _ObjMesh(ctypes.Structure):
    _fields_ = [
        ("vertices", ctypes.POINTER(ctypes.c_float)),
        ("n_vertices", ctypes.c_int64),
        ("faces", ctypes.POINTER(ctypes.c_int64)),
        ("n_faces", ctypes.c_int64),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("n_uvs", ctypes.c_int64),
        ("face_uvs", ctypes.POINTER(ctypes.c_int64)),
    ]


def _build() -> Optional[Path]:
    src = _DIR / "objio.cpp"
    # rebuild when the source is newer than the cached .so (a stale library
    # from an older checkout would miss newly added symbols)
    if _SO.exists() and _SO.stat().st_mtime >= src.stat().st_mtime:
        return _SO
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", str(src),
                        "-o", str(_SO)], check=True, capture_output=True,
                       timeout=120)
        return _SO
    except Exception:
        return None


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _build()
    if so is None:
        _LIB = False
        return False
    try:
        lib = ctypes.CDLL(str(so))
        lib.objio_load.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(_ObjMesh)]
        lib.objio_load.restype = ctypes.c_int
        lib.objio_free.argtypes = [ctypes.POINTER(_ObjMesh)]
        lib.objio_chart_unwrap.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.objio_chart_unwrap.restype = ctypes.c_int
    except (OSError, AttributeError):
        # unloadable or symbol-incomplete library: numpy fallback
        _LIB = False
        return False
    _LIB = lib
    return lib


def load_obj(path: str):
    """Native OBJ parse; returns (verts, faces, uvs|None, ft|None) or None if
    the native library is unavailable."""
    lib = _lib()
    if not lib:
        return None
    mesh = _ObjMesh()
    rc = lib.objio_load(str(path).encode(), ctypes.byref(mesh))
    if rc != 0:
        return None
    try:
        nv, nf, nt = mesh.n_vertices, mesh.n_faces, mesh.n_uvs
        verts = np.ctypeslib.as_array(mesh.vertices, (nv, 3)).copy()
        faces = np.ctypeslib.as_array(mesh.faces, (nf, 3)).copy()
        if nt > 0:
            uvs = np.ctypeslib.as_array(mesh.uvs, (nt, 2)).copy()
            ft = np.ctypeslib.as_array(mesh.face_uvs, (nf, 3)).copy()
            if ft.min() < 0:
                uvs, ft = None, None
        else:
            uvs, ft = None, None
        return verts, faces, uvs, ft
    finally:
        lib.objio_free(ctypes.byref(mesh))


def chart_unwrap_native(vertices: np.ndarray, faces: np.ndarray,
                        angle_thr_deg: float = 75.0,
                        gutter: float = 4.0 / 1024.0
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native connected-chart UV unwrap (same algorithm as
    models/textured_mesh.py::atlas_unwrap — BFS chart growth + planar
    parameterization + shelf packing; verified to produce identical ft and
    near-identical vt). Returns (vt, ft) or None when the native library is
    unavailable."""
    lib = _lib()
    if not lib:
        return None
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int64)
    F = faces.shape[0]
    vt = np.zeros((3 * F, 2), np.float32)
    ft = np.zeros((F, 3), np.int64)
    n_vt = np.zeros((1,), np.int64)
    rc = lib.objio_chart_unwrap(
        vertices.shape[0],
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        F, faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_float(angle_thr_deg), ctypes.c_float(gutter),
        vt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ft.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_vt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        return None
    return vt[:int(n_vt[0])].copy(), ft
