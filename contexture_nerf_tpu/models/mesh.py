"""Host-side mesh IO + normalization.

Replaces the reference's kaolin OBJ/OFF importers and Mesh class
(reference: src/models/mesh.py:6-64, kaolin kal.io.obj/off). IO is host-side
numpy (not a device kernel — it runs once at init); geometry arrays are then
treated as static device constants by the renderer.

A native C++ fast path (contexture_nerf_tpu/native) is used when built; the
numpy parser below is the always-available fallback with identical output.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


def _triangulate_fan(idx_list):
    """Naive homogenization: fan-triangulate an n-gon (kaolin's
    heterogeneous_mesh_handler_naive_homogenize equivalent)."""
    out = []
    for k in range(1, len(idx_list) - 1):
        out.append((idx_list[0], idx_list[k], idx_list[k + 1]))
    return out


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Parse an OBJ file.

    Returns (vertices [N,3] f32, faces [F,3] i64, uvs [T,2] f32 or None,
    face_uvs_idx [F,3] i64 or None). Mirrors kaolin's import_mesh with
    naive homogenization of polygons (reference mesh.py:12-14).
    """
    try:
        from contexture_nerf_tpu.native import objio  # C++ fast path

        parsed = objio.load_obj(path)
        if parsed is not None:
            return parsed
    except Exception:
        pass

    verts, uvs = [], []
    face_v, face_vt = [], []
    with open(path, "r") as fh:
        for line in fh:
            if line.startswith("v "):
                p = line.split()
                verts.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("vt "):
                p = line.split()
                uvs.append((float(p[1]), float(p[2])))
            elif line.startswith("f "):
                p = line.split()[1:]
                vi, ti = [], []
                for tok in p:
                    comps = tok.split("/")
                    v = int(comps[0])
                    vi.append(v - 1 if v > 0 else len(verts) + v)
                    if len(comps) > 1 and comps[1] != "":
                        t = int(comps[1])
                        ti.append(t - 1 if t > 0 else len(uvs) + t)
                    else:
                        ti.append(-1)
                for tri in _triangulate_fan(list(range(len(vi)))):
                    face_v.append(tuple(vi[k] for k in tri))
                    face_vt.append(tuple(ti[k] for k in tri))

    vertices = np.asarray(verts, dtype=np.float32)
    faces = np.asarray(face_v, dtype=np.int64)
    uvs_arr = np.asarray(uvs, dtype=np.float32) if uvs else None
    ft = np.asarray(face_vt, dtype=np.int64) if uvs else None
    return vertices, faces, uvs_arr, ft


def load_off(path: str) -> Tuple[np.ndarray, np.ndarray, None, None]:
    """Parse an OFF file (reference mesh.py:16-17)."""
    with open(path, "r") as fh:
        tokens = fh.read().split()
    assert tokens[0] == "OFF", f"not an OFF file: {path}"
    nv, nf = int(tokens[1]), int(tokens[2])
    ptr = 4
    verts = np.asarray(tokens[ptr : ptr + 3 * nv], dtype=np.float32).reshape(nv, 3)
    ptr += 3 * nv
    faces = []
    for _ in range(nf):
        n = int(tokens[ptr])
        idx = [int(t) for t in tokens[ptr + 1 : ptr + 1 + n]]
        for tri in _triangulate_fan(idx):
            faces.append(tri)
        ptr += 1 + n
    return verts, np.asarray(faces, dtype=np.int64), None, None


def calculate_face_normals(vertices: np.ndarray, faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-face unit normals + areas via cross product (reference mesh.py:27-40)."""
    v0 = vertices[faces[:, 0]]
    v1 = vertices[faces[:, 1]]
    v2 = vertices[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    twice_area = np.linalg.norm(n, axis=-1)
    n = n / np.where(twice_area[:, None] == 0, 1.0, twice_area[:, None])
    return n.astype(np.float32), (twice_area / 2).astype(np.float32)


@dataclass
class Mesh:
    """Host-side mesh container (reference: src/models/mesh.py:6-64).

    vertices: [N,3] f32, faces: [F,3] i64, vt: [T,2] f32 UVs or None,
    ft: [F,3] i64 face->uv indices or None.
    """

    vertices: np.ndarray
    faces: np.ndarray
    vt: Optional[np.ndarray]
    ft: Optional[np.ndarray]
    normals: np.ndarray = None
    face_area: np.ndarray = None

    @classmethod
    def load(cls, obj_path: str) -> "Mesh":
        if ".obj" in str(obj_path):
            vertices, faces, vt, ft = load_obj(str(obj_path))
        elif ".off" in str(obj_path):
            vertices, faces, vt, ft = load_off(str(obj_path))
        else:
            raise ValueError(f"{obj_path} extension not implemented in mesh reader.")
        normals, face_area = calculate_face_normals(vertices, faces)
        return cls(vertices=vertices, faces=faces, vt=vt, ft=ft,
                   normals=normals, face_area=face_area)

    def normalize_mesh(self, inplace: bool = False, target_scale: float = 1.0,
                       dy: float = 0.0) -> "Mesh":
        """Center, scale into unit sphere * target_scale, shift y by dy
        (reference mesh.py:53-64)."""
        mesh = self if inplace else copy.deepcopy(self)
        verts = mesh.vertices.astype(np.float32)
        verts = verts - verts.mean(axis=0)
        scale = np.linalg.norm(verts, axis=1).max()
        verts = verts / scale * target_scale
        verts[:, 1] += dy
        mesh.vertices = verts
        mesh.normals, mesh.face_area = calculate_face_normals(mesh.vertices, mesh.faces)
        return mesh

    def standardize_mesh(self, inplace: bool = False) -> "Mesh":
        """Center and scale by the std of vertex norms (reference mesh.py:42-51)."""
        mesh = self if inplace else copy.deepcopy(self)
        verts = mesh.vertices.astype(np.float32)
        verts = verts - verts.mean(axis=0)
        verts = verts / np.linalg.norm(verts, axis=1).std()
        mesh.vertices = verts
        return mesh
