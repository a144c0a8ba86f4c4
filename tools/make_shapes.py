"""Generate procedural mesh assets (UV sphere, env sphere, torus, cube).

The reference ships binary OBJ assets (shapes/*.obj); this framework generates
its own procedurally so the repo stays source-only. Run once:
    python tools/make_shapes.py
"""

import os
from pathlib import Path

import numpy as np


def uv_sphere(n_lat=32, n_lon=64, radius=1.0, invert=False):
    """UV sphere with per-vertex UVs. Returns (verts, faces, vt, ft)."""
    verts, uvs = [], []
    for i in range(n_lat + 1):
        theta = np.pi * i / n_lat
        for j in range(n_lon + 1):
            phi = 2 * np.pi * j / n_lon
            verts.append((radius * np.sin(theta) * np.cos(phi),
                          radius * np.cos(theta),
                          radius * np.sin(theta) * np.sin(phi)))
            uvs.append((j / n_lon, 1 - i / n_lat))
    verts = np.asarray(verts, np.float32)
    uvs = np.asarray(uvs, np.float32)
    faces = []
    W = n_lon + 1
    for i in range(n_lat):
        for j in range(n_lon):
            a, b = i * W + j, i * W + j + 1
            c, d = (i + 1) * W + j, (i + 1) * W + j + 1
            if i > 0:
                faces.append((a, c, b) if not invert else (a, b, c))
            if i < n_lat - 1:
                faces.append((b, c, d) if not invert else (b, d, c))
    return verts, np.asarray(faces, np.int64), uvs, np.asarray(faces, np.int64)


def torus(R=0.7, r=0.3, n_major=48, n_minor=24):
    verts, uvs = [], []
    for i in range(n_major + 1):
        u = 2 * np.pi * i / n_major
        for j in range(n_minor + 1):
            v = 2 * np.pi * j / n_minor
            verts.append((((R + r * np.cos(v)) * np.cos(u)),
                          r * np.sin(v),
                          ((R + r * np.cos(v)) * np.sin(u))))
            uvs.append((i / n_major, j / n_minor))
    verts = np.asarray(verts, np.float32)
    uvs = np.asarray(uvs, np.float32)
    faces = []
    W = n_minor + 1
    for i in range(n_major):
        for j in range(n_minor):
            a, b = i * W + j, i * W + j + 1
            c, d = (i + 1) * W + j, (i + 1) * W + j + 1
            faces.append((a, c, b))
            faces.append((b, c, d))
    return verts, np.asarray(faces, np.int64), uvs, np.asarray(faces, np.int64)


def write_obj(path, verts, faces, vt=None, ft=None):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        if vt is not None:
            for t in vt:
                f.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
        for i, face in enumerate(faces):
            if ft is not None:
                f.write("f " + " ".join(f"{face[k]+1}/{ft[i][k]+1}"
                                        for k in range(3)) + "\n")
            else:
                f.write("f " + " ".join(str(face[k] + 1)
                                        for k in range(3)) + "\n")


def main(out_dir="shapes"):
    out = Path(out_dir)
    out.mkdir(exist_ok=True)
    write_obj(out / "sphere.obj", *uv_sphere(24, 48))
    write_obj(out / "env_sphere.obj", *uv_sphere(16, 32, radius=10.0,
                                                 invert=True))
    write_obj(out / "torus.obj", *torus())
    print(f"wrote sphere.obj, env_sphere.obj, torus.obj to {out}/")


if __name__ == "__main__":
    main()
