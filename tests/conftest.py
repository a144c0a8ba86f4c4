"""Test config: run on CPU with 8 virtual devices so multi-chip sharding tests
run cluster-free (SURVEY.md §4). Set RUN_TPU_TESTS=1 to keep the real backend
(TPU-gated tests check for it explicitly)."""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

if not os.environ.get("RUN_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
# 8 virtual devices for cluster-free sharding tests; optimization level 0
# because this CI host has a single CPU core and default XLA-CPU compiles of
# even tiny UNets take minutes there.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           + " --xla_backend_optimization_level=0")
# random-weight tiny towers init via eval_shape + numpy fill instead of a
# ~10 s XLA init compile per tower (core/fastinit.py); distribution is
# irrelevant to every test that uses tiny=True towers
os.environ.setdefault("CTN_FAST_TINY_INIT", "1")

import jax  # noqa: E402

if not os.environ.get("RUN_TPU_TESTS"):
    # the axon sitecustomize pins jax_platforms before env vars are read;
    # override via config so tests really run on the virtual-8-device CPU
    jax.config.update("jax_platforms", "cpu")

_CACHE = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_two_triangle_mesh():
    """Two triangles at different depths, with UVs."""
    vertices = np.array([
        [-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0],   # front tri
        [-0.6, -0.6, -0.4], [0.6, -0.6, -0.4], [0.0, 0.6, -0.4],  # back tri
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    vt = np.array([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9],
                   [0.1, 0.1], [0.9, 0.1], [0.5, 0.9]], np.float32)
    ft = faces.copy()
    return vertices, faces, vt, ft


def write_obj(path, vertices, faces, vt=None, ft=None):
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if vt is not None:
            for t in vt:
                f.write(f"vt {t[0]} {t[1]}\n")
        for i, face in enumerate(faces):
            if ft is not None:
                f.write("f " + " ".join(
                    f"{face[k]+1}/{ft[i][k]+1}" for k in range(3)) + "\n")
            else:
                f.write("f " + " ".join(str(face[k] + 1)
                                        for k in range(3)) + "\n")


@pytest.fixture
def tiny_mesh_obj(tmp_path):
    v, f, vt, ft = make_two_triangle_mesh()
    p = tmp_path / "tiny.obj"
    write_obj(p, v, f, vt, ft)
    return str(p)
