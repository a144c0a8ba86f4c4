"""Texture field (embedder/MLP) + TexturedMeshModel render path + datasets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contexture_nerf_tpu.core.config import GuideConfig, RenderConfig
from contexture_nerf_tpu.models.fields import (NeRF2D, embedder_out_dim,
                                               fourier_embed, uv_lattice)
from contexture_nerf_tpu.models.mesh import Mesh
from contexture_nerf_tpu.models.textured_mesh import TexturedMeshModel
from contexture_nerf_tpu.training.views_dataset import (MultiviewDataset,
                                                        ViewsDataset,
                                                        Zero123PlusDataset)


def test_embedder_matches_reference_formula():
    x = jnp.array([[0.25, 0.75]])
    emb = fourier_embed(x, multires=10)
    assert emb.shape == (1, embedder_out_dim(10))
    assert embedder_out_dim(10) == 42  # 2 + 2*10*2 (trainer.py:129)
    np.testing.assert_allclose(np.asarray(emb[0, :2]), [0.25, 0.75])
    # ordering: x, sin(1x), cos(1x), sin(2x), cos(2x), ...
    np.testing.assert_allclose(np.asarray(emb[0, 2:4]),
                               np.sin([0.25, 0.75]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:6]),
                               np.cos([0.25, 0.75]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 6:8]),
                               np.sin([0.5, 1.5]), atol=1e-6)


def test_nerf2d_shapes_and_param_count():
    mlp = NeRF2D(input_ch=42)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 42)))
    out = mlp.apply(params, jnp.zeros((5, 42)))
    assert out.shape == (5, 3)
    # reference torch param count: 8 layers + skip layer widening + output
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    expected = (42 * 256 + 256) + 6 * (256 * 256 + 256) + \
        ((256 + 42) * 256 + 256) + (256 * 3 + 3)
    assert n == expected


def test_uv_lattice_ordering():
    uv = np.asarray(uv_lattice(3)).reshape(3, 3, 2)
    # pixel (row i, col j) -> (u=j/2, v=i/2)  (textured_mesh.py:269-272)
    np.testing.assert_allclose(uv[0, :, 0], [0, 0.5, 1])
    np.testing.assert_allclose(uv[:, 0, 1], [0, 0.5, 1])


@pytest.fixture
def model(tiny_mesh_obj):
    guide = GuideConfig(text="t", shape_path=tiny_mesh_obj)
    return TexturedMeshModel(guide, render_grid_size=64,
                             texture_resolution=32, cache_path=None,
                             env_sphere_path="/nonexistent", backend="xla")


def test_render_outputs(model):
    params = model.init_params(jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.render(
        p, theta=np.pi / 2, phi=0.0, radius=2.0,
        background=jnp.array([0.5, 0.5, 0.5])))(params)
    assert out["image"].shape == (1, 3, 64, 64)
    assert out["mask"].shape == (1, 1, 64, 64)
    assert out["depth"].shape == (1, 1, 64, 64)
    assert out["normals"].shape == (1, 3, 64, 64)
    assert out["texture_map"].shape == (1, 3, 32, 32)
    m = np.asarray(out["mask"][0, 0])
    assert m.sum() > 0 and m.sum() < m.size
    img = np.asarray(out["image"][0])
    bg = m == 0
    np.testing.assert_allclose(img[:, bg], 0.5, atol=1e-6)
    d = np.asarray(out["depth"][0, 0])
    assert d[m > 0].max() == pytest.approx(1.0, abs=1e-5)
    assert (d[bg] == 0).all()


def test_render_cache_reuse_and_batching(model):
    params = model.init_params(jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.render(
        p, theta=[np.pi / 2, np.pi / 3], phi=[0.0, 1.0],
        radius=[2.0, 2.0], background="white"))(params)
    assert out["image"].shape == (2, 3, 64, 64)
    out2 = jax.jit(lambda p, rc: model.render(
        p, render_cache=rc, background="white"))(params, out["render_cache"])
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(out2["image"]), atol=1e-6)


def test_gradient_flows_to_mlp_through_render(model):
    """Milestone-1 property: d(render)/d(MLP params) is nonzero & finite."""
    params = model.init_params(jax.random.PRNGKey(0))
    cache = model.render_geometry(theta=np.pi / 2, phi=0.0, radius=2.0)

    def loss(p):
        out = model.render(p, render_cache=cache,
                           background=jnp.zeros(3))
        return jnp.mean((out["image"] - 0.7) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_export_mesh(model, tmp_path):
    params = model.init_params(jax.random.PRNGKey(0))
    model.export_mesh(tmp_path, params)
    assert (tmp_path / "mesh.obj").exists()
    assert (tmp_path / "mesh.mtl").exists()
    assert (tmp_path / "albedo.png").exists()
    m = Mesh.load(str(tmp_path / "mesh.obj"))
    assert m.vertices.shape == model.mesh.vertices.shape
    assert m.vt is not None


def test_zero123plus_dataset_poses():
    ds = Zero123PlusDataset(RenderConfig())
    poses = ds.poses()
    assert len(poses) == 7
    np.testing.assert_allclose([np.rad2deg(p["theta"]) for p in poses],
                               [60, 60, 60, 60, 110, 110, 110])
    np.testing.assert_allclose([np.rad2deg(p["phi"]) for p in poses],
                               [0, 30, 150, 270, 90, 210, 330])
    assert poses[0]["radius"] == 1.5


def test_multiview_dataset_alternation():
    ds = MultiviewDataset(RenderConfig())
    phis = [round(np.rad2deg(p["phi"])) for p in ds.poses()]
    # n_views=8 alternate + views_after [180,30],[180,150]
    assert phis == [0, 45, 315, 90, 270, 135, 225, 180, 180, 180]
    thetas = [round(np.rad2deg(p["theta"])) for p in ds.poses()]
    assert thetas == [60] * 8 + [30, 150]


def test_views_dataset_turntable():
    ds = ViewsDataset(RenderConfig(), size=10)
    poses = ds.poses()
    assert len(poses) == 10
    assert poses[0]["radius"] == pytest.approx(1.5 * 1.2)
    np.testing.assert_allclose([np.rad2deg(p["phi"]) for p in poses],
                               np.arange(10) * 36)


def test_mesh_normalization(tiny_mesh_obj):
    m = Mesh.load(tiny_mesh_obj).normalize_mesh(target_scale=0.6, dy=0.25)
    v = m.vertices - np.array([0, 0.25, 0])
    assert np.linalg.norm(v, axis=1).max() == pytest.approx(0.6, rel=1e-5)


def test_native_objio_matches_python_parser(tiny_mesh_obj):
    """C++ fast path == numpy fallback on the same OBJ."""
    pytest.importorskip("ctypes")
    from contexture_nerf_tpu.native.objio import load_obj as native_load

    r = native_load(tiny_mesh_obj)
    if r is None:
        pytest.skip("native toolchain unavailable")
    v_n, f_n, vt_n, ft_n = r
    # parse with the pure-python path by disabling the native fast path
    from contexture_nerf_tpu.native import objio as native_mod
    import contexture_nerf_tpu.models.mesh as mesh_mod

    orig = native_mod.load_obj
    native_mod.load_obj = lambda path: None
    try:
        m = mesh_mod.Mesh.load(tiny_mesh_obj)
    finally:
        native_mod.load_obj = orig
    np.testing.assert_allclose(v_n, m.vertices, atol=1e-6)
    np.testing.assert_array_equal(f_n, m.faces)
    if m.vt is not None:
        np.testing.assert_allclose(vt_n, m.vt, atol=1e-6)
        np.testing.assert_array_equal(ft_n, m.ft)
