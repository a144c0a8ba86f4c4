"""Texture sampling vs torch grid_sample, grid pack/unpack, image utils,
view weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contexture_nerf_tpu.ops.grid import merge_6_to_grid, split_grid_to_6
from contexture_nerf_tpu.ops.image import (color_with_shade,
                                           get_nonzero_region_tuple,
                                           get_view_direction,
                                           pad_tensor_to_size)
from contexture_nerf_tpu.ops.texture import sample_texture
from contexture_nerf_tpu.ops.view_weights import compute_view_weights


def test_sample_texture_matches_torch_grid_sample(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    tex = rng.standard_normal((2, 3, 9, 13)).astype(np.float32)
    uv = rng.uniform(0, 1, (2, 5, 7, 2)).astype(np.float32)

    out = np.asarray(sample_texture(jnp.asarray(uv), jnp.asarray(tex),
                                    "bilinear"))

    # kaolin texture_mapping: grid = uv*2-1, y negated, align_corners=False
    grid = torch.from_numpy(uv) * 2 - 1
    grid = torch.stack([grid[..., 0], -grid[..., 1]], dim=-1)
    ref = TF.grid_sample(torch.from_numpy(tex), grid, mode="bilinear",
                         align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)

    out_n = np.asarray(sample_texture(jnp.asarray(uv), jnp.asarray(tex),
                                      "nearest"))
    ref_n = TF.grid_sample(torch.from_numpy(tex), grid, mode="nearest",
                           align_corners=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out_n, ref_n, atol=1e-6)


def test_sample_texture_grad_to_texture():
    tex = jnp.ones((1, 3, 4, 4))
    uv = jnp.full((1, 2, 2, 2), 0.5)

    g = jax.grad(lambda t: jnp.sum(sample_texture(uv, t) ** 2))(tex)
    assert float(jnp.abs(g).sum()) > 0


def _reference_merge_loop(components, tile_size):
    """The reference's explicit loop (utils.py:326-347), in numpy."""
    C = components.shape[1]
    grid = np.empty((1, C, 3 * tile_size, 2 * tile_size), components.dtype)
    for col in range(2):
        for row in range(3):
            idx = 3 * col + row
            grid[0, :, row * tile_size:(row + 1) * tile_size,
                 col * tile_size:(col + 1) * tile_size] = components[idx]
    return grid


def test_grid_merge_split_roundtrip(rng):
    comp = rng.standard_normal((6, 4, 40, 40)).astype(np.float32)
    grid = np.asarray(merge_6_to_grid(jnp.asarray(comp)))
    ref = _reference_merge_loop(comp, 40)
    np.testing.assert_array_equal(grid, ref)
    back = np.asarray(split_grid_to_6(jnp.asarray(grid), 40))
    np.testing.assert_array_equal(back, comp)


def test_get_nonzero_region_square_with_margin():
    mask = np.zeros((100, 100))
    mask[40:60, 30:45] = 1
    min_h, min_w, max_h, max_w = get_nonzero_region_tuple(mask)
    assert max_h - min_h == max_w - min_w  # square
    assert max_h - min_h == 22  # 20 * 1.1
    assert min_h <= 40 and max_h >= 60 and min_w <= 30 and max_w >= 45


def test_view_direction_bins():
    front, overhead = np.deg2rad(70), np.deg2rad(40)
    th = np.deg2rad([60, 60, 60, 60, 10, 175])
    ph = np.deg2rad([0, 90, 180, 270, 0, 0])
    dirs = get_view_direction(th, ph, overhead, front)
    np.testing.assert_array_equal(dirs, [0, 1, 2, 3, 4, 5])


def test_pad_tensor():
    x = jnp.zeros((1, 3, 4, 6))
    p = pad_tensor_to_size(x, 8, 8, value=1.0)
    assert p.shape == (1, 3, 8, 8)
    assert float(p[0, 0, 0, 0]) == 1.0
    assert float(p[0, 0, 2, 1]) == 0.0


def test_color_with_shade_shape():
    z = jnp.ones((2, 1, 4, 4)) * 0.5
    c = color_with_shade([0.85, 0.85, 0.85], z, light_coef=0.3)
    assert c.shape == (2, 3, 4, 4)
    np.testing.assert_allclose(np.asarray(c[0, 0]), 0.85 * (0.3 + 0.7 * 0.5),
                               atol=1e-6)


def test_view_weights_winner_takes_pixel():
    """Face 0 seen head-on in view 0 (nz=0.9) and obliquely in view 1
    (nz=0.2): view 1's pixels of face 0 are masked out."""
    B, F, H, W = 2, 2, 4, 4
    face_idx = np.full((B, 1, H, W), -1, np.int32)
    face_idx[0, 0, :2] = 0   # view 0 sees face 0
    face_idx[0, 0, 2:] = 1   # and face 1
    face_idx[1, 0, :2] = 0   # view 1 sees face 0 too
    nz = np.array([[0.9, 0.3], [0.2, 0.8]], np.float32)
    w = np.asarray(compute_view_weights(jnp.asarray(face_idx),
                                        jnp.asarray(nz)))
    assert w[0, 0, :2].all()       # view 0 wins face 0
    assert w[0, 0, 2:].all()       # face 1 only visible in view 0
    assert not w[1, 0, :2].any()   # view 1 loses face 0
    assert w[1, 0, 2:].all()       # background stays True


@pytest.mark.slow
def test_view_consistency_identical_views():
    """Two identical views of one face: consistency should be ~1."""
    from contexture_nerf_tpu.ops.view_consistency import (
        compute_view_consistency)

    V, H, W = 2, 8, 8
    faces = jnp.array([[0, 1, 2]])
    face_idx = np.full((V, H, W), -1, np.int32)
    face_idx[:, 2:6, 2:6] = 0
    fvi = jnp.tile(jnp.array([[[[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]]]]),
                   (V, 1, 1, 1))
    imgs = jnp.ones((V, 3, H, W)) * 0.5
    sim = compute_view_consistency(imgs, faces, jnp.asarray(face_idx), fvi)
    assert float(sim) == pytest.approx(1.0, abs=1e-5)

    # different colors in the two views -> similarity drops
    imgs2 = imgs.at[1].set(0.9)
    sim2 = compute_view_consistency(imgs2, faces, jnp.asarray(face_idx), fvi)
    assert float(sim2) < float(sim)


def test_smooth_image_and_colormap(tmp_path):
    from contexture_nerf_tpu.ops.image import save_colormap, smooth_image

    img = jnp.zeros((3, 16, 16)).at[:, 8, 8].set(1.0)
    out = smooth_image(img, sigma=2.0, kernel_size=9)
    assert out.shape == (3, 16, 16)
    assert float(out[0, 8, 8]) < 1.0 and float(out[0, 7, 8]) > 0.0
    # energy preserved by the normalized kernel (away from borders)
    np.testing.assert_allclose(float(out[0].sum()), 1.0, rtol=1e-5)

    save_colormap(np.linspace(0, 1, 64).reshape(8, 8), tmp_path / "cm.png")
    assert (tmp_path / "cm.png").exists()


def test_crop_img_to_bounding_box_and_vectorized():
    from contexture_nerf_tpu.ops.image import (crop_img_to_bounding_box,
                                               get_nonzero_region_tuple,
                                               get_nonzero_region_vectorized)

    masks = np.zeros((2, 20, 20), np.float32)
    masks[0, 5:9, 5:9] = 1
    masks[1, 2:14, 3:11] = 1
    boxes = get_nonzero_region_vectorized(masks)
    assert boxes.shape == (2, 4)
    np.testing.assert_array_equal(
        boxes[0], np.asarray(get_nonzero_region_tuple(masks[0])))

    img = jnp.asarray(np.random.default_rng(0).uniform(0, 0.5, (2, 3, 20, 20))
                      .astype(np.float32))
    out = crop_img_to_bounding_box(img, boxes)
    assert out.shape[0] == 2 and out.shape[1] == 3
    h0 = boxes[0, 2] - boxes[0, 0]
    w0 = boxes[0, 3] - boxes[0, 1]
    np.testing.assert_allclose(
        np.asarray(out[0, :, :h0, :w0]),
        np.asarray(img[0, :, boxes[0, 0]:boxes[0, 2],
                       boxes[0, 1]:boxes[0, 3]]))
    # background fill = 1 (reference utils.py:207)
    if out.shape[2] > h0:
        np.testing.assert_allclose(np.asarray(out[0, :, h0:, :]), 1.0)
