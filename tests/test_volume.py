"""Volume rendering primitives (models/volume.py): analytic checks.

The reference carries these as dead upstream-NeRF torch code
(src/run_nerf_helpers.py:139-225); here they are live capability (BASELINE.md
"NeRF texture-field volume render" row) and tested as such."""

import jax
import jax.numpy as jnp
import numpy as np

from contexture_nerf_tpu.models.volume import (composite, get_rays, ndc_rays,
                                               sample_pdf,
                                               stratified_samples,
                                               volume_render)


def test_get_rays_center_pixel_looks_down_minus_z():
    H = W = 5
    K = jnp.asarray([[10.0, 0, 2.0], [0, 10.0, 2.0], [0, 0, 1]])
    c2w = jnp.eye(4)[:3]
    rays_o, rays_d = get_rays(H, W, K, c2w)
    assert rays_o.shape == (H, W, 3) and rays_d.shape == (H, W, 3)
    np.testing.assert_allclose(np.asarray(rays_d[2, 2]), [0, 0, -1],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays_o), 0.0)


def test_ndc_rays_o2_at_near_plane():
    rays_o = jnp.asarray([[0.0, 0.0, -1.0]])
    rays_d = jnp.asarray([[0.0, 0.0, -1.0]])
    o, d = ndc_rays(8, 8, 10.0, 1.0, rays_o, rays_d)
    # at the near plane o2 = 1 + 2*near/oz = 1 - 2 = -1
    np.testing.assert_allclose(float(o[0, 2]), -1.0, atol=1e-6)


def test_stratified_samples_in_bins():
    z = stratified_samples(jax.random.PRNGKey(0), 1.0, 2.0, 16, 8)
    assert z.shape == (16, 8)
    assert float(z.min()) >= 1.0 and float(z.max()) <= 2.0
    assert np.all(np.diff(np.asarray(z), axis=-1) > 0)


def test_sample_pdf_uniform_weights_det():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
    weights = jnp.ones((4, 8))
    s = sample_pdf(jax.random.PRNGKey(0), bins, weights, 5, det=True)
    np.testing.assert_allclose(np.asarray(s),
                               np.broadcast_to(np.linspace(0, 1, 5), (4, 5)),
                               atol=1e-5)


def test_sample_pdf_concentrates_on_heavy_bin():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
    weights = jnp.zeros((1, 10)).at[0, 7].set(1.0)
    s = sample_pdf(jax.random.PRNGKey(1), bins, weights, 64)
    frac = float(((s >= 0.7) & (s <= 0.8)).mean())
    assert frac > 0.95, frac


def test_composite_opaque_surface():
    R, S = 3, 32
    z = jnp.broadcast_to(jnp.linspace(0.5, 2.5, S), (R, S))
    rays_d = jnp.asarray([[0, 0, -1.0]] * R)
    # opaque wall at z >= 1.5, red-ish color
    sigma = jnp.where(z >= 1.5, 1e4, 0.0)
    rgb_raw = jnp.full((R, S, 3), -10.0).at[..., 0].set(10.0)
    rgb, depth, acc, w = composite(rgb_raw, sigma, z, rays_d)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), 1.5, atol=0.1)
    np.testing.assert_allclose(np.asarray(rgb[:, 0]), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rgb[:, 1:]), 0.0, atol=1e-3)


def test_volume_render_sphere_depth_matches_analytic():
    """Solid unit-ish sphere density: rendered depth equals the ray-sphere
    intersection; background rays composite to white."""
    r_sphere = 0.5

    def field(pts):
        inside = (jnp.linalg.norm(pts, axis=-1) < r_sphere)
        sigma = jnp.where(inside, 1e4, 0.0)
        rgb = jnp.where(inside[..., None], 5.0, -5.0)
        return rgb, sigma

    rays_o = jnp.asarray([[0.0, 0.0, 1.5], [0.0, 1.0, 1.5]])
    rays_d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    out = jax.jit(lambda k: volume_render(field, rays_o, rays_d, k,
                                          near=0.5, far=2.5, n_coarse=128,
                                          n_fine=64))(jax.random.PRNGKey(0))
    # center ray hits the sphere at z = 1.5 - (1.5 - 0.5) = depth 1.0
    assert abs(float(out["depth"][0]) - 1.0) < 0.03
    assert float(out["acc"][0]) > 0.99
    # miss ray: fully transparent, white background
    assert float(out["acc"][1]) < 1e-3
    np.testing.assert_allclose(np.asarray(out["rgb"][1]), 1.0, atol=1e-3)
