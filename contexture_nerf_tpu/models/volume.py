"""NeRF volume-rendering primitives (rays, stratified sampling, hierarchical
PDF sampling, compositing) — jax, fully vmap/scan-safe.

The reference carries these as dead torch code inherited from upstream NeRF
(src/run_nerf_helpers.py:139-225: get_rays / ndc_rays / sample_pdf, unused by
the texture pipeline). They are realized here as live capability because the
BASELINE "NeRF texture-field volume render" config exercises them
(BASELINE.md targets table), fused into single jitted ray-march graphs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def get_rays(H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray):
    """Per-pixel rays from intrinsics K (3,3) and camera-to-world c2w (3,4).

    Matches the upstream NeRF convention (run_nerf_helpers.py:139-148):
    +x right, +y up, camera looks down -z."""
    i, j = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32), indexing="xy")
    dirs = jnp.stack([(i - K[0, 2]) / K[0, 0],
                      -(j - K[1, 2]) / K[1, 1],
                      -jnp.ones_like(i)], axis=-1)
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float,
             rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Shift to near plane + NDC projection (run_nerf_helpers.py:161-178)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]
    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]
    return (jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1))


def stratified_samples(key: jax.Array, near: float, far: float,
                       n_rays: int, n_samples: int,
                       perturb: bool = True) -> jnp.ndarray:
    """Stratified depths along rays: (n_rays, n_samples)."""
    t = jnp.linspace(0.0, 1.0, n_samples)
    z = near * (1 - t) + far * t
    z = jnp.broadcast_to(z, (n_rays, n_samples))
    if perturb:
        mids = 0.5 * (z[:, 1:] + z[:, :-1])
        upper = jnp.concatenate([mids, z[:, -1:]], -1)
        lower = jnp.concatenate([z[:, :1], mids], -1)
        u = jax.random.uniform(key, z.shape)
        z = lower + (upper - lower) * u
    return z


def sample_pdf(key: jax.Array, bins: jnp.ndarray, weights: jnp.ndarray,
               n_samples: int, det: bool = False) -> jnp.ndarray:
    """Hierarchical inverse-CDF sampling (run_nerf_helpers.py:182-225).

    bins: (R, B), weights: (R, B-1). Returns (R, n_samples)."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (R, B)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(partial(jnp.searchsorted, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)
    cdf_b = jnp.take_along_axis(cdf, below, -1)
    cdf_a = jnp.take_along_axis(cdf, above, -1)
    bins_b = jnp.take_along_axis(bins, below, -1)
    bins_a = jnp.take_along_axis(bins, above, -1)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def composite(raw_rgb: jnp.ndarray, raw_sigma: jnp.ndarray,
              z_vals: jnp.ndarray, rays_d: jnp.ndarray,
              white_bkgd: bool = False):
    """Alpha compositing (upstream raw2outputs). raw_rgb: (R,S,3) pre-sigmoid,
    raw_sigma: (R,S), z_vals: (R,S), rays_d: (R,3).
    Returns (rgb (R,3), depth (R,), acc (R,), weights (R,S))."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = jax.nn.sigmoid(raw_rgb)
    alpha = 1.0 - jnp.exp(-jax.nn.relu(raw_sigma) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10],
                        -1), -1)[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, -2)
    depth_map = jnp.sum(weights * z_vals, -1)
    acc_map = jnp.sum(weights, -1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, depth_map, acc_map, weights


def volume_render(field_fn: Callable, rays_o: jnp.ndarray,
                  rays_d: jnp.ndarray, key: jax.Array,
                  near: float = 0.5, far: float = 2.5,
                  n_coarse: int = 64, n_fine: int = 0,
                  white_bkgd: bool = True):
    """Full coarse(+fine) volume render of a radiance field.

    field_fn(points (R,S,3)) -> (rgb_raw (R,S,3), sigma_raw (R,S)).
    One jitted graph: stratified sampling, field eval, compositing, and the
    optional hierarchical fine pass."""
    R = rays_o.shape[0]
    k1, k2 = jax.random.split(key)
    z = stratified_samples(k1, near, far, R, n_coarse)
    pts = rays_o[:, None] + rays_d[:, None] * z[..., None]
    rgb_raw, sigma_raw = field_fn(pts)
    rgb, depth, acc, weights = composite(rgb_raw, sigma_raw, z, rays_d,
                                         white_bkgd)
    if n_fine > 0:
        mids = 0.5 * (z[:, 1:] + z[:, :-1])
        z_fine = sample_pdf(k2, mids, weights[:, 1:-1], n_fine)
        z_all = jnp.sort(jnp.concatenate([z, z_fine], -1), -1)
        pts = rays_o[:, None] + rays_d[:, None] * z_all[..., None]
        rgb_raw, sigma_raw = field_fn(pts)
        rgb, depth, acc, weights = composite(rgb_raw, sigma_raw, z_all,
                                             rays_d, white_bkgd)
    return {"rgb": rgb, "depth": depth, "acc": acc, "weights": weights}
