"""Cross-view face-visibility weighting (reference trainer.py:155-249).

The reference builds an N x 4 pixel table (N <= H*W*views ~ 10M rows) and runs
torch-scatter's CUDA scatter_max over it. Key observation exploited here: the
scattered value (camera-space z-normal of the pixel's face) is constant per
(view, face) — so the reduction collapses to a (views, faces) problem:

  visible[v, f]  = does any pixel of view v rasterize face f
  max_z[f]       = max over views of z_normal[v, f] where visible
  weight[v, pix] = z_normal[v, face(pix)] >= max_z[face(pix)]

This runs as three XLA scatter/gather ops on TPU (native scatter-max), no
10M-row table, no host sync.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_view_weights(face_idx: jnp.ndarray,
                         face_normals_z: jnp.ndarray) -> jnp.ndarray:
    """face_idx: (B,1,H,W) int32 (-1 background);
    face_normals_z: (B,F) camera-space z component of face normals.
    Returns weight_masks (B,1,H,W) bool — True where the pixel's face sees its
    best (most head-on) view in this view (reference
    compare_face_normals_between_views, trainer.py:213-249). Background
    pixels are True (reference initializes masks to True)."""
    B, _, H, W = face_idx.shape
    F = face_normals_z.shape[1]
    fi = face_idx.reshape(B, H * W)
    valid = fi >= 0
    fi_safe = jnp.maximum(fi, 0)

    # visibility: scatter-max of 1s at rasterized face ids, per view
    vis = jnp.zeros((B, F), jnp.float32)
    vis = vis.at[jnp.arange(B)[:, None], fi_safe].max(
        valid.astype(jnp.float32))

    neg_inf = jnp.asarray(-jnp.inf, face_normals_z.dtype)
    nz_visible = jnp.where(vis > 0, face_normals_z, neg_inf)
    max_z_per_face = nz_visible.max(axis=0)  # (F,)

    per_pix_nz = jnp.take_along_axis(face_normals_z, fi_safe, axis=1)
    per_pix_max = max_z_per_face[fi_safe]
    unworthy = (per_pix_nz < per_pix_max) & valid
    return (~unworthy).reshape(B, 1, H, W)
