"""Cross-view color-consistency reward (reference trainer.py:429-531).

The reference computes this with nested Python loops over view pairs and is
disabled in its loss (weight 0 at trainer.py:856-863). Provided here as a
fully-vectorized jnp capability: for every pixel of view i whose face has a
vertex visible in view j, compare its color against view j's color at that
vertex's projected pixel; return the mean similarity 1 - |dRGB|/C.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_view_consistency(rendered_views: jnp.ndarray,
                             faces: jnp.ndarray,
                             face_idx: jnp.ndarray,
                             face_vertices_image: jnp.ndarray,
                             n_vertices: int = None) -> jnp.ndarray:
    """rendered_views (V,C,H,W), faces (F,3), face_idx (V,H,W),
    face_vertices_image (V,F,3,2) NDC. Returns scalar mean similarity.
    n_vertices must be passed when called under jit (a closure `faces`
    traces, so its max is not concrete there)."""
    V, C, H, W = rendered_views.shape
    N = int(faces.max()) + 1 if n_vertices is None else int(n_vertices)
    flat_faces = faces.reshape(-1)  # (3F,)

    # vertex -> pixel (y, x) per view; last write wins as in the reference
    coords = (face_vertices_image.reshape(V, -1, 2) + 1.0) / 2.0
    px = (coords[..., 0] * W).astype(jnp.int32)
    py = (coords[..., 1] * H).astype(jnp.int32)
    vert_px = jnp.full((V, N, 2), -1, jnp.int32)
    vert_px = vert_px.at[:, flat_faces].set(
        jnp.stack([py, px], axis=-1))

    # vertex visibility per view
    valid = face_idx >= 0  # (V,H,W)
    safe_f = jnp.maximum(face_idx, 0)
    pix_verts = faces[safe_f]  # (V,H,W,3)
    vis = jnp.zeros((V, N), jnp.float32)
    vis = vis.at[jnp.arange(V)[:, None],
                 pix_verts.reshape(V, -1)].max(
        jnp.repeat(valid.reshape(V, -1), 3, axis=1).astype(jnp.float32)
        .reshape(V, -1))

    # status[j, i, h, w, k]: is vertex k of view i's pixel visible in view j
    status = vis[:, pix_verts]  # (Vj, Vi, H, W, 3)
    has_shared = (status > 0).any(-1) & valid[None]  # (Vj, Vi, H, W)
    first = jnp.argmax(status, axis=-1)  # (Vj,Vi,H,W)
    rep_vert = jnp.take_along_axis(
        jnp.broadcast_to(pix_verts[None], status.shape).astype(jnp.int32),
        first[..., None], axis=-1)[..., 0]  # (Vj,Vi,H,W)

    src_yx = vert_px[jnp.arange(V)[:, None, None, None], rep_vert]
    sy = jnp.clip(src_yx[..., 0], 0, H - 1)
    sx = jnp.clip(src_yx[..., 1], 0, W - 1)
    in_bounds = ((src_yx[..., 0] >= 0) & (src_yx[..., 0] < H)
                 & (src_yx[..., 1] >= 0) & (src_yx[..., 1] < W))

    imgs = jnp.transpose(rendered_views, (0, 2, 3, 1))  # (V,H,W,C)
    # scalar-slice gathers per channel (XLA-TPU pads slice shapes to full
    # register tiles; see rasterize.interpolate_attributes)
    vj = jnp.arange(V)[:, None, None, None]
    gathered = jnp.stack(
        [imgs[..., c][vj, sy, sx] for c in range(C)], axis=-1)
    target = jnp.broadcast_to(imgs[None], gathered.shape)

    sim = 1.0 - jnp.abs(target - gathered).sum(-1) / C  # (Vj,Vi,H,W)
    offdiag = ~jnp.eye(V, dtype=bool)[:, :, None, None]
    mask = has_shared & in_bounds & offdiag
    total = jnp.sum(jnp.where(mask, sim, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return jnp.where(jnp.sum(mask) > 0, total / count, 0.0)
