"""Differentiable texture sampling (kaolin texture_mapping equivalent).

Replaces kal.render.mesh.texture_mapping (reference src/models/render.py:135):
torch.grid_sample semantics with align_corners=False, zero padding, and the
kaolin v-flip (texture_coordinates[..., 1] = -uv_y after *2-1).

Gradients flow to `texture` (the path the SDS loop differentiates through:
texture MLP -> texture map -> per-pixel sample).
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_texture(uv: jnp.ndarray, texture: jnp.ndarray,
                   mode: str = "bilinear") -> jnp.ndarray:
    """Sample `texture` (B,C,TH,TW) at `uv` (B,H,W,2) in [0,1].

    Returns (B,H,W,C). Matches kaolin texture_mapping + grid_sample
    (align_corners=False, zeros padding, y flipped)."""
    B, C, TH, TW = texture.shape
    u = uv[..., 0]
    v = uv[..., 1]
    # kaolin: grid = uv*2-1 with y negated; grid_sample(align_corners=False):
    # pixel coord = (grid+1)/2 * size - 0.5
    px = u * TW - 0.5
    py = (1.0 - v) * TH - 0.5

    tex_flat = texture.reshape(B, C, TH * TW)  # (B,C,TH*TW)

    def gather(iy, ix):
        iyc = jnp.clip(iy, 0, TH - 1)
        ixc = jnp.clip(ix, 0, TW - 1)
        lin = (iyc * TW + ixc).reshape(B, -1)
        # one SCALAR-slice gather per channel: XLA-TPU pads slice shapes to
        # full (8,128) register tiles, so a (1,C) slice costs ~170x its
        # payload in temp HBM (see rasterize.interpolate_attributes)
        out = jnp.stack(
            [jnp.take_along_axis(tex_flat[:, c], lin, axis=1)
             for c in range(C)], axis=-1)
        out = out.reshape(*iy.shape, C)
        inb = ((iy >= 0) & (iy < TH) & (ix >= 0) & (ix < TW))[..., None]
        return jnp.where(inb, out, 0.0)

    if mode == "nearest":
        ix = jnp.floor(px + 0.5).astype(jnp.int32)
        iy = jnp.floor(py + 0.5).astype(jnp.int32)
        return gather(iy, ix)

    if mode != "bilinear":
        raise NotImplementedError(f"texture interpolation mode {mode}")

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    wx = (px - x0.astype(px.dtype))[..., None]
    wy = (py - y0.astype(py.dtype))[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
