"""Depth ControlNet in flax (Zero123++ controlnet-zp11-depth-v1 equivalent).

Replaces the torch ControlNetModel the reference attaches to the Zero123++
pipeline (trainer.py:302-304, conditioning_scale=2; applied per denoise step
in DepthControlUNet, zero123plus.py:260-298). The encoder mirrors the UNet's
down path with zero-initialized output convolutions, plus a conditioning
embedder that maps the pixel-space depth image to latent resolution.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from contexture_nerf_tpu.diffusion.layers import (Downsample2D, ResnetBlock2D,
                                                  TimestepEmbedding,
                                                  Transformer2DModel,
                                                  timestep_embedding)
from contexture_nerf_tpu.diffusion.unet import UNetConfig


class ControlNetCondEmbedding(nn.Module):
    """Pixel-space cond image -> latent-res feature (diffusers
    ControlNetConditioningEmbedding: 16,32,96,256 conv stack, /8 downsample,
    zero-init final conv)."""

    conditioning_embedding_channels: int
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):  # NHWC
        h = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.block_out_channels) - 1):
            h = nn.Conv(self.block_out_channels[i], (3, 3), padding=1,
                        dtype=self.dtype, name=f"blocks_{2*i}")(h)
            h = nn.silu(h)
            h = nn.Conv(self.block_out_channels[i + 1], (3, 3), strides=(2, 2),
                        padding=1, dtype=self.dtype, name=f"blocks_{2*i+1}")(h)
            h = nn.silu(h)
        return nn.Conv(self.conditioning_embedding_channels, (3, 3),
                       padding=1, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv_out")(h)


class ControlNet(nn.Module):
    config: UNetConfig  # matches the paired UNet's encoder
    dtype: jnp.dtype = jnp.float32
    # int8 MXU compute in the heavy blocks (ops/quant.py): resnet/downsample
    # convs + transformer matmuls. The hint embedder, conv_in, time
    # embedding, and the zero-init output projections stay exact — they are
    # tiny and accuracy-critical. Param tree is unchanged (bf16 masters,
    # quantized on the fly), so converter/checkpoints/TP specs all apply.
    quant: bool = False

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 controlnet_cond: jnp.ndarray,
                 conditioning_scale: float = 1.0,
                 cond_embedding: Optional[jnp.ndarray] = None):
        """sample (B,C,h,w) latents; controlnet_cond (B,3,H,W) pixel-space
        cond image (H = 8h). Returns (down_residuals NHWC list, mid_residual)
        scaled by conditioning_scale (DepthControlUNet, zero123plus.py:283-290).

        cond_embedding: optional precomputed hint embedding (B,h,w,C0) NHWC
        (embed_cond below) — the embedding depends only on the cond image,
        which is loop-invariant across SDS iterations, so the trainer hoists
        it out of the hot loop (~6 ms/step measured on the v5e)."""
        cfg = self.config
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)
        cond = jnp.transpose(controlnet_cond, (0, 2, 3, 1)).astype(self.dtype)
        B = x.shape[0]
        timesteps = jnp.broadcast_to(jnp.atleast_1d(timesteps), (B,))

        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                 dtype=self.dtype, name="time_embedding")(
                                     t_emb.astype(self.dtype))
        context = encoder_hidden_states.astype(self.dtype)

        num_blocks = len(cfg.block_out_channels)
        is_cross = [i < num_blocks - 1 for i in range(num_blocks)]

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        if cond_embedding is None:
            cond_embedding = ControlNetCondEmbedding(
                cfg.block_out_channels[0], dtype=self.dtype,
                name="controlnet_cond_embedding")(cond)
        h = h + cond_embedding.astype(h.dtype)

        res_stack: List[jnp.ndarray] = [h]
        for bi, out_ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, dtype=self.dtype, quant=self.quant,
                                  name=f"down_{bi}_resnet_{li}")(h, temb)
                if is_cross[bi]:
                    h = Transformer2DModel(
                        cfg.num_heads[bi], out_ch // cfg.num_heads[bi],
                        depth=cfg.transformer_depth,
                        use_linear_projection=cfg.use_linear_projection,
                        dtype=self.dtype, quant=self.quant,
                        name=f"down_{bi}_attn_{li}")(h, context)
                res_stack.append(h)
            if bi < num_blocks - 1:
                h = Downsample2D(out_ch, dtype=self.dtype, quant=self.quant,
                                 name=f"down_{bi}_downsample")(h)
                res_stack.append(h)

        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, dtype=self.dtype, quant=self.quant,
                          name="mid_resnet_0")(h, temb)
        h = Transformer2DModel(
            cfg.num_heads[-1], mid_ch // cfg.num_heads[-1],
            depth=cfg.transformer_depth,
            use_linear_projection=cfg.use_linear_projection,
            dtype=self.dtype, quant=self.quant, name="mid_attn")(h, context)
        h = ResnetBlock2D(mid_ch, dtype=self.dtype, quant=self.quant,
                          name="mid_resnet_1")(h, temb)

        down_out = []
        for i, r in enumerate(res_stack):
            z = nn.Conv(r.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name=f"controlnet_down_blocks_{i}")(r)
            down_out.append(z * conditioning_scale)
        mid_out = nn.Conv(h.shape[-1], (1, 1),
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros, dtype=self.dtype,
                          name="controlnet_mid_block")(h) * conditioning_scale
        return down_out, mid_out


def embed_cond(controlnet_params, config: UNetConfig, controlnet_cond,
               dtype=jnp.float32):
    """Standalone hint-embedder apply: controlnet_cond (B,3,H,W) NCHW ->
    (B,H/8,W/8,C0) NHWC, using the embedder subtree of a full ControlNet
    param dict. Lets callers hoist the loop-invariant embedding out of the
    denoise/SDS hot loop and feed it back via `cond_embedding`."""
    mod = ControlNetCondEmbedding(config.block_out_channels[0], dtype=dtype)
    sub = controlnet_params["params"]["controlnet_cond_embedding"]
    cond = jnp.transpose(controlnet_cond, (0, 2, 3, 1)).astype(dtype)
    return mod.apply({"params": sub}, cond)
