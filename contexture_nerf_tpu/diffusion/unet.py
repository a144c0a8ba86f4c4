"""UNet2DCondition in flax — the SD2 / SD2-inpaint / Zero123++ denoiser.

Replaces the torch UNets the reference loads from the HF hub
(stable_diffusion_depth.py:68-74: SD2-depth 5-ch + SD2-inpaint 9-ch;
trainer.py:296-315: Zero123++ 4-ch v-prediction UNet). One parameterizable
module covers all three (they share the SD2 backbone: block_out
320/640/1280/1280, 2 layers/block, heads 5/10/20/20 @ head_dim 64,
cross-attention dim 1024, linear transformer projections).

TPU-native features:
  - NHWC activations; attention via the Pallas flash kernel
  - `ref_out` / `ref_kv` threading implements Zero123++ reference-only
    attention as explicit arrays in a single jitted graph (the hub pipeline
    uses a Python dict side channel, zero123plus.py:151-155)
  - `down_residuals`/`mid_residual` inputs accept ControlNet injections
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from contexture_nerf_tpu.diffusion.layers import (Downsample2D,
                                                  GroupNormSiLU,
                                                  ResnetBlock2D,
                                                  TimestepEmbedding,
                                                  Transformer2DModel,
                                                  Upsample2D,
                                                  timestep_embedding)


class UNetConfig:
    """SD2-family UNet hyperparameters."""

    def __init__(self, in_channels=4, out_channels=4,
                 block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block=2,
                 cross_attention_dim=1024,
                 num_heads=(5, 10, 20, 20),
                 transformer_depth=1,
                 use_linear_projection=True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.block_out_channels = tuple(block_out_channels)
        self.layers_per_block = layers_per_block
        self.cross_attention_dim = cross_attention_dim
        self.num_heads = tuple(num_heads)
        self.transformer_depth = transformer_depth
        self.use_linear_projection = use_linear_projection

    @staticmethod
    def sd2_depth():
        return UNetConfig(in_channels=5)

    @staticmethod
    def sd2_inpaint():
        return UNetConfig(in_channels=9)

    @staticmethod
    def zero123plus():
        return UNetConfig(in_channels=4)

    @staticmethod
    def tiny(in_channels=4, cross_attention_dim=32):
        """Test-size config."""
        return UNetConfig(in_channels=in_channels, out_channels=4,
                          block_out_channels=(32, 64),
                          layers_per_block=1,
                          cross_attention_dim=cross_attention_dim,
                          num_heads=(2, 4))


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    # optim.int8_teacher: dynamic W8A8 on the MXU's 2x int8 path for every
    # resnet/transformer/resample matmul (ops/quant.py). conv_in/conv_out and
    # the timestep embedding stay exact — the edge layers are the most
    # quantization-sensitive and contribute negligible FLOPs. Params stay
    # bf16/f32 masters, so converter/checkpoint/TP specs are unchanged.
    quant: bool = False

    @nn.compact
    def __call__(self, sample: jnp.ndarray, timesteps: jnp.ndarray,
                 encoder_hidden_states: jnp.ndarray,
                 down_residuals: Optional[List[jnp.ndarray]] = None,
                 mid_residual: Optional[jnp.ndarray] = None,
                 ref_kv_list: Optional[List[jnp.ndarray]] = None,
                 ref_out: Optional[List[jnp.ndarray]] = None,
                 return_residuals: bool = False):
        """sample: (B, C, H, W) torch-layout latents; timesteps: (B,) or ();
        encoder_hidden_states: (B, S, cross_dim). Returns (B, out_C, H, W)
        (+ (down_residuals, mid_residual) when return_residuals)."""
        cfg = self.config
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)  # NHWC
        B = x.shape[0]
        timesteps = jnp.broadcast_to(jnp.atleast_1d(timesteps), (B,))

        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                 dtype=self.dtype,
                                 name="time_embedding")(
                                     t_emb.astype(self.dtype))
        context = encoder_hidden_states.astype(self.dtype)

        num_blocks = len(cfg.block_out_channels)
        is_cross = [i < num_blocks - 1 for i in range(num_blocks)]

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        res_stack: List[jnp.ndarray] = [h]

        # -- down ---------------------------------------------------------
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
                        name=f"down_{bi}_attn_{li}")(
                            h, context, ref_kv_list=ref_kv_list,
                            ref_out=ref_out)
                res_stack.append(h)
            if bi < num_blocks - 1:
                h = Downsample2D(out_ch, dtype=self.dtype, quant=self.quant,
                                 name=f"down_{bi}_downsample")(h)
                res_stack.append(h)

        # ControlNet injection (zero123plus.py:280-298 DepthControlUNet)
        if down_residuals is not None:
            res_stack = [r + jnp.transpose(d, (0, 2, 3, 1)).astype(r.dtype)
                         if d.shape[1] == r.shape[-1] else r + d.astype(r.dtype)
                         for r, d in zip(res_stack, down_residuals)]

        # -- mid ------------------------------------------------------------
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, dtype=self.dtype, quant=self.quant,
                          name="mid_resnet_0")(h, temb)
        h = Transformer2DModel(
            cfg.num_heads[-1], mid_ch // cfg.num_heads[-1],
            depth=cfg.transformer_depth,
            use_linear_projection=cfg.use_linear_projection,
            dtype=self.dtype, quant=self.quant, name="mid_attn")(
                h, context, ref_kv_list=ref_kv_list, ref_out=ref_out)
        h = ResnetBlock2D(mid_ch, dtype=self.dtype, quant=self.quant,
                          name="mid_resnet_1")(h, temb)
        if mid_residual is not None:
            mr = mid_residual
            if mr.ndim == 4 and mr.shape[1] == h.shape[-1]:
                mr = jnp.transpose(mr, (0, 2, 3, 1))
            h = h + mr.astype(h.dtype)

        if return_residuals:
            return res_stack, h

        # -- up --------------------------------------------------------------
        for bi in reversed(range(num_blocks)):
            out_ch = cfg.block_out_channels[bi]
            for li in range(cfg.layers_per_block + 1):
                skip = res_stack.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = ResnetBlock2D(out_ch, dtype=self.dtype, quant=self.quant,
                                  name=f"up_{bi}_resnet_{li}")(h, temb)
                if is_cross[bi]:
                    h = Transformer2DModel(
                        cfg.num_heads[bi], out_ch // cfg.num_heads[bi],
                        depth=cfg.transformer_depth,
                        use_linear_projection=cfg.use_linear_projection,
                        dtype=self.dtype, quant=self.quant,
                        name=f"up_{bi}_attn_{li}")(
                            h, context, ref_kv_list=ref_kv_list,
                            ref_out=ref_out)
            if bi > 0:
                h = Upsample2D(out_ch, dtype=self.dtype, quant=self.quant,
                               name=f"up_{bi}_upsample")(h)

        h = GroupNormSiLU(32, 1e-5, out_dtype=self.dtype,
                          name="conv_norm_out")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        return jnp.transpose(h, (0, 3, 1, 2))
