"""AutoencoderKL (SD VAE) in flax — NHWC, TPU layouts.

Replaces the torch VAE the reference loads (stable_diffusion_depth.py:58) and
the Zero123++ pipeline's VAE (trainer.py:606,621: encode cond image + render
grid; :732 latents_clean). scaling_factor is applied by callers
(0.18215 for SD2; the Zero123++ grid path additionally applies
scale_latents/unscale_latents, trainer.py:38-52).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from contexture_nerf_tpu.diffusion.layers import (Downsample2D,
                                                  GroupNormSiLU,
                                                  ResnetBlock2D, Upsample2D)


class VAEConfig:
    def __init__(self, in_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512, 512),
                 layers_per_block=2, scaling_factor=0.18215):
        self.in_channels = in_channels
        self.latent_channels = latent_channels
        self.block_out_channels = tuple(block_out_channels)
        self.layers_per_block = layers_per_block
        self.scaling_factor = scaling_factor

    @staticmethod
    def sd():
        return VAEConfig()

    @staticmethod
    def tiny():
        return VAEConfig(block_out_channels=(32, 64), layers_per_block=1)


class _VAEAttention(nn.Module):
    """Single-head self-attention block (diffusers AttnBlock)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNormSiLU(32, 1e-6, act=False, out_dtype=self.dtype,
                          name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32)
            / jnp.sqrt(jnp.asarray(C, jnp.float32)), axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", attn.astype(self.dtype), v)
        h = nn.Dense(C, dtype=self.dtype, name="to_out")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        # per-block rematerialization: the encoder sits under the SDS loss
        # gradient, and its backward otherwise holds every conv/norm
        # activation at 960x640 live at once (~5 GB measured); nn.remat
        # bounds the peak to one block's activations
        Resnet = nn.remat(ResnetBlock2D, static_argnums=())
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for bi, out_ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                h = Resnet(out_ch, eps=1e-6, dtype=self.dtype,
                           use_temb=False,
                           name=f"down_{bi}_resnet_{li}")(h)
            if bi < len(cfg.block_out_channels) - 1:
                h = Downsample2D(out_ch, dtype=self.dtype, asymmetric=True,
                                 name=f"down_{bi}_downsample")(h)
        mid_ch = cfg.block_out_channels[-1]
        h = Resnet(mid_ch, eps=1e-6, dtype=self.dtype, use_temb=False,
                   name="mid_resnet_0")(h)
        h = _VAEAttention(dtype=self.dtype, name="mid_attn")(h)
        h = Resnet(mid_ch, eps=1e-6, dtype=self.dtype, use_temb=False,
                   name="mid_resnet_1")(h)
        h = GroupNormSiLU(32, 1e-6, out_dtype=self.dtype,
                          name="conv_norm_out")(h)
        moments = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                          dtype=self.dtype, name="conv_out")(h)
        moments = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=self.dtype,
                          name="quant_conv")(moments)
        return moments  # (B, h, w, 2*latent)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z)
        mid_ch = cfg.block_out_channels[-1]
        h = nn.Conv(mid_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock2D(mid_ch, eps=1e-6, dtype=self.dtype, use_temb=False,
                          name="mid_resnet_0")(h)
        h = _VAEAttention(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(mid_ch, eps=1e-6, dtype=self.dtype, use_temb=False,
                          name="mid_resnet_1")(h)
        for i, bi in enumerate(reversed(range(len(cfg.block_out_channels)))):
            out_ch = cfg.block_out_channels[bi]
            for li in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(out_ch, eps=1e-6, dtype=self.dtype,
                                  use_temb=False,
                                  name=f"up_{bi}_resnet_{li}")(h)
            if bi > 0:
                h = Upsample2D(out_ch, dtype=self.dtype,
                               name=f"up_{bi}_upsample")(h)
        h = GroupNormSiLU(32, 1e-6, out_dtype=self.dtype,
                          name="conv_norm_out")(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode/decode with torch-layout (B,C,H,W) public API."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)

    def encode_moments(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images (B,3,H,W) in [-1,1] -> (mean, logvar) each (B,latent,h,w)."""
        x = jnp.transpose(images, (0, 2, 3, 1)).astype(self.dtype)
        moments = self.encoder(x)
        moments = jnp.transpose(moments, (0, 3, 1, 2))
        mean, logvar = jnp.split(moments, 2, axis=1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """latents (B,latent,h,w) -> images (B,3,H,W) in [-1,1] range."""
        z = jnp.transpose(latents, (0, 2, 3, 1)).astype(self.dtype)
        img = self.decoder(z)
        return jnp.transpose(img, (0, 3, 1, 2))

    def __call__(self, images, key):
        mean, logvar = self.encode_moments(images)
        z = sample_gaussian(mean, logvar, key)
        return self.decode(z), mean, logvar


def sample_gaussian(mean: jnp.ndarray, logvar: jnp.ndarray,
                    key: jax.Array) -> jnp.ndarray:
    """latent_dist.sample() (diffusers DiagonalGaussianDistribution)."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
