"""Weight converter: synthetic diffusers-layout state dicts -> flax params.

Builds random torch-style state dicts with the exact names/shapes diffusers
checkpoints use (tiny configs, builders shared with tools/synth_snapshot.py),
converts, and verifies the resulting trees apply cleanly and match the
module's own init structure leaf-for-leaf — catching any drift between module
naming and converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contexture_nerf_tpu.diffusion import weights as W
from contexture_nerf_tpu.diffusion.clip import (CLIPTextConfig, CLIPTextModel,
                                                CLIPVisionConfig,
                                                CLIPVisionModelWithProjection)
from contexture_nerf_tpu.diffusion.controlnet import ControlNet
from contexture_nerf_tpu.diffusion.unet import UNet2DCondition, UNetConfig
from contexture_nerf_tpu.diffusion.vae import AutoencoderKL, VAEConfig
from tools.synth_snapshot import (synth_clip_text_sd, synth_clip_vision_sd,
                                  synth_controlnet_sd, synth_unet_sd,
                                  synth_vae_sd)

KEY = jax.random.PRNGKey(0)


def _tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): v.shape for k, v in flat}


@pytest.mark.slow
def test_unet_converter_structure_and_apply(rng):
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    ref = jax.jit(unet.init)(KEY, jnp.zeros((1, 4, 16, 16)),
                             jnp.array([0]), jnp.zeros((1, 7, 32)))
    sd = synth_unet_sd(cfg, rng)
    converted = W.convert_unet(sd, cfg)
    assert _tree_shapes(converted) == _tree_shapes(ref)
    out = unet.apply(converted, jnp.zeros((1, 4, 16, 16)), jnp.array([0]),
                     jnp.zeros((1, 7, 32)))
    assert out.shape == (1, 4, 16, 16)
    assert bool(jnp.isfinite(out).all())


def test_vae_converter_structure(rng):
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    ref = jax.jit(vae.init)(KEY, jnp.zeros((1, 3, 32, 32)), KEY)
    converted = W.convert_vae(synth_vae_sd(cfg, rng), cfg)
    assert _tree_shapes(converted) == _tree_shapes(ref)


@pytest.mark.slow
def test_controlnet_converter_structure_and_apply(rng):
    cfg = UNetConfig.tiny()
    cn = ControlNet(cfg)
    ref = jax.jit(cn.init)(KEY, jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
                           jnp.zeros((1, 7, 32)), jnp.zeros((1, 3, 64, 64)))
    converted = W.convert_controlnet(synth_controlnet_sd(cfg, rng), cfg)
    assert _tree_shapes(converted) == _tree_shapes(ref)
    downs, mid = cn.apply(converted, jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
                          jnp.zeros((1, 7, 32)), jnp.zeros((1, 3, 64, 64)),
                          1.0)
    assert bool(jnp.isfinite(mid).all())


def test_clip_text_converter_structure(rng):
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ref = jax.jit(model.init)(KEY, jnp.zeros((1, 77), jnp.int32))
    converted = W.convert_clip_text(synth_clip_text_sd(cfg, rng), cfg)
    assert _tree_shapes(converted) == _tree_shapes(ref)
    out = model.apply(converted, jnp.zeros((1, 77), jnp.int32))
    assert out.shape == (1, 77, cfg.hidden_size)


def test_clip_vision_converter_structure(rng):
    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModelWithProjection(cfg)
    sz = cfg.image_size
    ref = jax.jit(model.init)(KEY, jnp.zeros((1, 3, sz, sz)))
    converted = W.convert_clip_vision(synth_clip_vision_sd(cfg, rng), cfg)
    assert _tree_shapes(converted) == _tree_shapes(ref)
    out = model.apply(converted, jnp.zeros((1, 3, sz, sz)))
    assert out.shape == (1, cfg.projection_dim)
