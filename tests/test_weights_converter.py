"""Weight converter: synthetic diffusers-layout state dicts -> flax params.

Builds random torch-style state dicts with the exact names/shapes diffusers
checkpoints use (tiny configs), converts, and verifies the resulting trees
apply cleanly and match the module's own init structure leaf-for-leaf —
catching any drift between module naming and converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contexture_nerf_tpu.diffusion import weights as W
from contexture_nerf_tpu.diffusion.controlnet import ControlNet
from contexture_nerf_tpu.diffusion.unet import UNet2DCondition, UNetConfig
from contexture_nerf_tpu.diffusion.vae import AutoencoderKL, VAEConfig

KEY = jax.random.PRNGKey(0)


def _tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): v.shape for k, v in flat}


def _synth_unet_sd(cfg: UNetConfig, rng):
    """Random state dict with diffusers UNet2DConditionModel names."""
    sd = {}

    def conv(name, o, i, k=3):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(
            np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(o).astype(np.float32)

    def lin(name, o, i, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(o).astype(np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)

    def resnet(pre, cin, cout, temb):
        norm(f"{pre}.norm1", cin)
        conv(f"{pre}.conv1", cout, cin)
        if temb:
            lin(f"{pre}.time_emb_proj", cout, temb)
        norm(f"{pre}.norm2", cout)
        conv(f"{pre}.conv2", cout, cout)
        if cin != cout:
            conv(f"{pre}.conv_shortcut", cout, cin, k=1)

    def attn_block(pre, c, heads, ctx):
        norm(f"{pre}.norm", c)
        lin(f"{pre}.proj_in", c, c)
        lin(f"{pre}.proj_out", c, c)
        b = f"{pre}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{b}.{n}", c)
        for a, kdim in (("attn1", c), ("attn2", ctx)):
            lin(f"{b}.{a}.to_q", c, c, bias=False)
            lin(f"{b}.{a}.to_k", c, kdim, bias=False)
            lin(f"{b}.{a}.to_v", c, kdim, bias=False)
            lin(f"{b}.{a}.to_out.0", c, c)
        lin(f"{b}.ff.net.0.proj", c * 8, c)
        lin(f"{b}.ff.net.2", c, c * 4)

    ch = cfg.block_out_channels
    temb = ch[0] * 4
    ctx = cfg.cross_attention_dim
    conv("conv_in", ch[0], cfg.in_channels)
    lin("time_embedding.linear_1", temb, ch[0])
    lin("time_embedding.linear_2", temb, temb)
    n = len(ch)
    prev = ch[0]
    for b in range(n):
        for l in range(cfg.layers_per_block):
            resnet(f"down_blocks.{b}.resnets.{l}", prev, ch[b], temb)
            prev = ch[b]
            if b < n - 1:
                attn_block(f"down_blocks.{b}.attentions.{l}", ch[b],
                           cfg.num_heads[b], ctx)
        if b < n - 1:
            conv(f"down_blocks.{b}.downsamplers.0.conv", ch[b], ch[b])
    resnet("mid_block.resnets.0", ch[-1], ch[-1], temb)
    attn_block("mid_block.attentions.0", ch[-1], cfg.num_heads[-1], ctx)
    resnet("mid_block.resnets.1", ch[-1], ch[-1], temb)
    # up path: skip channels follow our forward's res_stack pops
    res_channels = [ch[0]]
    for b in range(n):
        for l in range(cfg.layers_per_block):
            res_channels.append(ch[b])
        if b < n - 1:
            res_channels.append(ch[b])
    h = ch[-1]
    for u, bi in enumerate(reversed(range(n))):
        for l in range(cfg.layers_per_block + 1):
            skip = res_channels.pop()
            resnet(f"up_blocks.{u}.resnets.{l}", h + skip, ch[bi], temb)
            h = ch[bi]
            if bi < n - 1:
                attn_block(f"up_blocks.{u}.attentions.{l}", ch[bi],
                           cfg.num_heads[bi], ctx)
        if bi > 0:
            conv(f"up_blocks.{u}.upsamplers.0.conv", ch[bi], ch[bi])
    norm("conv_norm_out", ch[0])
    conv("conv_out", cfg.out_channels, ch[0])
    return sd


def test_unet_converter_structure_and_apply(rng):
    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    ref = jax.jit(unet.init)(KEY, jnp.zeros((1, 4, 16, 16)),
                             jnp.array([0]), jnp.zeros((1, 7, 32)))
    sd = _synth_unet_sd(cfg, rng)
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
    sd = {}

    def conv(name, o, i, k=3):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(
            np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(o).astype(np.float32)

    def lin(name, o, i):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(o).astype(np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)

    def resnet(pre, cin, cout):
        norm(f"{pre}.norm1", cin)
        conv(f"{pre}.conv1", cout, cin)
        norm(f"{pre}.norm2", cout)
        conv(f"{pre}.conv2", cout, cout)
        if cin != cout:
            conv(f"{pre}.conv_shortcut", cout, cin, k=1)

    def attn(pre, c):
        norm(f"{pre}.group_norm", c)
        for nme in ("to_q", "to_k", "to_v", "to_out.0"):
            lin(f"{pre}.{nme}", c, c)

    ch = cfg.block_out_channels
    lat = cfg.latent_channels
    conv("encoder.conv_in", ch[0], 3)
    prev = ch[0]
    for b in range(len(ch)):
        for l in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{b}.resnets.{l}", prev, ch[b])
            prev = ch[b]
        if b < len(ch) - 1:
            conv(f"encoder.down_blocks.{b}.downsamplers.0.conv", ch[b], ch[b])
    resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1])
    attn("encoder.mid_block.attentions.0", ch[-1])
    resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1])
    norm("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", 2 * lat, ch[-1])
    conv("quant_conv", 2 * lat, 2 * lat, k=1)
    conv("post_quant_conv", lat, lat, k=1)
    conv("decoder.conv_in", ch[-1], lat)
    resnet("decoder.mid_block.resnets.0", ch[-1], ch[-1])
    attn("decoder.mid_block.attentions.0", ch[-1])
    resnet("decoder.mid_block.resnets.1", ch[-1], ch[-1])
    h = ch[-1]
    for u, bi in enumerate(reversed(range(len(ch)))):
        for l in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{u}.resnets.{l}", h, ch[bi])
            h = ch[bi]
        if bi > 0:
            conv(f"decoder.up_blocks.{u}.upsamplers.0.conv", ch[bi], ch[bi])
    norm("decoder.conv_norm_out", ch[0])
    conv("decoder.conv_out", 3, ch[0])

    converted = W.convert_vae(sd, cfg)
    assert _tree_shapes(converted) == _tree_shapes(ref)
