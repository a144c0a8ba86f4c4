"""Synthetic diffusers-layout checkpoint snapshots.

Writes on-disk snapshots with the exact directory layout, file names, and
state-dict key names that real HF checkpoints use (reference loads by name at
src/stable_diffusion_depth.py:58-100 and src/training/trainer.py:296-315):

    <sd_root>/unet/diffusion_pytorch_model.safetensors
    <sd_root>/vae/diffusion_pytorch_model.safetensors
    <sd_root>/text_encoder/model.safetensors
    <sd_root>/tokenizer/{vocab.json,merges.txt}
    <z123_root>/... + vision_encoder/ + model_index.json (ramping_coefficients)
    <controlnet_root>/diffusion_pytorch_model.safetensors

This environment is zero-egress, so these synthetic snapshots are how the
full load path (config -> SDWeightPaths/Zero123PlusWeightPaths -> converter ->
BPE tokenizer -> ramping) is exercised end to end. The state-dict builders are
also the structural fixtures for tests/test_weights_converter.py.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# state-dict builders (diffusers/transformers key names, random weights)
# ---------------------------------------------------------------------------

def _mk(sd, rng):
    def conv(name, o, i, k=3):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(
            np.float32) * 0.05
        sd[f"{name}.bias"] = rng.standard_normal(o).astype(np.float32) * 0.05

    def lin(name, o, i, bias=True):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(
            np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal(o).astype(
                np.float32) * 0.05

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    return conv, lin, norm


def synth_unet_sd(cfg, rng):
    """Random state dict with diffusers UNet2DConditionModel names."""
    sd = {}
    conv, lin, norm = _mk(sd, rng)

    def resnet(pre, cin, cout, temb):
        norm(f"{pre}.norm1", cin)
        conv(f"{pre}.conv1", cout, cin)
        if temb:
            lin(f"{pre}.time_emb_proj", cout, temb)
        norm(f"{pre}.norm2", cout)
        conv(f"{pre}.conv2", cout, cout)
        if cin != cout:
            conv(f"{pre}.conv_shortcut", cout, cin, k=1)

    def attn_block(pre, c, ctx):
        norm(f"{pre}.norm", c)
        lin(f"{pre}.proj_in", c, c)
        lin(f"{pre}.proj_out", c, c)
        for d in range(cfg.transformer_depth):
            b = f"{pre}.transformer_blocks.{d}"
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
                attn_block(f"down_blocks.{b}.attentions.{l}", ch[b], ctx)
        if b < n - 1:
            conv(f"down_blocks.{b}.downsamplers.0.conv", ch[b], ch[b])
    resnet("mid_block.resnets.0", ch[-1], ch[-1], temb)
    attn_block("mid_block.attentions.0", ch[-1], ctx)
    resnet("mid_block.resnets.1", ch[-1], ch[-1], temb)
    # up path: skip channels follow the forward's res_stack pops
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
                attn_block(f"up_blocks.{u}.attentions.{l}", ch[bi], ctx)
        if bi > 0:
            conv(f"up_blocks.{u}.upsamplers.0.conv", ch[bi], ch[bi])
    norm("conv_norm_out", ch[0])
    conv("conv_out", cfg.out_channels, ch[0])
    return sd


def synth_vae_sd(cfg, rng):
    """Random state dict with diffusers AutoencoderKL names."""
    sd = {}
    conv, lin, norm = _mk(sd, rng)

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
    return sd


def synth_controlnet_sd(cfg, rng):
    """Random state dict with diffusers ControlNetModel names (encoder side
    matches the paired UNet config)."""
    sd = {}
    conv, lin, norm = _mk(sd, rng)

    def resnet(pre, cin, cout, temb):
        norm(f"{pre}.norm1", cin)
        conv(f"{pre}.conv1", cout, cin)
        lin(f"{pre}.time_emb_proj", cout, temb)
        norm(f"{pre}.norm2", cout)
        conv(f"{pre}.conv2", cout, cout)
        if cin != cout:
            conv(f"{pre}.conv_shortcut", cout, cin, k=1)

    def attn_block(pre, c, ctx):
        norm(f"{pre}.norm", c)
        lin(f"{pre}.proj_in", c, c)
        lin(f"{pre}.proj_out", c, c)
        for d in range(cfg.transformer_depth):
            b = f"{pre}.transformer_blocks.{d}"
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
    n = len(ch)
    conv("conv_in", ch[0], cfg.in_channels)
    lin("time_embedding.linear_1", temb, ch[0])
    lin("time_embedding.linear_2", temb, temb)
    # conditioning embedder (16,32,96,256 stack, /8 downsample)
    boc = (16, 32, 96, 256)
    conv("controlnet_cond_embedding.conv_in", boc[0], 3)
    for i in range(len(boc) - 1):
        conv(f"controlnet_cond_embedding.blocks.{2 * i}", boc[i], boc[i])
        conv(f"controlnet_cond_embedding.blocks.{2 * i + 1}", boc[i + 1],
             boc[i])
    conv("controlnet_cond_embedding.conv_out", ch[0], boc[-1])

    res_channels = [ch[0]]
    prev = ch[0]
    for b in range(n):
        for l in range(cfg.layers_per_block):
            resnet(f"down_blocks.{b}.resnets.{l}", prev, ch[b], temb)
            prev = ch[b]
            if b < n - 1:
                attn_block(f"down_blocks.{b}.attentions.{l}", ch[b], ctx)
            res_channels.append(ch[b])
        if b < n - 1:
            conv(f"down_blocks.{b}.downsamplers.0.conv", ch[b], ch[b])
            res_channels.append(ch[b])
    for i, c in enumerate(res_channels):
        conv(f"controlnet_down_blocks.{i}", c, c, k=1)
    resnet("mid_block.resnets.0", ch[-1], ch[-1], temb)
    attn_block("mid_block.attentions.0", ch[-1], ctx)
    resnet("mid_block.resnets.1", ch[-1], ch[-1], temb)
    conv("controlnet_mid_block", ch[-1], ch[-1], k=1)
    return sd


def synth_clip_text_sd(cfg, rng):
    """Random state dict with transformers CLIPTextModel names."""
    sd = {}
    _, lin, norm = _mk(sd, rng)
    pre = "text_model"
    sd[f"{pre}.embeddings.token_embedding.weight"] = (
        rng.standard_normal((cfg.vocab_size, cfg.hidden_size))
        .astype(np.float32) * 0.02)
    sd[f"{pre}.embeddings.position_embedding.weight"] = (
        rng.standard_normal((cfg.max_positions, cfg.hidden_size))
        .astype(np.float32) * 0.01)
    norm(f"{pre}.final_layer_norm", cfg.hidden_size)
    for i in range(cfg.num_layers):
        b = f"{pre}.encoder.layers.{i}"
        norm(f"{b}.layer_norm1", cfg.hidden_size)
        norm(f"{b}.layer_norm2", cfg.hidden_size)
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{b}.self_attn.{p}", cfg.hidden_size, cfg.hidden_size)
        lin(f"{b}.mlp.fc1", cfg.intermediate_size, cfg.hidden_size)
        lin(f"{b}.mlp.fc2", cfg.hidden_size, cfg.intermediate_size)
    return sd


def synth_clip_vision_sd(cfg, rng):
    """Random state dict with transformers CLIPVisionModelWithProjection
    names."""
    sd = {}
    _, lin, norm = _mk(sd, rng)
    pre = "vision_model"
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    sd[f"{pre}.embeddings.patch_embedding.weight"] = (
        rng.standard_normal((cfg.hidden_size, 3, cfg.patch_size,
                             cfg.patch_size)).astype(np.float32) * 0.02)
    sd[f"{pre}.embeddings.class_embedding"] = (
        rng.standard_normal(cfg.hidden_size).astype(np.float32) * 0.02)
    sd[f"{pre}.embeddings.position_embedding.weight"] = (
        rng.standard_normal((n_pos, cfg.hidden_size)).astype(np.float32)
        * 0.01)
    norm(f"{pre}.pre_layrnorm", cfg.hidden_size)
    norm(f"{pre}.post_layernorm", cfg.hidden_size)
    lin("visual_projection", cfg.projection_dim, cfg.hidden_size, bias=False)
    for i in range(cfg.num_layers):
        b = f"{pre}.encoder.layers.{i}"
        norm(f"{b}.layer_norm1", cfg.hidden_size)
        norm(f"{b}.layer_norm2", cfg.hidden_size)
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{b}.self_attn.{p}", cfg.hidden_size, cfg.hidden_size)
        lin(f"{b}.mlp.fc1", cfg.intermediate_size, cfg.hidden_size)
        lin(f"{b}.mlp.fc2", cfg.hidden_size, cfg.intermediate_size)
    return sd


# ---------------------------------------------------------------------------
# tokenizer files (a real, small CLIP BPE vocab)
# ---------------------------------------------------------------------------

TINY_MERGES = [("t", "h"), ("th", "e</w>"), ("a", "n"), ("an", "d</w>"),
               ("i", "n"), ("in", "g</w>"), ("e", "r</w>"), ("o", "n</w>"),
               ("s", "p"), ("sp", "o"), ("spo", "t</w>")]


def write_tiny_vocab(tok_dir: Path) -> dict:
    """Write a small but real CLIP vocab.json/merges.txt pair; returns the
    vocab dict. Covers ascii letters/digits/punctuation as both mid-word and
    word-final ('</w>') tokens plus a handful of merges, so any lowercase
    prompt tokenizes through the genuine BPE path."""
    tok_dir = Path(tok_dir)
    tok_dir.mkdir(parents=True, exist_ok=True)
    chars = list("abcdefghijklmnopqrstuvwxyz0123456789,.!?'-")
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    for a, b in TINY_MERGES:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tok_dir / "vocab.json").write_text(json.dumps(vocab))
    lines = ["#version: 0.2"] + [f"{a} {b}" for a, b in TINY_MERGES]
    (tok_dir / "merges.txt").write_text("\n".join(lines) + "\n")
    return vocab


# ---------------------------------------------------------------------------
# snapshot writers
# ---------------------------------------------------------------------------

def _save(sd, path: Path, name="diffusion_pytorch_model.safetensors"):
    from safetensors.numpy import save_file

    path.mkdir(parents=True, exist_ok=True)
    save_file(sd, str(path / name))


def write_sd_snapshot(root, seed: int = 0, tiny: bool = True):
    """SD2-depth-style snapshot: unet/vae/text_encoder/tokenizer."""
    from contexture_nerf_tpu.diffusion.clip import CLIPTextConfig
    from contexture_nerf_tpu.diffusion.unet import UNetConfig
    from contexture_nerf_tpu.diffusion.vae import VAEConfig

    root = Path(root)
    rng = np.random.default_rng(seed)
    ucfg = UNetConfig.tiny(in_channels=5) if tiny else UNetConfig.sd2_depth()
    vcfg = VAEConfig.tiny() if tiny else VAEConfig.sd()
    tcfg = CLIPTextConfig.tiny() if tiny else CLIPTextConfig.sd2()
    _save(synth_unet_sd(ucfg, rng), root / "unet")
    _save(synth_vae_sd(vcfg, rng), root / "vae")
    _save(synth_clip_text_sd(tcfg, rng), root / "text_encoder",
          "model.safetensors")
    write_tiny_vocab(root / "tokenizer")
    return root


def write_inpaint_snapshot(root, seed: int = 1, tiny: bool = True):
    """SD2-inpaint-style snapshot (only the unet is consumed)."""
    from contexture_nerf_tpu.diffusion.unet import UNetConfig

    root = Path(root)
    rng = np.random.default_rng(seed)
    ucfg = UNetConfig.tiny(in_channels=9) if tiny else UNetConfig.sd2_inpaint()
    _save(synth_unet_sd(ucfg, rng), root / "unet")
    return root


def write_zero123plus_snapshot(root, seed: int = 2, tiny: bool = True):
    """Zero123++-style snapshot: unet/vae/text_encoder/vision_encoder/
    tokenizer + model_index.json carrying ramping_coefficients (the hub
    pipeline registers them to its config, reference src/zero123plus.py:392
    and trainer.py:631)."""
    from contexture_nerf_tpu.diffusion.clip import (CLIPTextConfig,
                                                    CLIPVisionConfig)
    from contexture_nerf_tpu.diffusion.unet import UNetConfig
    from contexture_nerf_tpu.diffusion.vae import VAEConfig

    root = Path(root)
    rng = np.random.default_rng(seed)
    ucfg = (UNetConfig.tiny(in_channels=4) if tiny
            else UNetConfig.zero123plus())
    vcfg = VAEConfig.tiny() if tiny else VAEConfig.sd()
    tcfg = CLIPTextConfig.tiny() if tiny else CLIPTextConfig.sd2()
    viscfg = CLIPVisionConfig.tiny() if tiny else CLIPVisionConfig.vit_h()
    if tiny:
        viscfg.projection_dim = tcfg.hidden_size
    _save(synth_unet_sd(ucfg, rng), root / "unet")
    _save(synth_vae_sd(vcfg, rng), root / "vae")
    _save(synth_clip_text_sd(tcfg, rng), root / "text_encoder",
          "model.safetensors")
    _save(synth_clip_vision_sd(viscfg, rng), root / "vision_encoder",
          "model.safetensors")
    write_tiny_vocab(root / "tokenizer")
    ramping = (rng.uniform(0, 1, tcfg.max_positions)
               .astype(np.float32).round(4).tolist())
    (root / "model_index.json").write_text(json.dumps({
        "_class_name": "Zero123PlusPipeline",
        "ramping_coefficients": ramping,
    }))
    return root


def write_controlnet_snapshot(root, seed: int = 3, tiny: bool = True):
    """controlnet-zp11-depth-style snapshot (single model dir)."""
    from contexture_nerf_tpu.diffusion.unet import UNetConfig

    root = Path(root)
    rng = np.random.default_rng(seed)
    ucfg = (UNetConfig.tiny(in_channels=4) if tiny
            else UNetConfig.zero123plus())
    _save(synth_controlnet_sd(ucfg, rng), root)
    return root


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", type=Path)
    ap.add_argument("--full", action="store_true",
                    help="full-size configs (slow; ~GBs of random weights)")
    a = ap.parse_args()
    tiny = not a.full
    write_sd_snapshot(a.out / "sd2-depth", tiny=tiny)
    write_inpaint_snapshot(a.out / "sd2-inpaint", tiny=tiny)
    write_zero123plus_snapshot(a.out / "zero123plus", tiny=tiny)
    write_controlnet_snapshot(a.out / "controlnet", tiny=tiny)
    print(f"wrote synthetic snapshots under {a.out}")
