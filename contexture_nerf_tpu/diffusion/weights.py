"""HF-checkpoint -> flax parameter conversion.

The reference downloads SD2-depth / SD2-inpaint / Zero123++ / ControlNet /
CLIP weights from the HF hub at init (stable_diffusion_depth.py:58-100,
trainer.py:296-315). This environment is zero-egress, so conversion reads
*local* checkpoint directories (diffusers layout: subfolders with
diffusion_pytorch_model.safetensors / pytorch_model.bin) when the user
provides them; models fall back to random init otherwise (tests use tiny
random configs throughout).

Conventions:
  torch Conv2d weight (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O)
  torch Linear weight (O, I)        -> flax Dense kernel (I, O)
  GroupNorm/LayerNorm weight/bias   -> scale/bias
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch/safetensors state dict into numpy arrays."""
    path = str(path)
    if os.path.isdir(path):
        for name in ("diffusion_pytorch_model.safetensors",
                     "model.safetensors",
                     "diffusion_pytorch_model.bin", "pytorch_model.bin"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def _conv(sd, name):
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _dense(sd, name):
    out = {"kernel": np.transpose(sd[f"{name}.weight"], (1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _resnet(sd, pre, use_temb=True):
    out = {
        "norm1": _norm(sd, f"{pre}.norm1"),
        "conv1": _conv(sd, f"{pre}.conv1"),
        "norm2": _norm(sd, f"{pre}.norm2"),
        "conv2": _conv(sd, f"{pre}.conv2"),
    }
    if use_temb and f"{pre}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _dense(sd, f"{pre}.time_emb_proj")
    if f"{pre}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{pre}.conv_shortcut")
    return out


def _cross_attention(sd, pre):
    return {
        "to_q": _dense(sd, f"{pre}.to_q"),
        "to_k": _dense(sd, f"{pre}.to_k"),
        "to_v": _dense(sd, f"{pre}.to_v"),
        "to_out": _dense(sd, f"{pre}.to_out.0"),
    }


def _transformer_block(sd, pre):
    return {
        "norm1": _norm(sd, f"{pre}.norm1"),
        "attn1": _cross_attention(sd, f"{pre}.attn1"),
        "norm2": _norm(sd, f"{pre}.norm2"),
        "attn2": _cross_attention(sd, f"{pre}.attn2"),
        "norm3": _norm(sd, f"{pre}.norm3"),
        "ff": {
            "geglu_proj": _dense(sd, f"{pre}.ff.net.0.proj"),
            "out_proj": _dense(sd, f"{pre}.ff.net.2"),
        },
    }


def _transformer2d(sd, pre, depth, use_linear=True):
    out = {"norm": _norm(sd, f"{pre}.norm")}
    proj_fn = _dense if use_linear else _conv
    out["proj_in"] = proj_fn(sd, f"{pre}.proj_in")
    out["proj_out"] = proj_fn(sd, f"{pre}.proj_out")
    for i in range(depth):
        out[f"transformer_blocks_{i}"] = _transformer_block(
            sd, f"{pre}.transformer_blocks.{i}")
    return out


def convert_unet(sd: Dict[str, np.ndarray], config) -> dict:
    """diffusers UNet2DConditionModel state dict -> our UNet2DCondition params."""
    n = len(config.block_out_channels)
    p = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2"),
        },
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for b in range(n):
        for l in range(config.layers_per_block):
            p[f"down_{b}_resnet_{l}"] = _resnet(
                sd, f"down_blocks.{b}.resnets.{l}")
            if b < n - 1:
                p[f"down_{b}_attn_{l}"] = _transformer2d(
                    sd, f"down_blocks.{b}.attentions.{l}",
                    config.transformer_depth, config.use_linear_projection)
        if b < n - 1:
            p[f"down_{b}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{b}.downsamplers.0.conv")}
    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    p["mid_attn"] = _transformer2d(sd, "mid_block.attentions.0",
                                   config.transformer_depth,
                                   config.use_linear_projection)
    for u in range(n):
        bi = n - 1 - u  # diffusers up_blocks[0] = deepest = our up_{n-1}
        for l in range(config.layers_per_block + 1):
            p[f"up_{bi}_resnet_{l}"] = _resnet(
                sd, f"up_blocks.{u}.resnets.{l}")
            if bi < n - 1:
                p[f"up_{bi}_attn_{l}"] = _transformer2d(
                    sd, f"up_blocks.{u}.attentions.{l}",
                    config.transformer_depth, config.use_linear_projection)
        if bi > 0:
            p[f"up_{bi}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{u}.upsamplers.0.conv")}
    return {"params": p}


def _vae_attn(sd, pre):
    # diffusers >=0.20 names: group_norm + to_q/to_k/to_v/to_out.0;
    # legacy: query/key/value/proj_attn
    if f"{pre}.to_q.weight" in sd:
        names = ("to_q", "to_k", "to_v", "to_out.0")
    else:
        names = ("query", "key", "value", "proj_attn")
    return {
        "group_norm": _norm(sd, f"{pre}.group_norm"),
        "to_q": _dense(sd, f"{pre}.{names[0]}"),
        "to_k": _dense(sd, f"{pre}.{names[1]}"),
        "to_v": _dense(sd, f"{pre}.{names[2]}"),
        "to_out": _dense(sd, f"{pre}.{names[3]}"),
    }


def convert_vae(sd: Dict[str, np.ndarray], config) -> dict:
    n = len(config.block_out_channels)
    enc = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_resnet_0": _resnet(sd, "encoder.mid_block.resnets.0", False),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "mid_resnet_1": _resnet(sd, "encoder.mid_block.resnets.1", False),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "quant_conv": _conv(sd, "quant_conv"),
    }
    for b in range(n):
        for l in range(config.layers_per_block):
            enc[f"down_{b}_resnet_{l}"] = _resnet(
                sd, f"encoder.down_blocks.{b}.resnets.{l}", False)
        if b < n - 1:
            enc[f"down_{b}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{b}.downsamplers.0.conv")}
    dec = {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_resnet_0": _resnet(sd, "decoder.mid_block.resnets.0", False),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_resnet_1": _resnet(sd, "decoder.mid_block.resnets.1", False),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for u in range(n):
        bi = n - 1 - u
        for l in range(config.layers_per_block + 1):
            dec[f"up_{bi}_resnet_{l}"] = _resnet(
                sd, f"decoder.up_blocks.{u}.resnets.{l}", False)
        if bi > 0:
            dec[f"up_{bi}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{u}.upsamplers.0.conv")}
    return {"params": {"encoder": enc, "decoder": dec}}


def convert_controlnet(sd: Dict[str, np.ndarray], config) -> dict:
    n = len(config.block_out_channels)
    p = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _dense(sd, "time_embedding.linear_1"),
            "linear_2": _dense(sd, "time_embedding.linear_2"),
        },
        "controlnet_mid_block": _conv(sd, "controlnet_mid_block"),
    }
    emb = {"conv_in": _conv(sd, "controlnet_cond_embedding.conv_in"),
           "conv_out": _conv(sd, "controlnet_cond_embedding.conv_out")}
    i = 0
    while f"controlnet_cond_embedding.blocks.{i}.weight" in sd:
        emb[f"blocks_{i}"] = _conv(sd, f"controlnet_cond_embedding.blocks.{i}")
        i += 1
    p["controlnet_cond_embedding"] = emb
    idx = 0
    while f"controlnet_down_blocks.{idx}.weight" in sd:
        p[f"controlnet_down_blocks_{idx}"] = _conv(
            sd, f"controlnet_down_blocks.{idx}")
        idx += 1
    for b in range(n):
        for l in range(config.layers_per_block):
            p[f"down_{b}_resnet_{l}"] = _resnet(
                sd, f"down_blocks.{b}.resnets.{l}")
            if b < n - 1:
                p[f"down_{b}_attn_{l}"] = _transformer2d(
                    sd, f"down_blocks.{b}.attentions.{l}",
                    config.transformer_depth, config.use_linear_projection)
        if b < n - 1:
            p[f"down_{b}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{b}.downsamplers.0.conv")}
    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    p["mid_attn"] = _transformer2d(sd, "mid_block.attentions.0",
                                   config.transformer_depth,
                                   config.use_linear_projection)
    return {"params": p}


def _clip_layer(sd, pre):
    return {
        "layer_norm1": _norm(sd, f"{pre}.layer_norm1"),
        "layer_norm2": _norm(sd, f"{pre}.layer_norm2"),
        "q_proj": _dense(sd, f"{pre}.self_attn.q_proj"),
        "k_proj": _dense(sd, f"{pre}.self_attn.k_proj"),
        "v_proj": _dense(sd, f"{pre}.self_attn.v_proj"),
        "out_proj": _dense(sd, f"{pre}.self_attn.out_proj"),
        "fc1": _dense(sd, f"{pre}.mlp.fc1"),
        "fc2": _dense(sd, f"{pre}.mlp.fc2"),
    }


def convert_clip_text(sd: Dict[str, np.ndarray], config) -> dict:
    pre = "text_model"
    p = {
        "token_embedding": {
            "embedding": sd[f"{pre}.embeddings.token_embedding.weight"]},
        "position_embedding":
            sd[f"{pre}.embeddings.position_embedding.weight"],
        "final_layer_norm": _norm(sd, f"{pre}.final_layer_norm"),
    }
    for i in range(config.num_layers):
        p[f"layers_{i}"] = _clip_layer(sd, f"{pre}.encoder.layers.{i}")
    return {"params": p}


def convert_clip_vision(sd: Dict[str, np.ndarray], config) -> dict:
    pre = "vision_model"
    p = {
        "patch_embedding": {
            "kernel": np.transpose(
                sd[f"{pre}.embeddings.patch_embedding.weight"], (2, 3, 1, 0))},
        "class_embedding": sd[f"{pre}.embeddings.class_embedding"],
        "position_embedding":
            sd[f"{pre}.embeddings.position_embedding.weight"],
        "pre_layrnorm": _norm(sd, f"{pre}.pre_layrnorm"),
        "post_layernorm": _norm(sd, f"{pre}.post_layernorm"),
        "visual_projection": {
            "kernel": np.transpose(sd["visual_projection.weight"], (1, 0))},
    }
    for i in range(config.num_layers):
        p[f"layers_{i}"] = _clip_layer(sd, f"{pre}.encoder.layers.{i}")
    return {"params": p}
