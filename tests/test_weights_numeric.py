"""NUMERIC weight-conversion validation against minimal torch mirrors.

VERDICT r3 missing #1: the converter was only ever tested structurally
(leaf-for-leaf shapes, tests/test_weights_converter.py) — a transposed conv
kernel or swapped GEGLU column order would pass every structural test and
silently destroy the PSNR>=30 bar (BASELINE.md). These tests implement the
exact diffusers/transformers math of each converted block in ~200 LoC of
torch (CPU, fp32), randomize a state dict, run it through the real
`contexture_nerf_tpu.diffusion.weights` converters, and assert the flax
module output equals the torch output.

Mirrored semantics (provenance):
  - ResnetBlock2D, Transformer2DModel/BasicTransformerBlock/GEGLU,
    Downsample2D: diffusers UNet blocks as loaded by the reference
    (src/stable_diffusion_depth.py:58-100, src/zero123plus.py:164-298).
  - VAE AttnBlock (legacy + new key names), VAE encoder's asymmetric
    (0,1,0,1) downsample padding: diffusers AutoencoderKL.
  - CLIP text layer (causal attn, EXACT erf gelu): transformers CLIPModel.
  - get_timestep_embedding (flip_sin_to_cos, shift 0): diffusers.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from contexture_nerf_tpu.diffusion import layers as L
from contexture_nerf_tpu.diffusion import weights as W
from contexture_nerf_tpu.diffusion.clip import _CLIPLayer
from contexture_nerf_tpu.diffusion.vae import _VAEAttention

ATOL = 3e-5

torch.manual_seed(0)


def _sd(mod, prefix="m"):
    return {f"{prefix}.{k}": v.detach().numpy().copy()
            for k, v in mod.state_dict().items()}


def _randomize_norms(mod):
    """Default GroupNorm/LayerNorm init is weight=1 bias=0, which would hide
    a scale<->bias swap in the converter."""
    for m in mod.modules():
        if isinstance(m, (tnn.GroupNorm, tnn.LayerNorm)):
            tnn.init.normal_(m.weight, 1.0, 0.2)
            tnn.init.normal_(m.bias, 0.0, 0.2)


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def _nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# ResnetBlock2D (diffusers resnet.py)
# ---------------------------------------------------------------------------


class TResnet(tnn.Module):
    def __init__(self, cin, cout, temb=32, groups=32, eps=1e-5,
                 use_temb=True):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if use_temb:
            self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


@pytest.mark.parametrize("cin,cout,use_temb",
                         [(64, 64, True), (32, 64, True), (64, 64, False)])
def test_resnet_block_matches_torch(cin, cout, use_temb):
    tm = TResnet(cin, cout, use_temb=use_temb)
    _randomize_norms(tm)
    params = W._resnet(_sd(tm), "m", use_temb=use_temb)
    x = torch.randn(2, cin, 8, 8)
    temb = torch.randn(2, 32) if use_temb else None
    with torch.no_grad():
        ref = tm(x, temb).numpy()
    fm = L.ResnetBlock2D(out_channels=cout, use_temb=use_temb)
    out = fm.apply({"params": params}, _nhwc(x),
                   None if temb is None else jnp.asarray(temb.numpy()))
    np.testing.assert_allclose(_nchw(out), ref, atol=ATOL)


# ---------------------------------------------------------------------------
# Transformer2DModel / BasicTransformerBlock / GEGLU (diffusers attention.py)
# ---------------------------------------------------------------------------


class TAttention(tnn.Module):
    def __init__(self, dim, heads, dim_head, cross_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.scale = heads, dim_head ** -0.5
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(cross_dim or dim, inner, bias=False)
        self.to_v = tnn.Linear(cross_dim or dim, inner, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, dim),
                                      tnn.Dropout(0.0)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        B, S, _ = x.shape

        def sp(t):
            return t.view(t.shape[0], t.shape[1], self.heads, -1
                          ).transpose(1, 2)

        a = torch.softmax(
            sp(self.to_q(x)) @ sp(self.to_k(ctx)).transpose(-1, -2)
            * self.scale, dim=-1)
        o = (a @ sp(self.to_v(ctx))).transpose(1, 2).reshape(B, S, -1)
        return self.to_out[0](o)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # torch default = EXACT erf gelu


class TFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.ModuleList([TGEGLU(dim, dim * mult), tnn.Dropout(0.0),
                                   tnn.Linear(dim * mult, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class TBasicBlock(tnn.Module):
    def __init__(self, dim, heads, dim_head, cross_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads, dim_head)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttention(dim, heads, dim_head, cross_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class TTransformer2D(tnn.Module):
    def __init__(self, dim, heads, dim_head, cross_dim, depth=1):
        super().__init__()
        self.norm = tnn.GroupNorm(32, dim, eps=1e-6)
        self.proj_in = tnn.Linear(dim, dim)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(dim, heads, dim_head, cross_dim)
             for _ in range(depth)])
        self.proj_out = tnn.Linear(dim, dim)

    def forward(self, x, ctx):
        B, C, H, Wd = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * Wd, C)
        h = self.proj_in(h)
        for b in self.transformer_blocks:
            h = b(h, ctx)
        h = self.proj_out(h).reshape(B, H, Wd, C).permute(0, 3, 1, 2)
        return h + res


def test_transformer2d_matches_torch():
    dim, heads, dim_head, cross = 64, 2, 32, 48
    tm = TTransformer2D(dim, heads, dim_head, cross, depth=2)
    _randomize_norms(tm)
    params = W._transformer2d(_sd(tm), "m", depth=2, use_linear=True)
    x = torch.randn(2, dim, 6, 4)
    ctx = torch.randn(2, 7, cross)
    with torch.no_grad():
        ref = tm(x, ctx).numpy()
    fm = L.Transformer2DModel(num_heads=heads, head_dim=dim_head, depth=2,
                              use_linear_projection=True)
    out = fm.apply({"params": params}, _nhwc(x),
                   context=jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(_nchw(out), ref, atol=ATOL)


# ---------------------------------------------------------------------------
# VAE attention block (diffusers AttnBlock), both key-name generations
# ---------------------------------------------------------------------------


class TVAEAttn(tnn.Module):
    def __init__(self, C):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, C, eps=1e-6)
        self.to_q = tnn.Linear(C, C)
        self.to_k = tnn.Linear(C, C)
        self.to_v = tnn.Linear(C, C)
        self.to_out = tnn.ModuleList([tnn.Linear(C, C), tnn.Dropout(0.0)])

    def forward(self, x):
        B, C, H, Wd = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * Wd, C)
        a = torch.softmax(
            self.to_q(h) @ self.to_k(h).transpose(-1, -2) / (C ** 0.5),
            dim=-1)
        h = self.to_out[0](a @ self.to_v(h))
        return x + h.reshape(B, H, Wd, C).permute(0, 3, 1, 2)


def test_vae_attention_matches_torch_both_name_styles():
    C = 64
    tm = TVAEAttn(C)
    _randomize_norms(tm)
    sd = _sd(tm)
    x = torch.randn(1, C, 6, 6)
    with torch.no_grad():
        ref = tm(x).numpy()
    fm = _VAEAttention()
    out = fm.apply({"params": W._vae_attn(sd, "m")}, _nhwc(x))
    np.testing.assert_allclose(_nchw(out), ref, atol=ATOL)
    # legacy diffusers (<0.20) key names must convert to the same params
    legacy = {}
    ren = {"to_q": "query", "to_k": "key", "to_v": "value",
           "to_out.0": "proj_attn"}
    for k, v in sd.items():
        for new, old in ren.items():
            k = k.replace(f"m.{new}.", f"m.{old}.")
        legacy[k] = v
    out2 = fm.apply({"params": W._vae_attn(legacy, "m")}, _nhwc(x))
    np.testing.assert_allclose(_nchw(out2), ref, atol=ATOL)


# ---------------------------------------------------------------------------
# Downsample padding layouts (diffusers Downsample2D)
# ---------------------------------------------------------------------------


def test_downsample_padding_matches_torch():
    """UNet: symmetric padding=1. VAE encoder: padding=0 with an F.pad of
    (0,1,0,1) — right/bottom only — before the conv. SD VAE checkpoints are
    trained with the asymmetric layout; converting them into a symmetric-pad
    conv shifts every feature map."""
    conv = tnn.Conv2d(32, 32, 3, stride=2, padding=0)
    x = torch.randn(1, 32, 8, 8)
    with torch.no_grad():
        ref_asym = conv(F.pad(x, (0, 1, 0, 1))).numpy()
        conv_sym = tnn.Conv2d(32, 32, 3, stride=2, padding=1)
        conv_sym.load_state_dict(conv.state_dict())
        ref_sym = conv_sym(x).numpy()
    params = {"conv": W._conv(_sd(conv), "m")}
    out_asym = L.Downsample2D(32, asymmetric=True).apply(
        {"params": params}, _nhwc(x))
    np.testing.assert_allclose(_nchw(out_asym), ref_asym, atol=ATOL)
    out_sym = L.Downsample2D(32).apply({"params": params}, _nhwc(x))
    np.testing.assert_allclose(_nchw(out_sym), ref_sym, atol=ATOL)
    assert not np.allclose(ref_asym, ref_sym, atol=1e-3)


# ---------------------------------------------------------------------------
# CLIP text layer (transformers CLIPEncoderLayer, causal)
# ---------------------------------------------------------------------------


class TCLIPAttn(tnn.Module):
    def __init__(self, hidden, heads, causal=True):
        super().__init__()
        self.q_proj = tnn.Linear(hidden, hidden)
        self.k_proj = tnn.Linear(hidden, hidden)
        self.v_proj = tnn.Linear(hidden, hidden)
        self.out_proj = tnn.Linear(hidden, hidden)
        self.heads, self.scale = heads, (hidden // heads) ** -0.5
        self.causal = causal

    def forward(self, x):
        B, S, C = x.shape

        def sp(t):
            return t.view(B, S, self.heads, -1).transpose(1, 2)

        logits = (sp(self.q_proj(x)) @ sp(self.k_proj(x)).transpose(-1, -2)
                  * self.scale)
        if self.causal:
            logits = logits + torch.triu(
                torch.full((S, S), torch.finfo(torch.float32).min),
                diagonal=1)
        o = (torch.softmax(logits, -1) @ sp(self.v_proj(x))
             ).transpose(1, 2).reshape(B, S, C)
        return self.out_proj(o)


class TCLIPMLP(tnn.Module):
    def __init__(self, hidden, inter):
        super().__init__()
        self.fc1 = tnn.Linear(hidden, inter)
        self.fc2 = tnn.Linear(inter, hidden)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))  # ACT2FN["gelu"] = exact erf


class TCLIPLayer(tnn.Module):
    def __init__(self, hidden, heads, inter, causal=True):
        super().__init__()
        self.layer_norm1 = tnn.LayerNorm(hidden)
        self.self_attn = TCLIPAttn(hidden, heads, causal=causal)
        self.layer_norm2 = tnn.LayerNorm(hidden)
        self.mlp = TCLIPMLP(hidden, inter)

    def forward(self, x):
        x = x + self.self_attn(self.layer_norm1(x))
        return x + self.mlp(self.layer_norm2(x))


def test_clip_text_layer_matches_torch():
    hidden, heads, inter = 64, 4, 128
    tm = TCLIPLayer(hidden, heads, inter)
    _randomize_norms(tm)
    params = W._clip_layer(_sd(tm), "m")
    x = torch.randn(2, 7, hidden)
    with torch.no_grad():
        ref = tm(x).numpy()
    fm = _CLIPLayer(hidden=hidden, heads=heads, intermediate=inter,
                    act="gelu", causal=True)
    out = fm.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


# ---------------------------------------------------------------------------
# Timestep embedding (diffusers get_timestep_embedding) + MLP
# ---------------------------------------------------------------------------


def test_timestep_embedding_matches_diffusers_math():
    t = np.asarray([0.0, 1.0, 7.0, 500.0, 999.0], np.float32)
    dim, half = 32, 16
    freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float64)
                   / half)
    emb = t[:, None].astype(np.float64) * freqs[None]
    sincos = np.concatenate([np.sin(emb), np.cos(emb)], -1)
    expected = np.concatenate([sincos[:, half:], sincos[:, :half]], -1)
    ours = L.timestep_embedding(jnp.asarray(t), dim)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_time_embedding_mlp_matches_torch():
    class TT(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear_1 = tnn.Linear(32, 128)
            self.linear_2 = tnn.Linear(128, 128)

        def forward(self, x):
            return self.linear_2(F.silu(self.linear_1(x)))

    tm = TT()
    sd = _sd(tm)
    params = {"linear_1": W._dense(sd, "m.linear_1"),
              "linear_2": W._dense(sd, "m.linear_2")}
    x = torch.randn(3, 32)
    with torch.no_grad():
        ref = tm(x).numpy()
    out = L.TimestepEmbedding(dim=128).apply({"params": params},
                                             jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)
