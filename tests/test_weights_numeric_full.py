"""FULL-MODEL numeric weight-conversion validation on tiny configs.

Extends tests/test_weights_numeric.py (block-level mirrors) to whole
models: torch mirrors of the diffusers UNet2DConditionModel /
ControlNetModel / AutoencoderKL and the transformers CLIP text/vision
towers, built in the exact diffusers state-dict LAYOUT, so the real
`convert_unet` / `convert_controlnet` / `convert_vae` /
`convert_clip_text` / `convert_clip_vision` run end to end. This is the
only test class that can catch WIRING bugs — skip-connection stack order,
the up_blocks index reversal (diffusers up_blocks[0] is the deepest
block), upsample placement, time-embedding plumbing, moment clamping —
which block-level equality cannot.

Mirrored semantics: diffusers UNet2DConditionModel.forward /
ControlNetModel.forward / AutoencoderKL, transformers CLIPTextModel /
CLIPVisionModelWithProjection.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from contexture_nerf_tpu.diffusion import weights as W
from tests.test_weights_numeric import (ATOL, TCLIPLayer, TResnet,
                                        TTransformer2D, _nhwc, _nchw,
                                        _randomize_norms)

pytestmark = pytest.mark.slow  # whole-model compiles; full gate only

torch.manual_seed(0)


def _t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    emb = t[:, None].float() * freqs[None]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip


class _NS(tnn.Module):
    """Anonymous namespace module (for exact state-dict key layout)."""


class TTimeEmbedding(tnn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = tnn.Linear(in_dim, dim)
        self.linear_2 = tnn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class TDownsampler(tnn.Module):
    def __init__(self, ch, asymmetric=False):
        super().__init__()
        self.asymmetric = asymmetric
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2,
                               padding=0 if asymmetric else 1)

    def forward(self, x):
        if self.asymmetric:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUpsampler(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


def _build_unet_encoder(cfg, temb_dim, cross_dim):
    """down_blocks ModuleList + the skip-channel stack, shared by the UNet
    and ControlNet mirrors (diffusers encoders are identical)."""
    ch = cfg.block_out_channels
    n = len(ch)
    blocks = tnn.ModuleList()
    stack = [ch[0]]
    cur = ch[0]
    for b in range(n):
        blk = _NS()
        resnets, attns = [], []
        for _ in range(cfg.layers_per_block):
            resnets.append(TResnet(cur, ch[b], temb=temb_dim))
            cur = ch[b]
            if b < n - 1:
                attns.append(TTransformer2D(
                    ch[b], cfg.num_heads[b], ch[b] // cfg.num_heads[b],
                    cross_dim, depth=cfg.transformer_depth))
            stack.append(cur)
        blk.resnets = tnn.ModuleList(resnets)
        if attns:
            blk.attentions = tnn.ModuleList(attns)
        if b < n - 1:
            blk.downsamplers = tnn.ModuleList([TDownsampler(cur)])
            stack.append(cur)
        blocks.append(blk)
    return blocks, stack, cur


def _run_encoder(blocks, h, temb, ctx):
    hs = [h]
    for blk in blocks:
        for i, res in enumerate(blk.resnets):
            h = res(h, temb)
            if hasattr(blk, "attentions"):
                h = blk.attentions[i](h, ctx)
            hs.append(h)
        if hasattr(blk, "downsamplers"):
            h = blk.downsamplers[0].conv(h)
            hs.append(h)
    return h, hs


class TMidBlock(_NS):
    def __init__(self, ch, heads, cross_dim, temb_dim, depth):
        super().__init__()
        self.resnets = tnn.ModuleList([TResnet(ch, ch, temb=temb_dim),
                                       TResnet(ch, ch, temb=temb_dim)])
        self.attentions = tnn.ModuleList([
            TTransformer2D(ch, heads, ch // heads, cross_dim, depth=depth)])

    def forward(self, h, temb, ctx):
        h = self.resnets[0](h, temb)
        h = self.attentions[0](h, ctx)
        return self.resnets[1](h, temb)


class TUNet(tnn.Module):
    """diffusers UNet2DConditionModel mirror for our UNetConfig."""

    def __init__(self, cfg, cross_dim):
        super().__init__()
        ch = cfg.block_out_channels
        n = len(ch)
        temb_dim = ch[0] * 4
        self.cfg = cfg
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = TTimeEmbedding(ch[0], temb_dim)
        self.down_blocks, stack, cur = _build_unet_encoder(
            cfg, temb_dim, cross_dim)
        self.mid_block = TMidBlock(ch[-1], cfg.num_heads[-1], cross_dim,
                                   temb_dim, cfg.transformer_depth)
        self.up_blocks = tnn.ModuleList()
        for u in range(n):
            bi = n - 1 - u
            out = ch[bi]
            blk = _NS()
            resnets, attns = [], []
            for _ in range(cfg.layers_per_block + 1):
                skip_ch = stack.pop()
                resnets.append(TResnet(cur + skip_ch, out, temb=temb_dim))
                cur = out
                if bi < n - 1:
                    attns.append(TTransformer2D(
                        out, cfg.num_heads[bi], out // cfg.num_heads[bi],
                        cross_dim, depth=cfg.transformer_depth))
            blk.resnets = tnn.ModuleList(resnets)
            if attns:
                blk.attentions = tnn.ModuleList(attns)
            if bi > 0:
                blk.upsamplers = tnn.ModuleList([TUpsampler(out)])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(32, ch[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx):
        temb = self.time_embedding(
            _t_timestep_embedding(t, self.cfg.block_out_channels[0]))
        h = self.conv_in(x)
        h, hs = _run_encoder(self.down_blocks, h, temb, ctx)
        h = self.mid_block.forward(h, temb, ctx)
        for blk in self.up_blocks:
            for i, res in enumerate(blk.resnets):
                h = res(torch.cat([h, hs.pop()], dim=1), temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[i](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def _tiny_cfg():
    from contexture_nerf_tpu.diffusion.unet import UNetConfig

    return UNetConfig.tiny(), 32  # cross_dim matches tiny default


def test_full_unet_matches_torch():
    from contexture_nerf_tpu.diffusion.unet import UNet2DCondition

    cfg, cross = _tiny_cfg()
    tm = TUNet(cfg, cross)
    _randomize_norms(tm)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    params = W.convert_unet(sd, cfg)
    x = torch.randn(2, cfg.in_channels, 16, 16)
    t = torch.tensor([7.0, 431.0])
    ctx = torch.randn(2, 5, cross)
    with torch.no_grad():
        ref = tm(x, t, ctx).numpy()
    fm = UNet2DCondition(cfg)
    out = fm.apply(params, jnp.asarray(x.numpy()),
                   jnp.asarray([7, 431], jnp.int32),
                   jnp.asarray(ctx.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


class TControlNet(tnn.Module):
    """diffusers ControlNetModel mirror (encoder + zero-convs; weights are
    RANDOM here — default torch init — so the projections actually test the
    conversion, unlike the zero init of a fresh checkpoint)."""

    def __init__(self, cfg, cross_dim, cond_ch=(16, 32, 96, 256)):
        super().__init__()
        ch = cfg.block_out_channels
        temb_dim = ch[0] * 4
        self.cfg = cfg
        self.conv_in = tnn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = TTimeEmbedding(ch[0], temb_dim)
        emb = _NS()
        emb.conv_in = tnn.Conv2d(3, cond_ch[0], 3, padding=1)
        blocks = []
        for i in range(len(cond_ch) - 1):
            blocks.append(tnn.Conv2d(cond_ch[i], cond_ch[i], 3, padding=1))
            blocks.append(tnn.Conv2d(cond_ch[i], cond_ch[i + 1], 3,
                                     stride=2, padding=1))
        emb.blocks = tnn.ModuleList(blocks)
        emb.conv_out = tnn.Conv2d(cond_ch[-1], ch[0], 3, padding=1)
        self.controlnet_cond_embedding = emb
        self.down_blocks, stack, cur = _build_unet_encoder(
            cfg, temb_dim, cross_dim)
        self.mid_block = TMidBlock(ch[-1], cfg.num_heads[-1], cross_dim,
                                   temb_dim, cfg.transformer_depth)
        self.controlnet_down_blocks = tnn.ModuleList(
            [tnn.Conv2d(c, c, 1) for c in
             [ch[0]] + [c for c in self._stack_channels(cfg)]])
        self.controlnet_mid_block = tnn.Conv2d(ch[-1], ch[-1], 1)

    @staticmethod
    def _stack_channels(cfg):
        ch = cfg.block_out_channels
        out = []
        for b in range(len(ch)):
            out += [ch[b]] * cfg.layers_per_block
            if b < len(ch) - 1:
                out.append(ch[b])
        return out

    def forward(self, x, t, ctx, cond, scale):
        temb = self.time_embedding(
            _t_timestep_embedding(t, self.cfg.block_out_channels[0]))
        e = self.controlnet_cond_embedding
        c = F.silu(e.conv_in(cond))
        for blk in e.blocks:
            c = F.silu(blk(c))
        c = e.conv_out(c)
        h = self.conv_in(x) + c
        h, hs = _run_encoder(self.down_blocks, h, temb, ctx)
        h = self.mid_block.forward(h, temb, ctx)
        downs = [z(r) * scale
                 for z, r in zip(self.controlnet_down_blocks, hs)]
        return downs, self.controlnet_mid_block(h) * scale


def test_full_controlnet_matches_torch():
    from contexture_nerf_tpu.diffusion.controlnet import ControlNet

    cfg, cross = _tiny_cfg()
    tm = TControlNet(cfg, cross)
    _randomize_norms(tm)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    params = W.convert_controlnet(sd, cfg)
    x = torch.randn(2, cfg.in_channels, 16, 16)
    t = torch.tensor([55.0, 900.0])
    ctx = torch.randn(2, 5, cross)
    cond = torch.randn(2, 3, 128, 128)  # /8 embedder -> the 16x16 latent
    with torch.no_grad():
        ref_downs, ref_mid = tm(x, t, ctx, cond, 2.0)
    fm = ControlNet(cfg)
    downs, mid = fm.apply(params, jnp.asarray(x.numpy()),
                          jnp.asarray([55, 900], jnp.int32),
                          jnp.asarray(ctx.numpy()),
                          jnp.asarray(cond.numpy()), 2.0)
    assert len(downs) == len(ref_downs)
    for a, b in zip(downs, ref_downs):
        np.testing.assert_allclose(_nchw(a), b.numpy(), atol=5e-5)
    np.testing.assert_allclose(_nchw(mid), ref_mid.numpy(), atol=5e-5)


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------


class TVAE(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        from tests.test_weights_numeric import TVAEAttn

        ch = cfg.block_out_channels
        n = len(ch)
        self.cfg = cfg
        enc = _NS()
        enc.conv_in = tnn.Conv2d(cfg.in_channels, ch[0], 3, padding=1)
        enc.down_blocks = tnn.ModuleList()
        cur = ch[0]
        for b in range(n):
            blk = _NS()
            resnets = []
            for _ in range(cfg.layers_per_block):
                resnets.append(TResnet(cur, ch[b], use_temb=False, eps=1e-6))
                cur = ch[b]
            blk.resnets = tnn.ModuleList(resnets)
            if b < n - 1:
                blk.downsamplers = tnn.ModuleList(
                    [TDownsampler(cur, asymmetric=True)])
            enc.down_blocks.append(blk)
        enc.mid_block = _NS()
        enc.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch[-1], ch[-1], use_temb=False, eps=1e-6),
             TResnet(ch[-1], ch[-1], use_temb=False, eps=1e-6)])
        enc.mid_block.attentions = tnn.ModuleList([TVAEAttn(ch[-1])])
        enc.conv_norm_out = tnn.GroupNorm(32, ch[-1], eps=1e-6)
        enc.conv_out = tnn.Conv2d(ch[-1], 2 * cfg.latent_channels, 3,
                                  padding=1)
        self.encoder = enc
        self.quant_conv = tnn.Conv2d(2 * cfg.latent_channels,
                                     2 * cfg.latent_channels, 1)
        self.post_quant_conv = tnn.Conv2d(cfg.latent_channels,
                                          cfg.latent_channels, 1)
        dec = _NS()
        dec.conv_in = tnn.Conv2d(cfg.latent_channels, ch[-1], 3, padding=1)
        dec.mid_block = _NS()
        dec.mid_block.resnets = tnn.ModuleList(
            [TResnet(ch[-1], ch[-1], use_temb=False, eps=1e-6),
             TResnet(ch[-1], ch[-1], use_temb=False, eps=1e-6)])
        dec.mid_block.attentions = tnn.ModuleList([TVAEAttn(ch[-1])])
        dec.up_blocks = tnn.ModuleList()
        cur = ch[-1]
        for u in range(n):
            bi = n - 1 - u
            out = ch[bi]
            blk = _NS()
            resnets = []
            for _ in range(cfg.layers_per_block + 1):
                resnets.append(TResnet(cur, out, use_temb=False, eps=1e-6))
                cur = out
            blk.resnets = tnn.ModuleList(resnets)
            if bi > 0:
                blk.upsamplers = tnn.ModuleList([TUpsampler(out)])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = tnn.GroupNorm(32, ch[0], eps=1e-6)
        dec.conv_out = tnn.Conv2d(ch[0], cfg.in_channels, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        moments = self.quant_conv(h)
        mean, logvar = moments.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for blk in d.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


def test_full_vae_matches_torch():
    from contexture_nerf_tpu.diffusion.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig.tiny()
    tm = TVAE(cfg)
    _randomize_norms(tm)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    params = W.convert_vae(sd, cfg)
    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        ref_mean, ref_logvar = tm.encode_moments(x)
        ref_img = tm.decode(ref_mean).numpy()
    fm = AutoencoderKL(cfg)
    mean, logvar = fm.apply(params, jnp.asarray(x.numpy()),
                            method=fm.encode_moments)
    np.testing.assert_allclose(np.asarray(mean), ref_mean.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(logvar), ref_logvar.numpy(),
                               atol=ATOL)
    img = fm.apply(params, mean, method=fm.decode)
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=5e-5)


# ---------------------------------------------------------------------------
# CLIP text + vision towers
# ---------------------------------------------------------------------------


def test_full_clip_text_matches_torch():
    from contexture_nerf_tpu.diffusion.clip import (CLIPTextConfig,
                                                    CLIPTextModel)

    cfg = CLIPTextConfig.tiny()
    tm = tnn.Module()
    text_model = _NS()
    emb = _NS()
    emb.token_embedding = tnn.Embedding(cfg.vocab_size, cfg.hidden_size)
    emb.position_embedding = tnn.Embedding(cfg.max_positions,
                                           cfg.hidden_size)
    text_model.embeddings = emb
    enc = _NS()
    enc.layers = tnn.ModuleList(
        [TCLIPLayer(cfg.hidden_size, cfg.num_heads, cfg.intermediate_size)
         for _ in range(cfg.num_layers)])
    text_model.encoder = enc
    text_model.final_layer_norm = tnn.LayerNorm(cfg.hidden_size)
    tm.text_model = text_model
    _randomize_norms(tm)

    ids = torch.randint(0, cfg.vocab_size, (2, cfg.max_positions))
    with torch.no_grad():
        e = text_model.embeddings
        x = (e.token_embedding(ids)
             + e.position_embedding(torch.arange(ids.shape[1]))[None])
        for layer in enc.layers:
            x = layer(x)
        ref = text_model.final_layer_norm(x).numpy()

    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    params = W.convert_clip_text(sd, cfg)
    fm = CLIPTextModel(cfg)
    out = fm.apply(params, jnp.asarray(ids.numpy(), jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


def test_full_clip_vision_matches_torch():
    from contexture_nerf_tpu.diffusion.clip import (
        CLIPVisionConfig, CLIPVisionModelWithProjection)

    cfg = CLIPVisionConfig.tiny()
    tm = tnn.Module()
    vm = _NS()
    emb = _NS()
    emb.patch_embedding = tnn.Conv2d(3, cfg.hidden_size, cfg.patch_size,
                                     stride=cfg.patch_size, bias=False)
    emb.class_embedding = tnn.Parameter(torch.randn(cfg.hidden_size))
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    emb.position_embedding = tnn.Embedding(n_pos, cfg.hidden_size)
    vm.embeddings = emb
    vm.pre_layrnorm = tnn.LayerNorm(cfg.hidden_size)
    enc = _NS()
    enc.layers = tnn.ModuleList(
        [TCLIPLayer(cfg.hidden_size, cfg.num_heads, cfg.intermediate_size,
                    causal=False)
         for _ in range(cfg.num_layers)])
    vm.encoder = enc
    vm.post_layernorm = tnn.LayerNorm(cfg.hidden_size)
    tm.vision_model = vm
    tm.visual_projection = tnn.Linear(cfg.hidden_size, cfg.projection_dim,
                                      bias=False)
    _randomize_norms(tm)

    px = torch.randn(2, 3, cfg.image_size, cfg.image_size)
    with torch.no_grad():
        p = emb.patch_embedding(px).flatten(2).transpose(1, 2)
        cls = emb.class_embedding.expand(p.shape[0], 1, -1)
        h = torch.cat([cls, p], dim=1) \
            + emb.position_embedding(torch.arange(p.shape[1] + 1))[None]
        h = vm.pre_layrnorm(h)
        for layer in enc.layers:
            h = layer(h)
        pooled = vm.post_layernorm(h[:, 0])
        ref = tm.visual_projection(pooled).numpy()

    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    params = W.convert_clip_vision(sd, cfg)
    fm = CLIPVisionModelWithProjection(cfg)
    out = fm.apply(params, jnp.asarray(px.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=ATOL)


# ---------------------------------------------------------------------------
# Production-shape samples (VERDICT r4 missing #4): tiny dims cannot catch
# head-split reshape/transpose bugs that only appear when hidden % heads
# changes or head_dim leaves 16/32 — these run ONE slice at the REAL dims.
# ---------------------------------------------------------------------------


def test_deep_block_production_dims():
    """One Zero123++/SD2 deep-block tower slice at real scale: 1280 ch,
    15x10 spatial, 20 heads x head_dim 64, 77-token cross context, 1280-dim
    time embedding — resnet + transformer exactly as a CrossAttnDownBlock
    layer runs them (reference src/zero123plus.py:164-298; diffusers
    UNet2DConditionModel deep block)."""
    from contexture_nerf_tpu.diffusion import layers as L

    ch, heads, head_dim, cross, temb_dim = 1280, 20, 64, 1024, 1280
    h_sp, w_sp, ctx_len = 15, 10, 77
    torch.manual_seed(5)
    t_res = TResnet(ch, ch, temb=temb_dim)
    t_attn = TTransformer2D(ch, heads, head_dim, cross, depth=1)
    _randomize_norms(t_res)
    _randomize_norms(t_attn)

    x = torch.randn(1, ch, h_sp, w_sp)
    temb = torch.randn(1, temb_dim)
    ctx = torch.randn(1, ctx_len, cross)
    with torch.no_grad():
        ref = t_attn(t_res(x, temb), ctx).numpy()

    def _sd(mod):
        return {f"m.{k}": v.detach().numpy().copy()
                for k, v in mod.state_dict().items()}

    p_res = W._resnet(_sd(t_res), "m", use_temb=True)
    p_attn = W._transformer2d(_sd(t_attn), "m", depth=1, use_linear=True)

    f_res = L.ResnetBlock2D(out_channels=ch, use_temb=True)
    f_attn = L.Transformer2DModel(num_heads=heads, head_dim=head_dim,
                                  depth=1, use_linear_projection=True)
    mid = f_res.apply({"params": p_res}, _nhwc(x),
                      jnp.asarray(temb.numpy()))
    out = f_attn.apply({"params": p_attn}, mid,
                       context=jnp.asarray(ctx.numpy()))
    # 1280-ch accumulations over 20 heads: widen tolerance vs the tiny-dim
    # ATOL but keep it well under any wiring-bug signal (those are O(1))
    np.testing.assert_allclose(_nchw(out), ref, atol=5e-4)


def test_clip_vit_h_layer_production_dims():
    """One CLIP-ViT-H vision encoder layer at real dims: hidden 1280,
    16 heads -> head_dim 80 (the non-64, non-power-of-two-divisible split
    the Zero123++ vision encoder actually uses; reference loads it via
    transformers at src/zero123plus.py:770-779)."""
    from contexture_nerf_tpu.diffusion.clip import _CLIPLayer

    hidden, heads, inter, seq = 1280, 16, 5120, 257
    torch.manual_seed(6)
    tm = TCLIPLayer(hidden, heads, inter, causal=False)
    _randomize_norms(tm)
    sd = {f"m.{k}": v.detach().numpy().copy()
          for k, v in tm.state_dict().items()}
    params = W._clip_layer(sd, "m")
    x = torch.randn(1, seq, hidden)
    with torch.no_grad():
        ref = tm(x).numpy()
    fm = _CLIPLayer(hidden=hidden, heads=heads, intermediate=inter,
                    act="gelu", causal=False)
    out = fm.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)
