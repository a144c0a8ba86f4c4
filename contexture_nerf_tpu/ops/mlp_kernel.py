"""Fused Fourier-embed + NeRF2D MLP Pallas kernel with custom VJP.

The texture atlas is synthesized by evaluating the 8x256 skip-MLP on a res^2
UV lattice every SDS iteration (reference textured_mesh.py:266-301 — the hot
non-raster op, SURVEY.md §7 item 3). Unfused, each of the ~9 layer activations
is a (res^2, 256) f32 HBM tensor (1 GB at res=1024) read and written once per
layer, twice more in the backward — the op is bandwidth-bound. This kernel
keeps the whole per-block computation in VMEM:

  forward:  grid over point blocks; embed uv -> 9 chained MXU matmuls; only
            (N,2) uv in and (N,3) out touch HBM (plus ~2 MB of weights).
  backward: recompute activations per block (flash-style), accumulate dW/db
            in f32 VMEM scratch across the sequential TPU grid, write once.

Layer shapes are padded to lane multiples (embed 42->128, skip concat
256+128=384) with zeros — exact, since the padded weight rows are zero.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLK = 512  # points per program
_EMB_PAD = 128  # 42-dim embedding padded to one lane tile
_W = 256
_SKIP = 4  # concat input after this layer's relu (run_nerf_helpers.py:83)
_DEPTH = 8
_OUT_PAD = 8  # 3 output channels padded (sublane multiple; a
# 128-lane pad would cost 42x the payload in HBM for g/out buffers)


def _dot(a, b, dims, cdt):
    """MXU matmul with f32 accumulation; operands cast to the compute dtype
    (bf16 runs the MXU at native rate — f32 matmuls decompose into multiple
    slower passes on TPU)."""
    return jax.lax.dot_general(a.astype(cdt), b.astype(cdt), dims,
                               preferred_element_type=jnp.float32)


def _embed_block(uv, multires: int):
    """Fourier embedding of (BLK, 2) uv -> (BLK, EMB_PAD) zero-padded."""
    outs = [uv]
    for i in range(multires):
        f = float(2.0 ** i)
        outs.append(jnp.sin(uv * f))
        outs.append(jnp.cos(uv * f))
    emb = jnp.concatenate(outs, axis=-1)  # (BLK, 2+4*multires)
    pad = _EMB_PAD - emb.shape[-1]
    return jnp.concatenate(
        [emb, jnp.zeros((emb.shape[0], pad), emb.dtype)], axis=-1)


def _forward_from_emb(emb, w_refs, b_refs, cdt):
    """Forward from a precomputed padded embedding (BLK, EMB_PAD).
    Returns (out (BLK, OUT_PAD), activations list for backward)."""
    acts = [emb]
    h = emb
    for i in range(_DEPTH):
        pre = _dot(h, w_refs[i][...], (((1,), (0,)), ((), ())), cdt)
        pre = pre + b_refs[i][...]
        h = jnp.maximum(pre, 0.0)
        if i == _SKIP:
            h = jnp.concatenate([emb, h], axis=-1)  # (BLK, 384)
        acts.append(h)
    out = _dot(h, w_refs[_DEPTH][...], (((1,), (0,)), ((), ())), cdt)
    out = out + b_refs[_DEPTH][...]
    return out, acts


def _forward_block(uv, w_refs, b_refs, multires: int, cdt):
    return _forward_from_emb(_embed_block(uv, multires), w_refs, b_refs, cdt)


def _fwd_kernel(multires, cdt, uv_ref, *rest):
    w_refs = rest[:_DEPTH + 1]
    b_refs = rest[_DEPTH + 1:2 * (_DEPTH + 1)]
    out_ref = rest[2 * (_DEPTH + 1)]
    if multires is None:  # input IS the padded embedding
        emb = uv_ref[...].astype(jnp.float32)
    else:
        emb = _embed_block(uv_ref[...].astype(jnp.float32), multires)
    out, _ = _forward_from_emb(emb, w_refs, b_refs, cdt)
    out_ref[...] = out


def _bwd_kernel(multires, cdt, uv_ref, g_ref, *rest):
    w_refs = rest[:_DEPTH + 1]
    b_refs = rest[_DEPTH + 1:2 * (_DEPTH + 1)]
    n = 2 * (_DEPTH + 1)
    dw_refs = rest[n:n + _DEPTH + 1]
    db_refs = rest[n + _DEPTH + 1:n + 2 * (_DEPTH + 1)]

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        for r in dw_refs:
            r[...] = jnp.zeros_like(r)
        for r in db_refs:
            r[...] = jnp.zeros_like(r)

    g = g_ref[...].astype(jnp.float32)  # (BLK, OUT_PAD)
    if multires is None:  # input IS the padded embedding
        emb = uv_ref[...].astype(jnp.float32)
    else:
        emb = _embed_block(uv_ref[...].astype(jnp.float32), multires)
    out, acts = _forward_from_emb(emb, w_refs, b_refs, cdt)

    # output layer
    h_last = acts[-1]
    dw_refs[_DEPTH][...] += _dot(h_last, g, (((0,), (0,)), ((), ())), cdt)
    db_refs[_DEPTH][...] += jnp.sum(g, axis=0, keepdims=True)
    delta = _dot(g, w_refs[_DEPTH][...], (((1,), (1,)), ((), ())), cdt)

    for i in range(_DEPTH - 1, -1, -1):
        h_in = acts[i]
        h_out = acts[i + 1]
        if i == _SKIP:
            # acts[i+1] = concat(emb, relu(pre)); strip the emb part
            relu_part = h_out[:, _EMB_PAD:]
            delta = delta[:, _EMB_PAD:]
            mask = (relu_part > 0).astype(jnp.float32)
        else:
            mask = (h_out > 0).astype(jnp.float32)
        delta = delta * mask
        dw_refs[i][...] += _dot(h_in, delta, (((0,), (0,)), ((), ())), cdt)
        db_refs[i][...] += jnp.sum(delta, axis=0, keepdims=True)
        if i > 0:
            delta = _dot(delta, w_refs[i][...], (((1,), (1,)), ((), ())),
                         cdt)


def _unpad_grads(dws, dbs, multires: int, like_params):
    emb_dim = 2 + 4 * multires
    p = {}
    for i in range(_DEPTH):
        if i == 0:
            k = dws[i][:emb_dim]
        elif i == _SKIP + 1:
            k = jnp.concatenate([dws[i][:emb_dim], dws[i][_EMB_PAD:]], axis=0)
        else:
            k = dws[i]
        p[f"pts_linear_{i}"] = {"kernel": k, "bias": dbs[i][0]}
    p["output_linear"] = {"kernel": dws[_DEPTH][:, :3],
                          "bias": dbs[_DEPTH][0, :3]}
    return {"params": p}


def _pad_points(uv):
    """Pad the point (or embedding) rows up to a _BLK multiple."""
    N, D = uv.shape
    pad = (-N) % _BLK
    if pad:
        uv = jnp.concatenate(
            [uv, jnp.zeros((pad, D), uv.dtype)], axis=0)
    return uv, N, N + pad


def _run_forward(ws, bs, uv, multires, interpret, cdt):
    uvp, N, Np = _pad_points(uv)
    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for w in ws]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for b in bs]
    in_dim = uv.shape[1]
    out = pl.pallas_call(
        partial(_fwd_kernel, multires, cdt),
        grid=(Np // _BLK,),
        in_specs=[pl.BlockSpec((_BLK, in_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + w_specs + b_specs,
        out_specs=pl.BlockSpec((_BLK, _OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, _OUT_PAD), jnp.float32),
        interpret=interpret,
    )(uvp, *ws, *bs)
    return out[:N, :3]


def _run_backward(ws, bs, uv, g, multires, interpret, cdt):
    uvp, N, Np = _pad_points(uv)
    gp = jnp.zeros((Np, _OUT_PAD), jnp.float32).at[:N, :3].set(g)
    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for w in ws]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for b in bs]
    out_shapes = ([jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
                  + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs])
    out_specs = ([pl.BlockSpec(w.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for w in ws]
                 + [pl.BlockSpec(b.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM) for b in bs])
    in_dim = uv.shape[1]
    outs = pl.pallas_call(
        partial(_bwd_kernel, multires, cdt),
        grid=(Np // _BLK,),
        in_specs=[pl.BlockSpec((_BLK, in_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_BLK, _OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + w_specs + b_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(uvp, gp, *ws, *bs)
    dws = outs[:_DEPTH + 1]
    dbs = outs[_DEPTH + 1:]
    return dws, dbs


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_nerf2d(params, uv, multires: int = 10, interpret: bool = False,
                 compute_dtype=jnp.float32):
    """Fused embed+MLP forward: params (flax NeRF2D tree), uv (N,2) ->
    raw mlp output (N,3). Differentiable w.r.t. params (uv is treated as a
    constant lattice, matching the pipeline's use). compute_dtype=bfloat16
    runs the matmuls at the MXU's native rate with f32 accumulation (the SDS
    hot path uses this; the reference runs its whole loop under fp16
    autocast, stable_diffusion_depth.py:330)."""
    ws, bs = _pad_params_traced(params, multires)
    return _run_forward(ws, bs, uv, multires, interpret, compute_dtype)


def _pad_params_traced(params, multires: int):
    """flax NeRF2D params -> padded (weights, biases) lists (f32), traced."""
    p = params["params"]
    emb_dim = 2 + 4 * multires
    ws, bs = [], []
    for i in range(_DEPTH):
        k = p[f"pts_linear_{i}"]["kernel"].astype(jnp.float32)
        b = p[f"pts_linear_{i}"]["bias"].astype(jnp.float32)
        if i == 0:
            k = jnp.concatenate(
                [k, jnp.zeros((_EMB_PAD - emb_dim, _W))], axis=0)
        elif i == _SKIP + 1:
            k = jnp.concatenate(
                [k[:emb_dim], jnp.zeros((_EMB_PAD - emb_dim, _W)),
                 k[emb_dim:]], axis=0)
        ws.append(k)
        bs.append(b[None])
    k = p["output_linear"]["kernel"].astype(jnp.float32)
    b = p["output_linear"]["bias"].astype(jnp.float32)
    ws.append(jnp.concatenate([k, jnp.zeros((_W, _OUT_PAD - 3))], axis=1))
    bs.append(jnp.concatenate([b, jnp.zeros(_OUT_PAD - 3)])[None])
    return ws, bs


def pad_embedding(uv, multires: int = 10, dtype=jnp.float32):
    """Precompute the zero-padded Fourier embedding (N, EMB_PAD) for
    fused_nerf2d_emb — the hot-loop UVs are static, so the ~40 sin/cos per
    point need not be recomputed every iteration (fwd AND bwd).

    dtype sets the STORAGE dtype (sin/cos are always computed in f32).
    Storing in the kernel's compute_dtype is lossless: the kernel casts the
    embedding to compute_dtype at every MXU use anyway, so bf16 storage with
    bf16 compute is bit-identical to f32 storage — at half the HBM residency
    (157 vs 314 MB for the 960x640 grid)."""
    return _embed_block(jnp.asarray(uv, jnp.float32), multires).astype(dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_nerf2d_emb(params, emb, multires: int = 10,
                     interpret: bool = False, compute_dtype=jnp.float32):
    """fused_nerf2d on a precomputed padded embedding (N, EMB_PAD) from
    pad_embedding. multires is still needed to unpad parameter gradients."""
    ws, bs = _pad_params_traced(params, multires)
    return _run_forward(ws, bs, emb, None, interpret, compute_dtype)


def _fused_emb_fwd(params, emb, multires, interpret, compute_dtype):
    out = fused_nerf2d_emb(params, emb, multires, interpret, compute_dtype)
    return out, (params, emb)


def _fused_emb_bwd(multires, interpret, compute_dtype, res, g):
    params, emb = res
    ws, bs = _pad_params_traced(params, multires)
    dws, dbs = _run_backward(ws, bs, emb, g.astype(jnp.float32), None,
                             interpret, compute_dtype)
    dparams = _unpad_grads(dws, dbs, multires, params)
    return dparams, jnp.zeros_like(emb)


fused_nerf2d_emb.defvjp(_fused_emb_fwd, _fused_emb_bwd)


def _fused_fwd(params, uv, multires, interpret, compute_dtype):
    out = fused_nerf2d(params, uv, multires, interpret, compute_dtype)
    return out, (params, uv)


def _fused_bwd(multires, interpret, compute_dtype, res, g):
    params, uv = res
    ws, bs = _pad_params_traced(params, multires)
    dws, dbs = _run_backward(ws, bs, uv, g.astype(jnp.float32), multires,
                             interpret, compute_dtype)
    dparams = _unpad_grads(dws, dbs, multires, params)
    return dparams, jnp.zeros_like(uv)


fused_nerf2d.defvjp(_fused_fwd, _fused_bwd)
