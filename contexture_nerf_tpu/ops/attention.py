"""Attention ops: Pallas flash attention (TPU) + XLA fallback.

Used by every UNet/CLIP attention layer, replacing torch/cuDNN SDPA
(reference: diffusers AttnProcessor2_0 inside the hub pipelines;
SURVEY.md §2.2). Supports the Zero123++ *reference attention* pattern — extra
KV tokens streamed as a second source so the concat at
src/zero123plus.py:153-155 never materializes a 2x-length KV tensor.

The Pallas kernel is a standard online-softmax flash attention:
grid (batch*heads, q_blocks); K/V streamed in blocks of 512 tokens; runs in
f32 accumulation with bf16 inputs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q_BLK = 256
_KV_BLK = 512
_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, len_ref, o_ref):
    """q: (1, Qb, d), k/v: (1, Skv, d) full in VMEM, len (SMEM): real kv len.
    One program computes one query block with online softmax over kv blocks."""
    q = q_ref[0].astype(jnp.float32)  # (Qb, d)
    kv_len = len_ref[0]
    Skv = k_ref.shape[1]
    num_kv_blocks = Skv // _KV_BLK

    def body(i, carry):
        acc, m, l = carry
        sl = pl.ds(i * _KV_BLK, _KV_BLK)
        k = k_ref[0, sl, :].astype(jnp.float32)  # (Kb, d)
        v = v_ref[0, sl, :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = i * _KV_BLK + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        scale = jnp.exp(m - m_new)
        l_new = l * scale + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * scale + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    d = q_ref.shape[2]
    acc = jnp.zeros((q.shape[0], d), jnp.float32)
    m = jnp.full((q.shape[0], 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc, m, l))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def flash_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """q (B,H,Sq,d), k/v (B,H,Skv,d), pre-scaled q expected by caller? No —
    applies 1/sqrt(d) scaling internally. Returns (B,H,Sq,d)."""
    B, H, Sq, d_in = q.shape
    Skv = k.shape[2]
    scale = 1.0 / (d_in ** 0.5)
    # lane-align head_dim (zero-padding the contraction is exact)
    dpad = (-d_in) % 128
    if dpad:
        pad = ((0, 0), (0, 0), (0, 0), (0, dpad))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    d = d_in + dpad
    q = (q * scale).reshape(B * H, Sq, d)
    k = k.reshape(B * H, Skv, d)
    v = v.reshape(B * H, Skv, d)

    qpad = (-Sq) % _Q_BLK
    kpad = (-Skv) % _KV_BLK
    if qpad:
        q = jnp.pad(q, ((0, 0), (0, qpad), (0, 0)))
    if kpad:
        k = jnp.pad(k, ((0, 0), (0, kpad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kpad), (0, 0)))
    Sqp, Skvp = Sq + qpad, Skv + kpad

    kv_len = jnp.asarray([Skv], jnp.int32)
    out = pl.pallas_call(
        _flash_kernel,
        grid=(B * H, Sqp // _Q_BLK),
        in_specs=[
            pl.BlockSpec((1, _Q_BLK, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skvp, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skvp, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, _Q_BLK, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Sqp, d), q.dtype),
        interpret=interpret,
    )(q, k, v, kv_len)
    return out[:, :Sq, :d_in].reshape(B, H, Sq, d_in)


def _xla_attention(q, k, v):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              extra_k: Optional[jnp.ndarray] = None,
              extra_v: Optional[jnp.ndarray] = None,
              use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """Multi-head attention over (B, H, S, d) tensors.

    extra_k/extra_v: optional reference-attention KV extension (Zero123++
    concat-KV, zero123plus.py:153): attended jointly with k/v."""
    if extra_k is not None:
        k = jnp.concatenate([k, extra_k], axis=2)
        v = jnp.concatenate([v, extra_v], axis=2)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and q.shape[2] >= _Q_BLK:
        return flash_attention_pallas(q, k, v)
    return _xla_attention(q, k, v)
