"""Attention ops: Pallas flash attention (TPU) + XLA fallback.

Used by every UNet/CLIP attention layer, replacing torch/cuDNN SDPA
(reference: diffusers AttnProcessor2_0 inside the hub pipelines;
SURVEY.md §2.2). Supports the Zero123++ *reference attention* pattern — the
cond-image KV tokens enter the kernel as a SECOND block source streamed from
HBM, so the concat at src/zero123plus.py:153-155 never materializes and no
full-length KV tensor is staged in VMEM.

Kernel design (SURVEY §2.3 sequence-parallel row): online-softmax flash
attention on a (batch*heads, q_blocks, kv_blocks) grid with the KV axis
innermost. Pallas double-buffers the 512-token KV blocks HBM->VMEM
automatically; the second source's grid indices are clamped so each block is
fetched exactly once. Softmax state (m, l, acc) lives in VMEM scratch and
carries across the kv grid axis; f32 accumulation with bf16 inputs. VMEM
footprint per program is O(Q_BLK*d + 2*KV_BLK*d) regardless of sequence
length (previously the whole padded KV — ~9.8 MB at the 19.2k-token ref-attn
top block — was staged per program).
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_MIN_SQ_PALLAS = 256
# r5: route short-KV calls (cross-attention's 77 context tokens, short
# write-pass sequences) to the XLA einsum path — the Pallas kernel's
# per-program overhead dominates when each (b,h,q-block) program only sees
# a single narrow KV block, while XLA fuses the whole QK-softmax-PV chain.
# Threshold set by full-teacher-wall A/B on chip (docs/teacher_bisect_r5.json
# routing variants), not standalone microbenches — the tunnel's async
# dispatch makes isolated per-op timings unreliable.
_MIN_KV_PALLAS = 1024

# Sequence-parallel context (SURVEY.md §2.3): while active, attention()
# routes eligible calls through parallel/ring.py's ring attention over the
# given mesh axis. Trace-time state: set it around tracing a sharded step
# (trainer._build_sds_step does this when optim.sequence_parallel > 1).
_SEQ_PARALLEL = {"mesh": None, "axis": "sp", "min_seq": 256}

# Trace-time attention-call recorder (tools/mfu_attribution.py): while a list
# is installed here, every attention() call appends its shape signature at
# trace time, so the exact per-layer attention workload of a jitted graph can
# be enumerated without parsing Pallas custom-calls out of HLO.
_CALL_RECORDER = {"calls": None}


@contextlib.contextmanager
def record_attention_calls(out: list):
    """Collect (B, H, Sq, Skv, Se, d, routed_pallas) tuples for every
    attention() traced inside this context."""
    prev = _CALL_RECORDER["calls"]
    _CALL_RECORDER["calls"] = out
    try:
        yield out
    finally:
        _CALL_RECORDER["calls"] = prev


@contextlib.contextmanager
def sequence_parallel(mesh, axis: str = "sp", min_seq: int = 256):
    """Route eligible attention() calls through ring attention while
    tracing under this context."""
    prev = dict(_SEQ_PARALLEL)
    _SEQ_PARALLEL.update(mesh=mesh, axis=axis, min_seq=min_seq)
    try:
        yield
    finally:
        _SEQ_PARALLEL.update(prev)


def _ring_eligible(q, k, extra_k):
    mesh = _SEQ_PARALLEL["mesh"]
    if mesh is None:
        return False
    n = mesh.shape[_SEQ_PARALLEL["axis"]]
    if q.shape[2] < _SEQ_PARALLEL["min_seq"]:
        return False
    ok = q.shape[2] % n == 0 and k.shape[2] % n == 0
    if extra_k is not None:
        ok = ok and extra_k.shape[2] % n == 0
    return ok


def _pick_blocks(sq: int, skv_max: int | None = None) -> tuple:
    """(q_blk, kv_blk) per sequence length, from the on-chip sweep (r3,
    chained-differenced timing at the real teacher shapes): large KV blocks
    dominate throughput at long sequences (1024/1024: 15.2 ms at the
    9.6k+9.6k ref-attn block vs 29.0 ms at 256/512); at short sequences the
    padding waste flips the ordering. 2048-wide blocks exceed the 16 MB
    VMEM scoped limit.

    kv_blk is additionally clamped to the (lane-aligned) longest KV source:
    cross-attention runs 77 context tokens against image queries, and a
    1024-wide KV block would pad those 77 to 1024 — 13x wasted MXU work and
    HBM traffic per cross-attn layer (r5 fix, measured in
    docs/mfu_r5.json)."""
    if sq >= 4800:
        q_blk, kv_blk = 1024, 1024
    elif sq >= 1024:
        q_blk, kv_blk = 512, 1024
    else:
        q_blk, kv_blk = 256, 512
    if skv_max is not None:
        kv_blk = min(kv_blk, max(128, -(-skv_max // 128) * 128))
    return q_blk, kv_blk


def _online_update(q, k, v, col0, limit, acc_ref, m_ref, l_ref):
    """One online-softmax step: scores of q (Qb,d) against k/v (Kb,d),
    masking columns >= limit, folded into the running (acc, m, l) state.
    Matmuls take the inputs' dtype (bf16-native on the MXU) with f32
    accumulation; softmax state stays f32."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < limit, s, _NEG_INF)
    m = m_ref[:]
    l = l_ref[:]
    m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    scale = jnp.exp(m - m_new)
    l_new = l * scale + jnp.sum(p, axis=1, keepdims=True)
    acc_new = acc_ref[:] * scale + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new
    l_ref[:] = l_new
    acc_ref[:] = acc_new


def _flash_kernel_single(len_ref, q_ref, k_ref, v_ref, o_ref,
                         acc_ref, m_ref, l_ref, *, nk, kv_blk):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    _online_update(q_ref[0], k_ref[0], v_ref[0],
                   j * kv_blk, len_ref[0], acc_ref, m_ref, l_ref)

    @pl.when(j == nk - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)


def _flash_kernel_two_source(len_ref, q_ref, k_ref, v_ref, ek_ref, ev_ref,
                             o_ref, acc_ref, m_ref, l_ref, *, nk, ne, kv_blk):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j < nk)
    def _():
        _online_update(q_ref[0], k_ref[0], v_ref[0],
                       j * kv_blk, len_ref[0], acc_ref, m_ref, l_ref)

    @pl.when(j >= nk)
    def _():
        _online_update(q_ref[0], ek_ref[0], ev_ref[0],
                       (j - nk) * kv_blk, len_ref[1], acc_ref, m_ref, l_ref)

    @pl.when(j == nk + ne - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x


@partial(jax.jit, static_argnames=("interpret",))
def flash_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           extra_k: Optional[jnp.ndarray] = None,
                           extra_v: Optional[jnp.ndarray] = None,
                           interpret: bool = False) -> jnp.ndarray:
    """q (B,H,Sq,d), k/v (B,H,Skv,d), optional extra_k/extra_v (B,H,Se,d)
    attended jointly with k/v (reference-attention second source). Applies
    1/sqrt(d) scaling internally. Returns (B,H,Sq,d)."""
    B, H, Sq, d_in = q.shape
    Skv = k.shape[2]
    scale = 1.0 / (d_in ** 0.5)
    has_extra = extra_k is not None
    Se = extra_k.shape[2] if has_extra else 0
    q_blk, kv_blk = _pick_blocks(Sq, max(Skv, Se))

    def prep(x):
        # lane-align head_dim (zero-padding the contraction is exact)
        x = _pad_to(x, 3, 128)
        return x.reshape(B * H, x.shape[2], x.shape[3])

    d = d_in + ((-d_in) % 128)
    q = prep(q * scale)
    k = prep(k)
    v = prep(v)
    q = _pad_to(q, 1, q_blk)
    k = _pad_to(k, 1, kv_blk)
    v = _pad_to(v, 1, kv_blk)
    nq = q.shape[1] // q_blk
    nk = k.shape[1] // kv_blk

    lens = jnp.asarray([Skv, Se], jnp.int32)
    kv_spec = pl.BlockSpec((1, kv_blk, d),
                           lambda b, i, j: (b, jnp.minimum(j, nk - 1), 0),
                           memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((q_blk, d), jnp.float32),
               pltpu.VMEM((q_blk, 1), jnp.float32),
               pltpu.VMEM((q_blk, 1), jnp.float32)]
    q_spec = pl.BlockSpec((1, q_blk, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, q_blk, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    if has_extra:
        ek = _pad_to(prep(extra_k), 1, kv_blk)
        ev = _pad_to(prep(extra_v), 1, kv_blk)
        ne = ek.shape[1] // kv_blk
        # second source: grid index clamped into [0, ne); each block fetched
        # once (pallas skips the copy while the block index is unchanged)
        ekv_spec = pl.BlockSpec(
            (1, kv_blk, d),
            lambda b, i, j: (b, jnp.clip(j - nk, 0, ne - 1), 0),
            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_flash_kernel_two_source, nk=nk, ne=ne, kv_blk=kv_blk),
            grid=(B * H, nq, nk + ne),
            in_specs=[len_spec, q_spec, kv_spec, kv_spec, ekv_spec,
                      ekv_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((B * H, nq * q_blk, d), q.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(lens, q, k, v, ek, ev)
    else:
        out = pl.pallas_call(
            partial(_flash_kernel_single, nk=nk, kv_blk=kv_blk),
            grid=(B * H, nq, nk),
            in_specs=[len_spec, q_spec, kv_spec, kv_spec],
            out_specs=o_spec,
            out_shape=jax.ShapeDtypeStruct((B * H, nq * q_blk, d), q.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )(lens, q, k, v)
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
    concat-KV, zero123plus.py:153): attended jointly with k/v. On the Pallas
    path they stream into the kernel as a second block source; the XLA
    fallback concatenates (mathematically identical)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    _tot_kv = k.shape[2] + (0 if extra_k is None else extra_k.shape[2])
    if _CALL_RECORDER["calls"] is not None:
        _CALL_RECORDER["calls"].append({
            "B": q.shape[0], "H": q.shape[1], "Sq": q.shape[2],
            "Skv": k.shape[2],
            "Se": 0 if extra_k is None else extra_k.shape[2],
            "d": q.shape[3], "dtype": str(q.dtype),
            "pallas": bool(use_pallas and q.shape[2] >= _MIN_SQ_PALLAS
                           and _tot_kv >= _MIN_KV_PALLAS),
        })
    if _ring_eligible(q, k, extra_k):
        from contexture_nerf_tpu.parallel.ring import ring_attention

        return ring_attention(q, k, v, _SEQ_PARALLEL["mesh"],
                              _SEQ_PARALLEL["axis"], extra_k, extra_v)
    if use_pallas and q.shape[2] >= _MIN_SQ_PALLAS \
            and _tot_kv >= _MIN_KV_PALLAS:
        return flash_attention_pallas(q, k, v, extra_k, extra_v)
    if extra_k is not None:
        k = jnp.concatenate([k, extra_k], axis=2)
        v = jnp.concatenate([v, extra_v], axis=2)
    return _xla_attention(q, k, v)
