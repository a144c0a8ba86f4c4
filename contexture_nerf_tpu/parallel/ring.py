"""Ring attention over ICI — the cross-chip half of sequence/context
parallelism (SURVEY.md §2.3 "Sequence/context parallel" row).

The Zero123++ reference attention doubles every self-attn KV to
2*(H/8 * W/8) tokens by appending the cond-image keys/values
(/root/reference/src/zero123plus.py:153-155). On ONE chip the Pallas flash
kernel streams that second source from HBM (ops/attention.py). ACROSS chips
this module shards the sequence axis over a mesh axis: each device keeps its
local Q shard and 1/N of each KV source, and the KV shards rotate around the
ring with `lax.ppermute`, folded into an online-softmax running state — the
full (let alone doubled) KV never materializes on any single device, and the
per-step transfer rides the ICI while XLA overlaps it with the previous
block's attention compute (async collective).

The local block product is a dense einsum: each step's score block is only
(S/N x S_kv/N) per (batch, head) — at N=8 that is 1/64 of the global score
matrix; swapping it for the Pallas kernel (returning partial o/lse) is a
drop-in local optimization and does not change the ring protocol.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = -1e30


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, seq_axis: str = "sp",
                   extra_k: Optional[jnp.ndarray] = None,
                   extra_v: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Attention over (B, H, S, d) with the S axis sharded over
    `mesh.shape[seq_axis]` devices. extra_k/extra_v (B, H, Se, d) are the
    reference-attention second KV source, sharded the same way; each device
    folds its local shard of BOTH sources into the ring so the global
    concatenation never exists anywhere. Applies 1/sqrt(d) internally.
    Requires S and Se to divide the axis size."""
    B, H, S, d = q.shape
    n = mesh.shape[seq_axis]
    if S % n or k.shape[2] % n or (extra_k is not None
                                   and extra_k.shape[2] % n):
        raise ValueError(
            f"sequence axes must divide the '{seq_axis}' mesh axis ({n}): "
            f"Sq={S}, Skv={k.shape[2]}"
            + (f", Se={extra_k.shape[2]}" if extra_k is not None else ""))
    scale = 1.0 / (d ** 0.5)
    has_extra = extra_k is not None
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(q_blk, *kv):
        # local shards: q (B,H,S/n,d); kv shards concatenated device-locally
        if has_extra:
            k_blk = jnp.concatenate([kv[0], kv[2]], axis=2)
            v_blk = jnp.concatenate([kv[1], kv[3]], axis=2)
        else:
            k_blk, v_blk = kv
        qf = q_blk.astype(jnp.float32) * scale
        shp = q_blk.shape[:3]
        o0 = jnp.zeros(shp + (d,), jnp.float32)
        m0 = jnp.full(shp + (1,), _NEG_INF, jnp.float32)
        l0 = jnp.zeros(shp + (1,), jnp.float32)

        def accum(o, m, l, kc, vc):
            s = jnp.einsum("bhqd,bhkd->bhqk", qf,
                           kc.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m, s.max(-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + p.sum(-1, keepdims=True)
            o_new = o * corr + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32),
                preferred_element_type=jnp.float32)
            return o_new, m_new, l_new

        def step(_, carry):
            o, m, l, kc, vc = carry
            o, m, l = accum(o, m, l, kc, vc)
            kc = jax.lax.ppermute(kc, seq_axis, perm)
            vc = jax.lax.ppermute(vc, seq_axis, perm)
            return o, m, l, kc, vc

        # rotate only between blocks: n-1 permuted steps, then fold the
        # last block in place (a rotation after the final accumulate would
        # send one full extra round of both KV shards over ICI per call)
        o, m, l, kc, vc = jax.lax.fori_loop(0, n - 1, step,
                                            (o0, m0, l0, k_blk, v_blk))
        o, m, l = accum(o, m, l, kc, vc)
        return (o / jnp.maximum(l, 1e-30)).astype(q_blk.dtype)

    spec = P(None, None, seq_axis, None)
    args = (q, k, v) + ((extra_k, extra_v) if has_extra else ())
    fn = shard_map(body, mesh=mesh, in_specs=(spec,) * len(args),
                   out_specs=spec, check_rep=False)
    return fn(*args)
