"""Flash-attention block-size sweep at the real teacher shapes
(VERDICT r4 next-round stretch #9).

RELIABILITY WARNING (r5, measured): the axon tunnel intermittently enters
a state where dispatch stops blocking — this tool's standalone scan-harness
numbers then read microseconds for multi-ms kernels (docs/PERF.md round-5
methodology note). Treat its output as advisory; authoritative block/
routing decisions come from FULL-GRAPH teacher walls via
tools/teacher_bisect.py variants (see docs/kv_routing_r5.json — that A/B
set the shipped _MIN_KV_PALLAS=1024 and confirmed the 1024/1024 blocks).

Benches flash_attention_pallas standalone (same scan harness as
tools/mfu_attribution.py) for each (q_blk, kv_blk) candidate at the
teacher's dominant attention shapes, and reports the best per shape. The
winning configuration is then hard-coded into ops/attention.py:_pick_blocks
with this artifact as provenance.

VMEM feasibility note: per program the kernel stages q_blk x 128 (bf16) +
2 x kv_blk x 128 (bf16, double-buffered by the pipeline) + q_blk x 128 f32
scratch — 2048-wide blocks fit comfortably in the 16 MB scoped limit with
the streamed-KV design (the r3 "2048 exceeds VMEM" note applied to the old
whole-KV-staging kernel).

Writes docs/attn_sweep_r5.json.  Usage: python tools/attn_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHAPES = [
    # the teacher's Pallas attention workload, from docs/mfu_r5.json's
    # traced call census (ref-attn self-attn extends KV via the second
    # source; cross-attn has 77-token KV). Se values match the real trace.
    {"B": 2, "H": 5, "Sq": 9600, "Skv": 9600, "Se": 1600, "d": 64,
     "dtype": "bfloat16", "label": "self_top_refattn"},
    {"B": 2, "H": 10, "Sq": 2400, "Skv": 2400, "Se": 400, "d": 64,
     "dtype": "bfloat16", "label": "self_mid_refattn"},
    {"B": 2, "H": 20, "Sq": 600, "Skv": 600, "Se": 100, "d": 64,
     "dtype": "bfloat16", "label": "self_deep_refattn"},
    {"B": 2, "H": 5, "Sq": 1600, "Skv": 1600, "Se": 0, "d": 64,
     "dtype": "bfloat16", "label": "write_pass_self"},
    {"B": 2, "H": 10, "Sq": 400, "Skv": 400, "Se": 0, "d": 64,
     "dtype": "bfloat16", "label": "write_pass_mid_self"},
    {"B": 2, "H": 5, "Sq": 9600, "Skv": 77, "Se": 0, "d": 64,
     "dtype": "bfloat16", "label": "cross_top"},
    {"B": 2, "H": 10, "Sq": 2400, "Skv": 77, "Se": 0, "d": 64,
     "dtype": "bfloat16", "label": "cross_mid"},
    {"B": 2, "H": 20, "Sq": 600, "Skv": 77, "Se": 0, "d": 64,
     "dtype": "bfloat16", "label": "cross_deep"},
]

CANDIDATES = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
              (1024, 2048), (2048, 512), (2048, 1024), (2048, 2048)]


def main() -> int:
    import jax

    cache_dir = os.environ.get("CTN_JAX_CACHE",
                               os.path.expanduser("~/.cache/ctnerf_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import contexture_nerf_tpu.ops.attention as A
    from tools.mfu_attribution import bench_attention_shape

    baseline_pick = A._pick_blocks
    rows = []
    for shape in SHAPES:
        row = {"shape": shape, "candidates": {}}
        # XLA fallback at the same shape (einsum+softmax, concat KV): the
        # Pallas kernel's per-program overhead can dominate at short
        # KV/sequence — route-by-measurement, not by assumption
        xla_ms, xla_err = bench_attention_shape(
            shape, reps=3, iters=2, scan_len=8, force_xla=True)
        row["candidates"]["xla"] = (round(xla_ms, 3) if xla_ms is not None
                                    else f"error: {xla_err}")
        print(f"{shape['label']} xla: {row['candidates']['xla']}",
              flush=True)
        base_blocks = baseline_pick(shape["Sq"], max(shape["Skv"],
                                                     shape["Se"]))
        # short-KV shapes: block geometry is moot (a single 128-wide KV
        # block); only xla-vs-pallas routing matters — bench the default
        # blocks only
        cands = (CANDIDATES if shape["Skv"] + shape["Se"] > 512
                 else [base_blocks])
        for q_blk, kv_blk in cands:
            kv_eff = min(kv_blk,
                         max(128, -(-max(shape["Skv"], shape["Se"]) // 128)
                             * 128))
            A._pick_blocks = (lambda qb, kb: lambda sq, skv_max=None:
                              (qb, kb))(q_blk, kv_eff)
            ms, err = bench_attention_shape(shape, reps=3, iters=2,
                                            scan_len=8)
            key = f"q{q_blk}_kv{kv_eff}"
            row["candidates"][key] = (round(ms, 3) if ms is not None
                                      else f"error: {err}")
            print(f"{shape['label']} {key}: {row['candidates'][key]}",
                  flush=True)
        A._pick_blocks = baseline_pick
        numeric = {k: v for k, v in row["candidates"].items()
                   if isinstance(v, float)}
        if numeric:
            best = min(numeric, key=numeric.get)
            row["best"] = {"blocks": best, "ms": numeric[best],
                           "baseline_blocks": list(base_blocks),
                           "baseline_ms": numeric.get(
                               f"q{base_blocks[0]}_kv{base_blocks[1]}")}
        rows.append(row)

    out = {"what": "flash-attention (q_blk, kv_blk) sweep at the teacher's "
                   "Pallas shapes, scan-harness standalone bench",
           "device": str(jax.devices()[0]),
           "rows": rows}
    dst = Path(__file__).resolve().parent.parent / "docs" / \
        "attn_sweep_r5.json"
    dst.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"wrote": str(dst)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
