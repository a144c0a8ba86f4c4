"""Bisect the r1->r4 teacher regression (VERDICT r4 next-round item #3).

BENCH_r01 reported 10.254 steps/s; BENCH_r04 reports 9.693 (-5.5%), of which
only ~1.5% is attributed (exact-erf GELU parity fix). This tool runs, in ONE
chip session back-to-back (so tunnel-day variance cannot masquerade as a
code delta):

  1. r1-as-is    — the r1 code tree (git worktree @ 90e39e0, the exact
                   commit BENCH_r01 measured) running its own bench.py,
                   repeated 3x for a median
  2. current     — HEAD teacher benched with the SAME 20-iter single-block
                   loop the r1 bench used, plus the modern windows/IQR
  3. current + tanh-GELU       — reverts the r4 erf parity fix (cost of erf)
  4. current + r1 block sizes  — flash attention at r1's 256/512 blocks
  5. current + XLA attention   — no Pallas kernel at all (reference point)

Each variant is its own subprocess (one chip user at a time, clean HBM).
Writes docs/teacher_bisect_r5.json.

Usage: python tools/teacher_bisect.py [--skip r1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
R1_COMMIT = "90e39e0"
R1_WT = Path("/tmp/r1wt")

_DRIVER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")
import jax, jax.numpy as jnp
cache = os.environ.get("CTN_JAX_CACHE", os.path.expanduser("~/.cache/ctnerf_jax"))
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

variant = {variant!r}
if variant == "tanh_gelu":
    import jax.nn as jnn
    real = jnn.gelu
    def tanh_gelu(x, approximate=True):
        return real(x, approximate=True)
    # patch at flax's reference (layers.py calls nn.gelu via flax.linen)
    import flax.linen as fnn
    fnn.gelu = tanh_gelu
    import contexture_nerf_tpu.diffusion.layers as L
    L.nn.gelu = tanh_gelu
elif variant == "r1_blocks":
    import contexture_nerf_tpu.ops.attention as A
    A._pick_blocks = lambda sq, skv_max=None: (256, 512)
elif variant == "wide_kv_cross":
    # pre-r5 block picker: no kv clamp to the KV length, so 77-token
    # cross-attention KV pads to a 1024-wide block (isolates the r5 fix)
    import contexture_nerf_tpu.ops.attention as A
    def _old_pick(sq, skv_max=None):
        if sq >= 4800:
            return 1024, 1024
        if sq >= 1024:
            return 512, 1024
        return 256, 512
    A._pick_blocks = _old_pick
elif variant == "xla_attention":
    import functools
    import contexture_nerf_tpu.diffusion.layers as L
    from contexture_nerf_tpu.ops import attention as A
    L.attention = functools.partial(A.attention, use_pallas=False)
elif variant == "q2048_top":
    # wider q blocks at the 9600-token self-attn: halves the KV
    # re-streaming (nq 10 -> 5 passes over the 11.2k-token KV)
    import contexture_nerf_tpu.ops.attention as A
    _orig = A._pick_blocks
    def _pick(sq, skv_max=None):
        q_blk, kv_blk = _orig(sq, skv_max)
        return (2048, kv_blk) if sq >= 4800 else (q_blk, kv_blk)
    A._pick_blocks = _pick
elif variant.startswith("kv"):
    # routing-threshold A/B (r5): pallas only when Skv+Se >= N.
    # kv0 = every eligible call on pallas (pre-r5 behavior);
    # kv128 = only the 77-token cross-attn on XLA; kv1024 adds the
    # 700-token deep self-attn; kv2048 adds the 1600-token write pass;
    # kv4096 adds the 2800-token mid self-attn.
    import contexture_nerf_tpu.ops.attention as A
    A._MIN_KV_PALLAS = int(variant[2:])

from contexture_nerf_tpu.core.timing import median_iqr_ms, timed_windows
from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline

pipe = Zero123PlusPipeline(tiny=False, dtype=jnp.bfloat16, seed=0)
h, w, cond_hw = 120, 80, 40
latents = jnp.zeros((1, 4, h, w), jnp.float32)
clp = jnp.zeros((2, 4, cond_hw, cond_hw), jnp.float32)
ehs = jnp.zeros((2, 77, pipe.text_config.hidden_size), jnp.float32)
depth = jnp.zeros((1, 3, h * 8, w * 8), jnp.float32)
t = jnp.asarray([500], jnp.int32)
key = jax.random.PRNGKey(0)
emb = pipe.embed_control_cond(pipe.params, depth, (h, w))

def f(params, latents, t, clp, ehs, depth, emb):
    return pipe._cfg_v_pred(params, latents, t, clp, ehs, depth, 10.0, key,
                            scale_input=lambda x: x, cn_cond_emb=emb)

args = (pipe.params, latents, t, clp, ehs, depth, emb)
compiled = jax.jit(f).lower(*args).compile()
jax.block_until_ready(compiled(*args))

# r1-methodology loop: 20 dispatches, ONE final block (pipelined)
t0 = time.perf_counter()
for _ in range(20):
    out = compiled(*args)
jax.block_until_ready(out)
r1_style_ms = (time.perf_counter() - t0) / 20 * 1e3

samples = timed_windows(lambda: compiled(*args), jax.block_until_ready,
                        15, 5)
med_ms, iqr_ms = median_iqr_ms(samples)
print("BISECT_JSON:" + json.dumps({
    "variant": variant,
    "r1_style_loop_ms": round(r1_style_ms, 2),
    "windows_median_ms": round(med_ms, 2),
    "windows_iqr_ms": round(iqr_ms, 2),
    "steps_per_sec": round(1e3 / med_ms, 3),
}))
"""


def ensure_worktree() -> None:
    if (R1_WT / "bench.py").exists():
        return
    subprocess.run(["git", "worktree", "add", "--detach", str(R1_WT),
                    R1_COMMIT], cwd=REPO, check=True)


def run_r1_asis(n: int = 3) -> dict:
    vals = []
    for _ in range(n):
        r = subprocess.run([sys.executable, "bench.py"], cwd=R1_WT,
                           capture_output=True, text=True, timeout=1800)
        for line in r.stdout.splitlines():
            try:
                d = json.loads(line)
                if "value" in d:
                    vals.append(d["value"])
            except ValueError:
                continue
    vals.sort()
    return {"variant": "r1_asis_code_and_bench",
            "runs_steps_per_sec": vals,
            "median_steps_per_sec": vals[len(vals) // 2] if vals else None}


def run_variant(variant: str) -> dict:
    code = (_DRIVER.replace("{repo!r}", repr(str(REPO)))
            .replace("{variant!r}", repr(variant)))
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       capture_output=True, text=True, timeout=2400)
    for line in r.stdout.splitlines():
        if line.startswith("BISECT_JSON:"):
            return json.loads(line[len("BISECT_JSON:"):])
    return {"variant": variant,
            "error": (r.stderr[-1500:] or r.stdout[-500:])}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list: r1,current,...")
    ap.add_argument("--out",
                    default=str(REPO / "docs" / "teacher_bisect_r5.json"))
    args = ap.parse_args(argv)
    skip = set(filter(None, args.skip.split(",")))

    ap2_variants = os.environ.get(
        "BISECT_VARIANTS",
        "current,wide_kv_cross,tanh_gelu,r1_blocks,xla_attention")
    rows = []
    for variant in ap2_variants.split(","):
        if variant in skip:
            continue
        print(f"running variant {variant} ...", flush=True)
        rows.append(run_variant(variant))
        print(f"  {rows[-1]}", flush=True)

    if "r1" not in skip:
        ensure_worktree()
        print("running r1-as-is ...", flush=True)
        rows.append(run_r1_asis())
        print(f"  {rows[-1]}", flush=True)

    result = {
        "what": "r1->r4 teacher regression bisect, one chip session, "
                "back-to-back",
        "reference_points": {"BENCH_r01": 10.254, "BENCH_r04": 9.693},
        "rows": rows,
    }
    Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({"wrote": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
