"""Round benchmark: Zero123++ teacher denoise steps/sec on one chip.

Matches BASELINE.md's headline unit ("UNet denoise steps/sec/chip"): one SDS
teacher evaluation = reference-write UNet pass (CFG batch 2) + depth
ControlNet + CFG-paired main UNet pass with doubled self-attn KV, on the real
SD2-backbone architecture at the real 3x2 grid latent (1,4,120,80), bf16.

vs_baseline compares against an A100 torch estimate for the same composite
step (~5.5 steps/s: ~60 ms/UNet-fwd at batch 2 x 2 passes + ControlNet; the
reference publishes no numbers — BASELINE.md documents this). >1.0 beats it.

Prints exactly one JSON line.
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

A100_REF_STEPS_PER_SEC = 5.5


def main():
    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline

    tiny = bool(os.environ.get("BENCH_TINY"))
    pipe = Zero123PlusPipeline(tiny=tiny, dtype=jnp.bfloat16, seed=0)

    h, w = (24, 16) if tiny else (120, 80)
    cond_hw = 8 if tiny else 40
    latents = jnp.zeros((1, 4, h, w), jnp.float32)
    cond_lat_pair = jnp.zeros((2, 4, cond_hw, cond_hw), jnp.float32)
    ehs = jnp.zeros((2, 77, pipe.text_config.hidden_size), jnp.float32)
    depth = jnp.zeros((1, 3, h * 8, w * 8), jnp.float32)
    t = jnp.asarray([500], jnp.int32)
    key = jax.random.PRNGKey(0)

    out = pipe.teacher_v_pred(latents, t, cond_lat_pair, ehs, depth, 10.0,
                              key)
    jax.block_until_ready(out)  # compile

    n_iters = 3 if tiny else 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = pipe.teacher_v_pred(latents, t, cond_lat_pair, ehs, depth,
                                  10.0, key)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters
    steps_per_sec = 1.0 / dt

    print(json.dumps({
        "metric": "zero123plus_teacher_denoise_steps_per_sec_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / A100_REF_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
