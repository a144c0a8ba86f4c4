"""Round benchmark, single chip. Prints exactly ONE JSON line.

Primary metric (tracked across rounds, BASELINE.md headline unit): Zero123++
teacher denoise steps/sec — one SDS teacher evaluation = reference-write UNet
pass (CFG batch 2) + depth ControlNet + CFG-paired main UNet pass with
doubled self-attn KV, real SD2-backbone at the real 3x2 grid latent
(1,4,120,80), bf16.

`extra` carries the wider harness (VERDICT r1 item 8):
  - full_sds_iter_ms: ONE production SDS iteration (student MLP render of the
    960x640 grid + VAE encode fwd/bwd + teacher + adam) via the actual
    ConTEXTure._build_sds_step graph on a procedural sphere;
  - teacher_mfu_pct: XLA-counted FLOPs / wall-clock vs the chip's bf16 peak;
  - volume_rays_per_sec: coarse+fine volume render (models/volume.py).

vs_baseline compares the primary metric against an A100 torch estimate for
the same composite step (~5.5 steps/s: ~60 ms/UNet-fwd at batch 2 x 2 passes
+ ControlNet; the reference publishes no numbers — BASELINE.md documents
this). >1.0 beats it.
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

A100_REF_STEPS_PER_SEC = 5.5
# bf16 peak per chip by device kind (fallback 197 TFLOP/s = v5e)
PEAK_BF16 = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
             "TPU v5p": 459e12, "TPU v6e": 918e12}


def bench_teacher(tiny):
    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline

    pipe = Zero123PlusPipeline(tiny=tiny, dtype=jnp.bfloat16, seed=0)
    h, w = (24, 16) if tiny else (120, 80)
    cond_hw = 8 if tiny else 40
    latents = jnp.zeros((1, 4, h, w), jnp.float32)
    cond_lat_pair = jnp.zeros((2, 4, cond_hw, cond_hw), jnp.float32)
    ehs = jnp.zeros((2, 77, pipe.text_config.hidden_size), jnp.float32)
    depth = jnp.zeros((1, 3, h * 8, w * 8), jnp.float32)
    t = jnp.asarray([500], jnp.int32)
    key = jax.random.PRNGKey(0)

    def f(params, latents, t, cond_lat_pair, ehs, depth):
        return pipe._cfg_v_pred(params, latents, t, cond_lat_pair, ehs,
                                depth, 10.0, key, scale_input=lambda x: x)

    jitted = jax.jit(f)
    args = (pipe.params, latents, t, cond_lat_pair, ehs, depth)
    compiled = jitted.lower(*args).compile()
    try:
        flops = compiled.cost_analysis()["flops"]
    except Exception:
        flops = 0.0
    jax.block_until_ready(jitted(*args))
    n_iters = 3 if tiny else 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_BF16.items() if k in kind), 197e12)
    mfu = 100.0 * flops / dt / peak if flops else 0.0
    return 1.0 / dt, mfu


def bench_full_sds_iter(tiny):
    """One production SDS iteration through the real trainer graph."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from tools.make_shapes import uv_sphere, write_obj

    tmp = Path(tempfile.mkdtemp(prefix="ctn_bench_"))
    sphere = tmp / "sphere.obj"
    write_obj(sphere, *uv_sphere(24, 48))
    cfg = config_from_dict({
        "log": {"exp_name": "bench_sds", "exp_root": str(tmp / "exp"),
                "log_images": False, "save_mesh": False},
        "render": {"train_grid_size": 48 if tiny else 1200},
        "guide": {"text": "bench", "shape_path": str(sphere),
                  "texture_resolution": 16 if tiny else 1024},
        "optim": {"seed": 0, "sds_iterations": 1, "data_parallel": "off"},
    })
    trainer = ConTEXTure(cfg, tiny_models=tiny)
    setup = trainer.prepare_sds(skip_bootstrap=True)
    step, optimizer, hot = trainer._build_sds_step(setup, None)
    params = trainer.texture_params
    opt_state = optimizer.init(params)
    t = jnp.asarray([500], jnp.int32)
    key = jax.random.PRNGKey(0)
    out = step(params, opt_state, t, key, hot)
    jax.block_until_ready(out)  # compile
    n_iters = 2 if tiny else 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        params, opt_state, loss, gn, fi, grid = step(params, opt_state, t,
                                                     key, hot)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / n_iters * 1000.0


def bench_sd2_denoise(tiny):
    """SD2-depth CFG denoise steps/sec at 512^2 (BASELINE.md row 'SD2-depth
    single-view denoise'): one 5-ch UNet forward at CFG batch 2, the unit the
    bootstrap runs 50x of."""
    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.diffusion.sd_depth import StableDiffusionDepth

    sd = StableDiffusionDepth(tiny=tiny, use_inpaint=False,
                              dtype=jnp.bfloat16, seed=0)
    lat_sz = 8 if tiny else 64
    lat = jnp.zeros((2, 5, lat_sz, lat_sz), jnp.float32)
    emb = jnp.zeros((2, 77, sd.unet_config.cross_attention_dim), jnp.float32)
    t = jnp.asarray([500], jnp.int32)

    f = jax.jit(lambda p, x: sd.unet.apply(p, x, t, emb))
    jax.block_until_ready(f(sd.params["unet"], lat))
    n = 3 if tiny else 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(sd.params["unet"], lat)
    jax.block_until_ready(out)
    return n / (time.perf_counter() - t0)


def bench_volume(tiny):
    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.models.volume import volume_render

    R = 1024 if tiny else 65536

    def field(pts):
        d = jnp.linalg.norm(pts, axis=-1)
        sigma = jnp.where(d < 0.5, 50.0, 0.0)
        return jnp.broadcast_to(pts, pts.shape), sigma

    key = jax.random.PRNGKey(0)
    o = jnp.concatenate([jnp.zeros((R, 2)), jnp.full((R, 1), 1.5)], -1)
    d = jnp.concatenate([jnp.zeros((R, 2)), jnp.full((R, 1), -1.0)], -1)
    f = jax.jit(lambda k: volume_render(field, o, d, k, n_coarse=64,
                                        n_fine=64))
    jax.block_until_ready(f(key))
    n = 3 if tiny else 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(key)
    jax.block_until_ready(out["rgb"])
    return R * n / (time.perf_counter() - t0)


def main():
    tiny = bool(os.environ.get("BENCH_TINY"))
    steps_per_sec, mfu = bench_teacher(tiny)
    extra = {"teacher_mfu_pct": round(mfu, 2)}
    try:
        extra["full_sds_iter_ms"] = round(bench_full_sds_iter(tiny), 1)
    except Exception as e:  # never lose the primary metric
        extra["full_sds_iter_ms"] = f"error: {type(e).__name__}: {str(e)[:200]}"
    try:
        extra["volume_rays_per_sec"] = round(bench_volume(tiny))
    except Exception as e:
        extra["volume_rays_per_sec"] = f"error: {type(e).__name__}: {str(e)[:200]}"
    try:
        extra["sd2_denoise_steps_per_sec"] = round(bench_sd2_denoise(tiny), 2)
    except Exception as e:
        extra["sd2_denoise_steps_per_sec"] = f"error: {type(e).__name__}: {str(e)[:200]}"

    print(json.dumps({
        "metric": "zero123plus_teacher_denoise_steps_per_sec_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / A100_REF_STEPS_PER_SEC, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
