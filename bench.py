"""Round benchmark, single chip. Prints exactly ONE JSON line.

Primary metric (tracked across rounds, BASELINE.md headline unit): Zero123++
teacher denoise steps/sec — one SDS teacher evaluation = reference-write UNet
pass (CFG batch 2) + depth ControlNet + CFG-paired main UNet pass with
doubled self-attn KV, real SD2-backbone at the real 3x2 grid latent
(1,4,120,80), bf16. Reported as the MEDIAN of N>=5 repeated timing windows;
`extra.teacher_iqr_ms` carries the spread so cross-round regressions are
distinguishable from tunnel noise (VERDICT r2 weak #1).

`extra` carries the wider harness:
  - full_sds_iter_ms (+ _iqr): ONE production SDS iteration (student MLP
    render of the 960x640 grid + VAE encode fwd/bwd + teacher + adam) via the
    actual ConTEXTure._build_sds_step graph on a procedural sphere;
    full_sds_iter_local_grad_ms / full_sds_iter_emb_ms are the same step with
    the opt-in optim.local_sds_grad / optim.precompute_uv_embedding knobs;
  - teacher_mfu_pct: XLA-counted FLOPs / wall-clock vs the chip's bf16 peak;
  - e2e_slice: bootstrap + 25 SDS iters + 5-pose eval through trainer.paint()
    as ONE wall-clock measurement (the measured proxy for the BASELINE
    <=0.5x-A100 end-to-end target), with the per-phase compile-vs-steady
    breakdown from the profiler;
  - volume_rays_per_sec, sd2_denoise_steps_per_sec.

vs_baseline compares the primary metric against an A100 torch estimate for
the same composite step (~5.5 steps/s: ~60 ms/UNet-fwd at batch 2 x 2 passes
+ ControlNet; the reference publishes no numbers — BASELINE.md documents
this). >1.0 beats it. vs_prev_round compares against the newest BENCH_r*.json
in the repo root.
"""

import glob
import json
import os
import re
import time

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

from contexture_nerf_tpu.core.timing import (median_iqr_ms as _median_iqr_ms,
                                             timed_windows as _timed_windows)


def _enable_compile_cache():
    """Persistent compile cache (same dir as the CLI's): the bench compiles
    the full towers 4+ times; cached, reruns skip ~10 min of XLA work."""
    import jax

    cache_dir = os.environ.get("CTN_JAX_CACHE",
                               os.path.expanduser("~/.cache/ctnerf_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

A100_REF_STEPS_PER_SEC = 5.5
# bf16 peak per chip by device kind (fallback 197 TFLOP/s = v5e)
PEAK_BF16 = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
             "TPU v5p": 459e12, "TPU v6e": 918e12}


def bench_teacher(tiny, int8=False, int8_full=False):
    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline

    pipe = Zero123PlusPipeline(tiny=tiny, dtype=jnp.bfloat16, seed=0,
                               int8_controlnet=int8, int8_unet=int8_full)
    h, w = (24, 16) if tiny else (120, 80)
    cond_hw = 8 if tiny else 40
    latents = jnp.zeros((1, 4, h, w), jnp.float32)
    cond_lat_pair = jnp.zeros((2, 4, cond_hw, cond_hw), jnp.float32)
    ehs = jnp.zeros((2, 77, pipe.text_config.hidden_size), jnp.float32)
    depth = jnp.zeros((1, 3, h * 8, w * 8), jnp.float32)
    t = jnp.asarray([500], jnp.int32)
    key = jax.random.PRNGKey(0)

    # the trainer hoists the loop-invariant ControlNet hint embedding out of
    # the hot loop (trainer._build_sds_step); the bench measures the same
    # production composition
    emb = pipe.embed_control_cond(pipe.params, depth, (h, w))

    def f(params, latents, t, cond_lat_pair, ehs, depth, emb):
        return pipe._cfg_v_pred(params, latents, t, cond_lat_pair, ehs,
                                depth, 10.0, key, scale_input=lambda x: x,
                                cn_cond_emb=emb)

    jitted = jax.jit(f)
    args = (pipe.params, latents, t, cond_lat_pair, ehs, depth, emb)
    compiled = jitted.lower(*args).compile()
    try:
        flops = compiled.cost_analysis()["flops"]
    except Exception:
        flops = 0.0
    jax.block_until_ready(jitted(*args))
    n_iters, reps = (3, 2) if tiny else (20, 5)
    samples = _timed_windows(lambda: jitted(*args), jax.block_until_ready,
                             n_iters, reps)
    med_ms, iqr_ms = _median_iqr_ms(samples)
    dt = med_ms / 1000.0

    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_BF16.items() if k in kind), 197e12)
    mfu = 100.0 * flops / dt / peak if flops else 0.0
    return 1.0 / dt, iqr_ms, mfu


def bench_trainer(tiny):
    """Shared full-size trainer: (a) single-SDS-iteration microbench through
    the production step graph, (b) the bootstrap+25-iter+5-pose-eval
    end-to-end slice via trainer.paint()."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.core import profiler
    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from tools.make_shapes import uv_sphere, write_obj

    tmp = Path(tempfile.mkdtemp(prefix="ctn_bench_"))
    sphere = tmp / "sphere.obj"
    write_obj(sphere, *uv_sphere(24, 48))
    cfg = config_from_dict({
        "log": {"exp_name": "bench_sds", "exp_root": str(tmp / "exp"),
                "log_images": False, "save_mesh": False,
                "eval_size": 2, "full_eval_size": 5},
        "render": {"train_grid_size": 48 if tiny else 1200},
        "guide": {"text": "bench", "shape_path": str(sphere),
                  "texture_resolution": 16 if tiny else 1024},
        "optim": {"seed": 0, "sds_iterations": 2 if tiny else 25,
                  "checkpoint_interval": 10 ** 9, "data_parallel": "off"},
    })
    trainer = ConTEXTure(cfg, tiny_models=tiny)

    # (a) microbench: the exact per-iteration graph
    setup = trainer.prepare_sds(skip_bootstrap=True)
    step, optimizer, hot = trainer._build_sds_step(setup, None)
    params = trainer.texture_params
    opt_state = optimizer.init(params)
    t = jnp.asarray([500], jnp.int32)
    key = jax.random.PRNGKey(0)
    jax.block_until_ready(step(params, opt_state, t, key, hot))  # compile

    state = {"params": params, "opt_state": opt_state}

    def one():
        state["params"], state["opt_state"], loss, gn, fi, grid = step(
            state["params"], state["opt_state"], t, key, hot)
        return loss

    n_iters, reps = (2, 2) if tiny else (20, 5)
    samples = _timed_windows(one, jax.block_until_ready, n_iters, reps)
    iter_ms, iter_iqr = _median_iqr_ms(samples)

    # (a2) tile-local backward (optim.local_sds_grad): identical forward,
    # gradient restricted to a margin-padded slice around the sampled tile
    local_ms = None
    try:
        trainer.cfg.optim.local_sds_grad = True
        step_l, opt_l, hot_l = trainer._build_sds_step(setup, None)
        opt_state_l = opt_l.init(params)
        jax.block_until_ready(step_l(params, opt_state_l, t, key, hot_l))
        st = {"p": params, "o": opt_state_l}

        def one_local():
            st["p"], st["o"], loss, gn, fi, grid = step_l(
                st["p"], st["o"], t, key, hot_l)
            return loss

        samples_l = _timed_windows(one_local, jax.block_until_ready,
                                   n_iters, reps)
        local_ms, _ = _median_iqr_ms(samples_l)
    except Exception as e:
        local_ms = f"error: {type(e).__name__}: {str(e)[:200]}"
    finally:
        trainer.cfg.optim.local_sds_grad = False

    # (a3) precomputed bf16 Fourier embedding (optim.precompute_uv_embedding):
    # same gradients (the kernel casts the embedding to its compute dtype at
    # every MXU use, so bf16 pre-rounding is bit-identical under the bf16
    # default — tests/test_mlp_kernel.py), skips the ~25M sin/cos per iter
    # in fwd AND bwd. ~157 MB extra HBM; None when the kernel is ineligible
    # (non-TPU backend or a non-8x256 MLP).
    emb_ms = None
    try:
        trainer.cfg.optim.precompute_uv_embedding = True
        setup_e = trainer.prepare_sds(skip_bootstrap=True)
        if setup_e["emb_pts"] is not None:
            step_e, opt_e, hot_e = trainer._build_sds_step(setup_e, None)
            opt_state_e = opt_e.init(params)
            jax.block_until_ready(step_e(params, opt_state_e, t, key, hot_e))
            st_e = {"p": params, "o": opt_state_e}

            def one_emb():
                st_e["p"], st_e["o"], loss, gn, fi, grid = step_e(
                    st_e["p"], st_e["o"], t, key, hot_e)
                return loss

            samples_e = _timed_windows(one_emb, jax.block_until_ready,
                                       n_iters, reps)
            emb_ms, _ = _median_iqr_ms(samples_e)
            del setup_e, step_e, hot_e, opt_state_e, st_e  # free the HBM
    except Exception as e:
        emb_ms = f"error: {type(e).__name__}: {str(e)[:200]}"
    finally:
        trainer.cfg.optim.precompute_uv_embedding = False

    # (a4) both knobs: precomputed embedding feeds the full-canvas forward
    # AND the tile-local differentiable patch (docs/PERF.md: 173.7 vs 284.7
    # ms on chip, -39%)
    both_ms = None
    try:
        trainer.cfg.optim.precompute_uv_embedding = True
        trainer.cfg.optim.local_sds_grad = True
        setup_b = trainer.prepare_sds(skip_bootstrap=True)
        if setup_b["emb_pts"] is not None:
            step_b, opt_b, hot_b = trainer._build_sds_step(setup_b, None)
            opt_state_b = opt_b.init(params)
            jax.block_until_ready(step_b(params, opt_state_b, t, key, hot_b))
            st_b = {"p": params, "o": opt_state_b}

            def one_both():
                st_b["p"], st_b["o"], loss, gn, fi, grid = step_b(
                    st_b["p"], st_b["o"], t, key, hot_b)
                return loss

            samples_b = _timed_windows(one_both, jax.block_until_ready,
                                       n_iters, reps)
            both_ms, _ = _median_iqr_ms(samples_b)
            del setup_b, step_b, hot_b, opt_state_b, st_b
    except Exception as e:
        both_ms = f"error: {type(e).__name__}: {str(e)[:200]}"
    finally:
        trainer.cfg.optim.precompute_uv_embedding = False
        trainer.cfg.optim.local_sds_grad = False

    # (b) e2e slice: full paint() = bootstrap -> SDS loop -> eval -> video.
    # Phases come from the profiler with compile separated from steady state.
    profiler.GLOBAL_TIMINGS = profiler.Timings()
    t0 = time.perf_counter()
    trainer.paint()
    wall_s = time.perf_counter() - t0
    phases = profiler.GLOBAL_TIMINGS.summary()
    e2e = {"wall_s": round(wall_s, 1),
           "sds_iters": cfg.optim.sds_iterations,
           "eval_poses": cfg.log.full_eval_size,
           "phases": phases}
    return (iter_ms, iter_iqr, local_ms, emb_ms, both_ms), e2e


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
    n, reps = (3, 2) if tiny else (30, 3)
    samples = _timed_windows(lambda: f(sd.params["unet"], lat),
                             jax.block_until_ready, n, reps)
    med_ms, _ = _median_iqr_ms(samples)
    return 1000.0 / med_ms


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
    n, reps = (3, 1) if tiny else (10, 3)
    samples = _timed_windows(lambda: f(key),
                             lambda r: jax.block_until_ready(r["rgb"]),
                             n, reps)
    med_ms, _ = _median_iqr_ms(samples)
    return R / (med_ms / 1000.0)


def prev_round_value():
    """Newest BENCH_r*.json primary value, for vs_prev_round."""
    best = None
    for p in glob.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json", p)
        if not m:
            continue
        try:
            parsed = json.load(open(p)).get("parsed") or {}
            v = parsed.get("value")
        except Exception:
            continue
        if v is not None and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), float(v))
    return best[1] if best else None


def backend_reachable(timeout_s=180):
    """Probe device discovery in a subprocess: behind the axon tunnel,
    jax.devices() BLOCKS indefinitely when the tunnel is down (observed r3),
    which would leave the round with no bench artifact at all. A dead probe
    downgrades to an explicit error JSON instead."""
    import subprocess
    import sys

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # no tunnel in play; local backends don't hang
    try:
        # pin the probe to the axon platform: an inherited JAX_PLATFORMS
        # (e.g. cpu in the test suite) would otherwise "succeed" without
        # ever touching the tunnel this watchdog exists to check
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms', 'axon'); "
             "jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    tiny = bool(os.environ.get("BENCH_TINY"))
    _enable_compile_cache()
    if not backend_reachable():
        print(json.dumps({
            "metric": "zero123plus_teacher_denoise_steps_per_sec_chip",
            "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
            "extra": {"error": "tpu_tunnel_unreachable: device discovery "
                               "timed out; no measurement possible"}}))
        return
    steps_per_sec, teacher_iqr_ms, mfu = bench_teacher(tiny)
    extra = {"teacher_mfu_pct": round(mfu, 2),
             "teacher_iqr_ms": round(teacher_iqr_ms, 2)}
    try:
        import gc

        gc.collect()  # drop the exact-teacher pipeline's HBM first
        int8_sps, int8_iqr, _ = bench_teacher(tiny, int8=True)
        extra["teacher_int8_cn_steps_per_sec"] = round(int8_sps, 3)
        extra["teacher_int8_cn_iqr_ms"] = round(int8_iqr, 2)
        gc.collect()
    except Exception as e:
        extra["teacher_int8_cn_steps_per_sec"] = \
            f"error: {type(e).__name__}: {str(e)[:200]}"
    try:
        import gc

        gc.collect()
        # optim.int8_teacher: the FULL denoiser on the MXU's 2x int8 path
        full_sps, full_iqr, _ = bench_teacher(tiny, int8_full=True)
        extra["teacher_int8_full_steps_per_sec"] = round(full_sps, 3)
        extra["teacher_int8_full_iqr_ms"] = round(full_iqr, 2)
        gc.collect()
    except Exception as e:
        extra["teacher_int8_full_steps_per_sec"] = \
            f"error: {type(e).__name__}: {str(e)[:200]}"
    try:
        (iter_ms, iter_iqr, local_ms, emb_ms, both_ms), e2e = \
            bench_trainer(tiny)
        extra["full_sds_iter_ms"] = round(iter_ms, 1)
        extra["full_sds_iter_iqr_ms"] = round(iter_iqr, 2)
        extra["full_sds_iter_local_grad_ms"] = (
            round(local_ms, 1) if isinstance(local_ms, float) else local_ms)
        extra["full_sds_iter_emb_ms"] = (
            round(emb_ms, 1) if isinstance(emb_ms, float) else emb_ms)
        extra["full_sds_iter_emb_local_ms"] = (
            round(both_ms, 1) if isinstance(both_ms, float) else both_ms)
        extra["e2e_slice"] = e2e
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

    out = {
        "metric": "zero123plus_teacher_denoise_steps_per_sec_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / A100_REF_STEPS_PER_SEC, 3),
        "extra": extra,
    }
    prev = prev_round_value()
    if prev:
        out["vs_prev_round"] = round(steps_per_sec / prev, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
