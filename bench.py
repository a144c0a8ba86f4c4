"""Round benchmark, single chip. Prints the result JSON line TWICE: once the
moment the primary metric exists (unlosable even if the driver's timeout
kills the extras), and once enriched at the end — the driver parses the last
JSON line in stdout. A global wall-clock budget (CTN_BENCH_DEADLINE_S,
default 2100 s) gates every extra; expired extras are recorded as
"skipped: bench deadline" instead of running past the deadline (VERDICT r3
#1: round 3 shipped rc=124/parsed:null). The measured-negative int8 variants
run only under BENCH_INT8=1.

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
    actual ConTEXTure._build_sds_step graph on a procedural sphere, at the
    r5 DEFAULTS (local_sds_grad + precompute_uv_embedding on, quality
    artifact docs/knob_quality_r5.json); full_sds_iter_parity_ms is the
    reference-exact-gradient path (both knobs off — the r4 headline number),
    full_sds_iter_local_grad_ms / full_sds_iter_emb_ms the single knobs;
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

# Global wall-clock budget (VERDICT r3 #1: BENCH_r03.json died rc=124 with
# parsed:null after ~27 min of full-tower compiles — a bench that can miss
# its deadline silently is a broken bench). Every optional extra checks
# budget_left_s() first; on expiry it is recorded as "skipped: ..." and the
# already-measured numbers still ship. The primary metric is additionally
# printed (flushed) the moment it exists, so even a hard kill mid-extras
# leaves a parseable JSON line in the driver's stdout tail.
_T0 = time.monotonic()


def budget_left_s():
    deadline = float(os.environ.get("CTN_BENCH_DEADLINE_S", "2100"))
    return deadline - (time.monotonic() - _T0)


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

    # Knob variants of the same step, each budget-gated (a full-size
    # compile through the tunnel costs minutes; on deadline expiry the
    # remaining variants are recorded as skipped, not lost). Since r5 the
    # DEFAULT config has local_sds_grad + precompute_uv_embedding ON
    # (quality artifact: docs/knob_quality_r5.json), so the headline
    # full_sds_iter_ms above is the fast path and the tracked variants are:
    #   parity — both knobs OFF: the reference-exact-gradient path (the r4
    #            headline; r4 measured 288.7 ms vs 176.3 best-knobs);
    #   local  — local_sds_grad only;
    #   emb    — precompute_uv_embedding only (bit-identical;
    #            tests/test_mlp_kernel.py + knob_quality PSNR inf).
    _dflt = (trainer.cfg.optim.local_sds_grad,
             trainer.cfg.optim.precompute_uv_embedding)

    def _measure_variant(local_grad, precompute_emb):
        trainer.cfg.optim.local_sds_grad = local_grad
        trainer.cfg.optim.precompute_uv_embedding = precompute_emb
        try:
            setup_v = (setup if (local_grad, precompute_emb) == _dflt
                       else trainer.prepare_sds(skip_bootstrap=True))
            if precompute_emb and setup_v.get("emb_pts") is None:
                return None  # kernel ineligible (non-TPU / non-8x256 MLP)
            step_v, opt_v, hot_v = trainer._build_sds_step(setup_v, None)
            opt_state_v = opt_v.init(params)
            jax.block_until_ready(step_v(params, opt_state_v, t, key, hot_v))
            st = {"p": params, "o": opt_state_v}

            def one_v():
                st["p"], st["o"], loss, gn, fi, grid = step_v(
                    st["p"], st["o"], t, key, hot_v)
                return loss

            samples_v = _timed_windows(one_v, jax.block_until_ready,
                                       n_iters, reps)
            med, _ = _median_iqr_ms(samples_v)
            return med
        except Exception as e:
            return f"error: {type(e).__name__}: {str(e)[:200]}"
        finally:
            trainer.cfg.optim.local_sds_grad = _dflt[0]
            trainer.cfg.optim.precompute_uv_embedding = _dflt[1]

    # (b) e2e slice FIRST (it is the artifact the projections need; knob
    # variants each cost a multi-minute re-trace on this 1-core host and
    # used to push the e2e past the deadline): full paint() = bootstrap ->
    # SDS loop -> eval -> video. Phases come from the profiler with compile
    # separated from steady state.
    if budget_left_s() < 600:
        e2e = {"error": "skipped: bench deadline"}
    else:
        profiler.GLOBAL_TIMINGS = profiler.Timings()
        t0 = time.perf_counter()
        trainer.paint()
        wall_s = time.perf_counter() - t0
        phases = profiler.GLOBAL_TIMINGS.summary()
        e2e = {"wall_s": round(wall_s, 1),
               "sds_iters": cfg.optim.sds_iterations,
               "eval_poses": cfg.log.full_eval_size,
               "phases": phases}

    variant_ms = {}
    for name, local_grad, precompute_emb in (
            ("parity", False, False), ("local", True, False),
            ("emb", False, True)):
        # a cold full-size variant costs a multi-minute compile through the
        # tunnel — gate on a realistic worst case, not a token margin
        if budget_left_s() < 300:
            variant_ms[name] = "skipped: bench deadline"
            continue
        v = _measure_variant(local_grad, precompute_emb)
        if isinstance(v, float) and v < 0.25 * iter_ms:
            # the tunnel intermittently stops blocking on results
            # (docs/PERF.md r5 methodology note) — a knob variant reading
            # far BELOW the default iter is physically impossible; retry
            # once and flag rather than report garbage
            v2 = _measure_variant(local_grad, precompute_emb)
            v = (v2 if isinstance(v2, float) and v2 >= 0.25 * iter_ms
                 else f"implausible: {v} ms (async-dispatch tunnel state)")
        variant_ms[name] = v
    return (iter_ms, iter_iqr, variant_ms), e2e


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


def prev_round_parsed():
    """Newest BENCH_r*.json parsed artifact (None if none parse)."""
    best = None
    for p in glob.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json", p)
        if not m:
            continue
        try:
            parsed = json.load(open(p)).get("parsed") or {}
        except Exception:
            continue
        if parsed.get("value") is not None and (
                best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), parsed)
    return best[1] if best else None


def prev_round_value():
    """Newest BENCH_r*.json primary value, for vs_prev_round."""
    parsed = prev_round_parsed()
    return float(parsed["value"]) if parsed else None


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


def project_full_run(e2e, iter_ms):
    """Projected wall-clock of the reference-scale run (5,000 SDS iters +
    100-pose eval) from the measured slice: bootstrap total + sds compile
    (first call) + steady iter rate x 5000 + measured per-pose eval x 100.
    The steady rate is the device-inclusive microbench `full_sds_iter_ms`
    (the slice's own steady_mean_ms is dispatch-only). Provenance of the
    comparison target lives in docs/PERF.md (the reference publishes no
    numbers; BASELINE.md targets <=0.5x an A100-class estimate)."""
    try:
        ph = e2e["phases"]
        boot_s = ph["bootstrap"]["total_s"]
        compile_s = ph["sds_step"]["first_call_s"]
        # steady per-pose rate: trainer.evaluate notes a sync-to-sync
        # window that EXCLUDES the one-time eval-render compile (charging
        # first_call/poses would count the compile ~20x at 100 poses);
        # fall back to the total only if the window is absent
        if ph["eval"].get("window_iter_ms"):
            eval_per_pose_s = ph["eval"]["window_iter_ms"] / 1000.0
        else:
            eval_per_pose_s = ph["eval"]["total_s"] / e2e["eval_poses"]
        proj = (boot_s + compile_s + 5000 * iter_ms / 1000.0
                + 100 * eval_per_pose_s)
        return {
            "projected_full_run_s": round(proj, 1),
            "formula": "bootstrap + sds_compile + 5000*iter_ms + 100*eval_pose",
            "inputs": {"bootstrap_s": round(boot_s, 1),
                       "sds_compile_s": round(compile_s, 1),
                       "steady_iter_ms": round(iter_ms, 1),
                       "eval_per_pose_s": round(eval_per_pose_s, 2)},
        }
    except Exception as e:
        return {"error": f"{type(e).__name__}: {str(e)[:120]}"}


def main():
    tiny = bool(os.environ.get("BENCH_TINY"))
    _enable_compile_cache()
    if not backend_reachable():
        print(json.dumps({
            "metric": "zero123plus_teacher_denoise_steps_per_sec_chip",
            "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
            "extra": {"error": "tpu_tunnel_unreachable: device discovery "
                               "timed out; no measurement possible"}}),
            flush=True)
        return
    steps_per_sec, teacher_iqr_ms, mfu = bench_teacher(tiny)
    extra = {"teacher_mfu_pct": round(mfu, 2),
             "teacher_iqr_ms": round(teacher_iqr_ms, 2)}
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
    # Emit the primary metric NOW: if any later extra stalls past the
    # driver's timeout, this line is still in the stdout tail and parses.
    # The enriched line printed at the end supersedes it (the driver takes
    # the last JSON line).
    print(json.dumps(out), flush=True)

    if os.environ.get("BENCH_INT8"):
        # int8 variants are settled science (measured NEGATIVE on this
        # workload, docs/PERF.md) — two full-size compiles not worth the
        # default budget; opt back in with BENCH_INT8=1.
        import gc

        for label, kw in (("cn", {"int8": True}), ("full", {"int8_full": True})):
            if budget_left_s() < 120:
                extra[f"teacher_int8_{label}_steps_per_sec"] = \
                    "skipped: bench deadline"
                continue
            try:
                gc.collect()
                sps, iqr, _ = bench_teacher(tiny, **kw)
                extra[f"teacher_int8_{label}_steps_per_sec"] = round(sps, 3)
                extra[f"teacher_int8_{label}_iqr_ms"] = round(iqr, 2)
                gc.collect()
            except Exception as e:
                extra[f"teacher_int8_{label}_steps_per_sec"] = \
                    f"error: {type(e).__name__}: {str(e)[:200]}"

    if budget_left_s() < 240:
        extra["full_sds_iter_ms"] = "skipped: bench deadline"
    else:
        try:
            import gc

            # the teacher pipeline is cycle-referenced (jit cache closures
            # over self) — collect BEFORE building the second full tower
            # set or both stay resident in the 16 GB HBM
            gc.collect()
            (iter_ms, iter_iqr, variant_ms), e2e = bench_trainer(tiny)
            extra["full_sds_iter_ms"] = round(iter_ms, 1)
            extra["full_sds_iter_iqr_ms"] = round(iter_iqr, 2)
            for name, key in (("parity", "full_sds_iter_parity_ms"),
                              ("local", "full_sds_iter_local_grad_ms"),
                              ("emb", "full_sds_iter_emb_ms")):
                v = variant_ms.get(name)
                extra[key] = round(v, 1) if isinstance(v, float) else v
            extra["e2e_slice"] = e2e
            if "phases" in e2e:
                parity = variant_ms.get("parity")
                e2e["projection_default"] = project_full_run(e2e, iter_ms)
                e2e["projection_parity_knobs"] = project_full_run(
                    e2e, parity if isinstance(parity, float) else iter_ms)
                # round-over-round tracking for the secondary rates
                # (VERDICT r4 weak #5/#6: eval + bootstrap were untracked);
                # vs_prev < 1.0 means slower than last round — flag > 10%
                prev = prev_round_parsed() or {}
                prev_e2e = (prev.get("extra") or {}).get("e2e_slice") or {}
                prev_ph = prev_e2e.get("phases") or {}
                track = {}
                ph = e2e["phases"]
                ew = (ph.get("eval") or {}).get("window_iter_ms")
                pew = (prev_ph.get("eval") or {}).get("window_iter_ms")
                if ew and pew:
                    track["eval_window_iter_vs_prev"] = round(pew / ew, 3)
                bs = (ph.get("bootstrap") or {}).get("total_s")
                pbs = (prev_ph.get("bootstrap") or {}).get("total_s")
                if bs and pbs:
                    track["bootstrap_vs_prev"] = round(pbs / bs, 3)
                regressed = [k for k, v in track.items() if v < 0.9]
                if regressed:
                    track["regression_alert"] = \
                        ">10% slower than prev round: " + ", ".join(regressed)
                e2e["vs_prev_round"] = track
        except Exception as e:  # never lose the primary metric
            extra["full_sds_iter_ms"] = \
                f"error: {type(e).__name__}: {str(e)[:200]}"

    for key, fn, digits in (("volume_rays_per_sec", bench_volume, 0),
                            ("sd2_denoise_steps_per_sec", bench_sd2_denoise, 2)):
        if budget_left_s() < 60:
            extra[key] = "skipped: bench deadline"
            continue
        try:
            extra[key] = round(fn(tiny), digits) if digits else round(fn(tiny))
        except Exception as e:
            extra[key] = f"error: {type(e).__name__}: {str(e)[:200]}"

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
