"""Diagnose per-iteration overhead of the paint() SDS loop vs the raw step.

The r3 windowed profiler exposed a gap: at the spot_quick_test config the
device-inclusive loop rate is ~480 ms/iter (no image logging) while the
bench-style microbench of the same step graph suggests far less. This tool
measures, on the real chip, N-iteration windows of:

  raw        — dispatch step(params, opt_state, t, key, hot) N times with
               constant t/key, block once at the end (bench's pattern)
  hostops    — same, plus the paint loop's per-iteration host work:
               jax.random.split of a host-resident key and
               jnp.asarray(int(t_schedule[i])) (a fresh 4-byte h2d transfer
               per iteration through the axon tunnel)
  paintlike  — hostops + the profiler phase context manager per iteration
  sync50     — hostops + float(loss) every 50 iters (the metric cadence)

Usage: python tools/loop_overhead.py [--iters 50] [--reps 2]
Prints one JSON line of per-iteration milliseconds.
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")


def build_trainer():
    import jax

    cache_dir = os.environ.get("CTN_JAX_CACHE",
                               os.path.expanduser("~/.cache/ctnerf_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from tools.make_shapes import uv_sphere, write_obj

    tmp = Path(tempfile.mkdtemp(prefix="ctn_loopov_"))
    sphere = tmp / "sphere.obj"
    write_obj(sphere, *uv_sphere(24, 48))
    cfg = config_from_dict({
        "log": {"exp_name": "loopov", "exp_root": str(tmp / "exp"),
                "log_images": False, "save_mesh": False,
                "eval_size": 1, "full_eval_size": 1},
        "render": {"train_grid_size": 256, "eval_grid_size": 256},
        "guide": {"text": "loopov", "shape_path": str(sphere),
                  "texture_resolution": 256},
        "optim": {"seed": 0, "sds_iterations": 1,
                  "checkpoint_interval": 10 ** 9, "data_parallel": "off"},
    })
    return ConTEXTure(cfg, tiny_models=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from contexture_nerf_tpu.core import profiler

    trainer = build_trainer()
    setup = trainer.prepare_sds(skip_bootstrap=True)
    step, optimizer, hot = trainer._build_sds_step(setup, None)
    params = trainer.texture_params
    opt_state = optimizer.init(params)
    t_const = jnp.asarray([500], jnp.int32)
    key_const = jax.random.PRNGKey(0)
    jax.block_until_ready(step(params, opt_state, t_const, key_const, hot))

    t_schedule_np = np.full(args.iters, 500, np.int64)
    res = {}

    def window(body):
        best = None
        for _ in range(args.reps):
            st = {"p": params, "o": opt_state, "key": jax.random.PRNGKey(1)}
            t0 = time.perf_counter()
            loss = body(st)
            jax.block_until_ready(loss)
            dt = (time.perf_counter() - t0) / args.iters * 1000
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    def raw(st):
        for _ in range(args.iters):
            st["p"], st["o"], loss, gn, fi, grid = step(
                st["p"], st["o"], t_const, key_const, hot)
        return loss

    res["raw_ms"] = window(raw)

    def hostops(st):
        for i in range(args.iters):
            st["key"], sub = jax.random.split(st["key"])
            t = jnp.asarray([int(t_schedule_np[i])], jnp.int32)
            st["p"], st["o"], loss, gn, fi, grid = step(
                st["p"], st["o"], t, sub, hot)
        return loss

    res["hostops_ms"] = window(hostops)

    def paintlike(st):
        for i in range(args.iters):
            st["key"], sub = jax.random.split(st["key"])
            t = jnp.asarray([int(t_schedule_np[i])], jnp.int32)
            with profiler.phase("loopov"):
                st["p"], st["o"], loss, gn, fi, grid = step(
                    st["p"], st["o"], t, sub, hot)
        return loss

    res["paintlike_ms"] = window(paintlike)

    def sync50(st):
        for i in range(args.iters):
            st["key"], sub = jax.random.split(st["key"])
            t = jnp.asarray([int(t_schedule_np[i])], jnp.int32)
            st["p"], st["o"], loss, gn, fi, grid = step(
                st["p"], st["o"], t, sub, hot)
            if i % 50 == 0:
                float(loss)
        return loss

    res["sync50_ms"] = window(sync50)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
