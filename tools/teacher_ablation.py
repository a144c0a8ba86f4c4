"""Teacher-step ablation: where do the 97 ms go? (VERDICT r2 'attack MFU').

Measures on the real chip, full-size bf16 stacks, the real 120x80 grid latent:
  total           — the production _cfg_v_pred (write + controlnet + main)
  total_xla_attn  — same with the XLA attention fallback (flash kernel delta)
  write / controlnet / main — the three sub-passes timed standalone
  total_fake_gn   — GroupNorm statistics replaced by scale*x+bias (upper
                    bound on what a fused GroupNorm kernel could recover)

Usage: python tools/teacher_ablation.py [--mode MODE]
Modes run in one process sequentially; each prints one JSON line.
"""

import argparse
import functools
import json
import os
import sys

# runnable as `python tools/teacher_ablation.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")


def _enable_compile_cache():
    # same persistent cache as bench.py/the CLI — each ablation variant
    # compiles the full towers once; cold, that is ~5-10 min of XLA work
    import jax

    cache_dir = os.environ.get("CTN_JAX_CACHE",
                               os.path.expanduser("~/.cache/ctnerf_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_enable_compile_cache()

# same median-of-repeated-windows method as bench.py (shared helper so the
# ablation numbers stay methodologically comparable to the bench's), and
# the canonical GroupNorm dispatch captured before any build() patches it —
# without the restore below, --mode all measured the int8 pipeline with the
# fakegn stand-in still installed (different model than total_ms; r3 review)
from contexture_nerf_tpu.core.timing import median_iqr_ms, timed_windows
from contexture_nerf_tpu.ops.groupnorm import group_norm_silu as _REAL_GN


def timeit(fn, ready, n=20, reps=3):
    return median_iqr_ms(timed_windows(fn, ready, n, reps))[0]


def build(gn="pallas", int8_cn=False, int8_full=False):
    import jax
    import jax.numpy as jnp

    import contexture_nerf_tpu.diffusion.layers as L
    import contexture_nerf_tpu.ops.groupnorm as GN

    if gn == "fake":
        # statistics-free stand-in: keeps the per-channel affine +
        # activation + cast (1 read + 1 write) but drops the stats
        # pass — the upper bound on what ANY GroupNorm implementation
        # could still recover
        def impl(x, scale, bias, groups=32, eps=1e-5, act=True,
                 out_dtype=None):
            y = x.astype(jnp.float32) * scale + bias
            if act:
                y = y * jax.nn.sigmoid(y)
            return y.astype(out_dtype or x.dtype)
    elif gn == "xla":  # let XLA fuse the pure-JAX reference
        impl = GN.group_norm_silu_reference
    else:
        impl = _REAL_GN  # restore: a prior build() may have patched these

    GN.group_norm_silu = impl
    L.group_norm_silu = impl  # layers imported the symbol by value

    from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline

    return Zero123PlusPipeline(tiny=False, dtype=jnp.bfloat16, seed=0,
                               int8_controlnet=int8_cn, int8_unet=int8_full)


def teacher_args(pipe):
    import jax
    import jax.numpy as jnp

    h, w = 120, 80
    return dict(
        latents=jnp.zeros((1, 4, h, w), jnp.float32),
        cond_lat_pair=jnp.zeros((2, 4, 40, 40), jnp.float32),
        ehs=jnp.zeros((2, 77, pipe.text_config.hidden_size), jnp.float32),
        depth=jnp.zeros((1, 3, h * 8, w * 8), jnp.float32),
        t=jnp.asarray([500], jnp.int32),
        key=jax.random.PRNGKey(0),
    )


def bench_total(pipe, use_pallas=None):
    import jax

    if use_pallas is not None:
        import contexture_nerf_tpu.diffusion.layers as L
        from contexture_nerf_tpu.ops import attention as A

        L.attention = functools.partial(A.attention, use_pallas=use_pallas)
    a = teacher_args(pipe)

    emb = pipe.embed_control_cond(pipe.params, a["depth"],
                                  a["latents"].shape[2:])

    def f(params, latents, t, clp, ehs, depth, emb):
        return pipe._cfg_v_pred(params, latents, t, clp, ehs, depth, 10.0,
                                a["key"], scale_input=lambda x: x,
                                cn_cond_emb=emb)

    jitted = jax.jit(f)
    args = (pipe.params, a["latents"], a["t"], a["cond_lat_pair"],
            a["ehs"], a["depth"], emb)
    jax.block_until_ready(jitted(*args))
    return timeit(lambda: jitted(*args), jax.block_until_ready)


def bench_parts(pipe):
    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.diffusion import schedulers as sch

    a = teacher_args(pipe)
    B, nb = 1, 2
    cond_lats = jnp.repeat(a["cond_lat_pair"], B, axis=0)
    ehs = jnp.repeat(a["ehs"], B, axis=0)
    noise = jnp.zeros_like(cond_lats)
    noisy_cond = sch.add_noise(pipe.alphas_cumprod, cond_lats, noise,
                               jnp.broadcast_to(a["t"], (cond_lats.shape[0],)))
    lat_in = jnp.concatenate([a["latents"]] * nb)
    depth_all = jnp.concatenate([a["depth"]] * nb)

    def write(params, noisy_cond, t, ehs):
        ref = []
        pipe.unet.apply(params["unet"], noisy_cond, t, ehs, ref_out=ref)
        return ref

    def cn(params, lat_in, t, ehs, depth_all):
        return pipe.controlnet.apply(params["controlnet"], lat_in, t, ehs,
                                     depth_all, 2.0)

    def main(params, lat_in, t, ehs, noisy_cond, depth_all):
        ref = []
        pipe.unet.apply(params["unet"], noisy_cond, t, ehs, ref_out=ref)
        downs, mid = pipe.controlnet.apply(params["controlnet"], lat_in, t,
                                           ehs, depth_all, 2.0)
        v = pipe.unet.apply(params["unet"], lat_in, t, ehs,
                            down_residuals=downs, mid_residual=mid,
                            ref_kv_list=ref)
        return v

    jw = jax.jit(write)
    jc = jax.jit(cn)
    jm = jax.jit(main)
    out = {}
    jax.block_until_ready(jw(pipe.params, noisy_cond, a["t"], ehs))
    out["write_ms"] = timeit(lambda: jw(pipe.params, noisy_cond, a["t"],
                                        ehs), jax.block_until_ready)
    jax.block_until_ready(jc(pipe.params, lat_in, a["t"], ehs, depth_all))
    out["controlnet_ms"] = timeit(
        lambda: jc(pipe.params, lat_in, a["t"], ehs, depth_all),
        jax.block_until_ready)
    jax.block_until_ready(jm(pipe.params, lat_in, a["t"], ehs, noisy_cond,
                             depth_all))
    out["write_cn_main_ms"] = timeit(
        lambda: jm(pipe.params, lat_in, a["t"], ehs, noisy_cond, depth_all),
        jax.block_until_ready)
    return out


def check_kernel():
    """Compiled-on-chip two-source flash kernel vs XLA reference."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contexture_nerf_tpu.ops.attention import (_xla_attention,
                                                   flash_attention_pallas)

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    q = jax.random.normal(ks[0], (2, 4, 9600, 64), jnp.bfloat16)
    kk = jax.random.normal(ks[1], (2, 4, 9600, 64), jnp.bfloat16)
    v = jax.random.normal(ks[2], (2, 4, 9600, 64), jnp.bfloat16)
    ek = jax.random.normal(ks[3], (2, 4, 9600, 64), jnp.bfloat16)
    ev = jax.random.normal(ks[4], (2, 4, 9600, 64), jnp.bfloat16)
    ref = jax.jit(_xla_attention)(q, jnp.concatenate([kk, ek], 2),
                                  jnp.concatenate([v, ev], 2))
    out = flash_attention_pallas(q, kk, v, ek, ev)
    err = float(jnp.abs(out.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max())
    assert err < 3e-2, f"compiled two-source kernel mismatch: {err}"
    return err


def main():
    import gc

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all",
                    choices=["all", "check", "total", "xla", "parts",
                             "fakegn", "xlagn", "int8", "int8full"])
    args = ap.parse_args()
    res = {}
    if args.mode in ("all", "check"):
        res["kernel_max_abs_err"] = check_kernel()
    if args.mode in ("all", "total", "xla", "parts"):
        pipe = build()
        if args.mode in ("all", "total"):
            res["total_ms"] = bench_total(pipe)
        if args.mode in ("all", "xla"):
            res["total_xla_attn_ms"] = bench_total(pipe, use_pallas=False)
            # restore the real dispatch (partial(attention, use_pallas=None)
            # would NOT be installed by bench_total — its guard skips None)
            import contexture_nerf_tpu.diffusion.layers as L
            from contexture_nerf_tpu.ops import attention as A

            L.attention = A.attention
        if args.mode in ("all", "parts"):
            res.update(bench_parts(pipe))
        del pipe
        gc.collect()
    if args.mode in ("all", "fakegn", "xlagn"):
        gn = "fake" if args.mode in ("all", "fakegn") else "xla"
        pipe = build(gn=gn)
        res[f"total_{gn}_gn_ms"] = bench_total(pipe)
        del pipe
        gc.collect()
    if args.mode in ("all", "int8"):
        # optim.int8_controlnet: heavy ControlNet blocks on the 2x int8 MXU
        pipe = build(int8_cn=True)
        res["total_int8_cn_ms"] = bench_total(pipe)
        del pipe
        gc.collect()
    if args.mode in ("all", "int8full"):
        # optim.int8_teacher: the FULL denoiser on the 2x int8 MXU path
        pipe = build(int8_full=True)
        res["total_int8_full_ms"] = bench_total(pipe)
    print(json.dumps({k: round(v, 4) for k, v in res.items()}))


if __name__ == "__main__":
    main()
