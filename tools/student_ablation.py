"""Student-side SDS ablation: where do the non-teacher ~180 ms go?

The full production SDS iteration measures ~284 ms (BENCH_r02
extra.full_sds_iter_ms) while the teacher alone is ~102 ms — this tool
splits the remainder on the real chip, full-size bf16 stacks, through the
same graph pieces trainer._build_sds_step composes (trainer.py:646-753):

  full_step_ms        — the production sds_step (reference point)
  student_grad_ms     — fwd+bwd of the student MLP query at the 960x640
                        grid UVs (the differentiable render half)
  vae_encode_fwd_ms   — VAE encode_moments forward of the grid
  vae_vjp_ms          — the VJP (backward only) of VAE encode wrt the grid
  student_vae_grad_ms — fwd+bwd of the fused student->VAE-encode chain,
                        i.e. everything in loss_fn except the teacher

Usage: python tools/student_ablation.py [--mode all|parts|full]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

# runnable as `python tools/student_ablation.py` from the repo root
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

from contexture_nerf_tpu.core.timing import median_iqr_ms, timed_windows


def timeit(fn, ready, n=10, reps=3):
    return median_iqr_ms(timed_windows(fn, ready, n, reps))[0]


def build_trainer(optim_overrides=None):
    import jax

    cache_dir = os.environ.get("CTN_JAX_CACHE",
                               os.path.expanduser("~/.cache/ctnerf_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from tools.make_shapes import uv_sphere, write_obj

    tmp = Path(tempfile.mkdtemp(prefix="ctn_ablate_"))
    sphere = tmp / "sphere.obj"
    write_obj(sphere, *uv_sphere(24, 48))
    optim = {"seed": 0, "sds_iterations": 1,
             "checkpoint_interval": 10 ** 9, "data_parallel": "off"}
    optim.update(optim_overrides or {})
    cfg = config_from_dict({
        "log": {"exp_name": "ablate", "exp_root": str(tmp / "exp"),
                "log_images": False, "save_mesh": False,
                "eval_size": 1, "full_eval_size": 1},
        "render": {"train_grid_size": 1200},
        "guide": {"text": "ablate", "shape_path": str(sphere),
                  "texture_resolution": 1024},
        "optim": optim,
    })
    return ConTEXTure(cfg, tiny_models=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="all",
                    choices=["all", "parts", "full", "emb", "emb_local"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.diffusion.vae import sample_gaussian
    from contexture_nerf_tpu.training.trainer import scale_image, scale_latents

    # --mode emb: the production step with optim.precompute_uv_embedding —
    # the ~157 MB bf16-stored Fourier embedding + fused_nerf2d_emb kernel
    # (r2 measured the f32 variant at ~314 MB tipping the tunnel into
    # RESOURCE_EXHAUSTED; this mode is the real-chip check that bf16
    # storage fits and measures the per-iter saving vs full_step_ms).
    # --mode emb_local: both opt-in knobs together — the full-canvas
    # forward AND the differentiable patch go through the precomputed
    # embedding while the backward stays tile-local.
    overrides = None
    if args.mode == "emb":
        overrides = {"precompute_uv_embedding": True}
    elif args.mode == "emb_local":
        overrides = {"precompute_uv_embedding": True,
                     "local_sds_grad": True}
    trainer = build_trainer(overrides)
    setup = trainer.prepare_sds(skip_bootstrap=True)
    params = trainer.texture_params
    zp = trainer.zero123plus
    vae = zp.vae
    mesh_model = trainer.mesh_model
    key = jax.random.PRNGKey(0)
    res = {}

    tp = trainer.tile_px
    grid_hw = (3 * tp, 2 * tp)
    uv_pts = setup["uv_grid_pts"]
    mask_grid = setup["mask_grid"]

    def student_rgb(p):
        rgb = mesh_model.query_texture_at_uv(p, uv_pts, allow_fused=True,
                                             compute_dtype=zp.dtype)
        grid = jnp.transpose(rgb.reshape(grid_hw[0], grid_hw[1], 3),
                             (2, 0, 1))[None]
        grid = jnp.clip(grid * mask_grid + 0.5 * (1 - mask_grid), 0.0, 1.0)
        return scale_image(grid * 2 - 1)

    def encode(grid, k):
        mean, logvar = vae.apply(zp.params["vae"], grid,
                                 method=vae.encode_moments)
        z = sample_gaussian(mean, logvar, k) * zp.vae_config.scaling_factor
        return scale_latents(z)

    if args.mode in ("all", "parts"):
        # student MLP query fwd+bwd alone (surrogate sum-loss)
        g_student = jax.jit(jax.grad(lambda p: jnp.sum(student_rgb(p))))
        jax.block_until_ready(g_student(params))
        res["student_grad_ms"] = timeit(lambda: g_student(params),
                                        jax.block_until_ready)

        grid_const = jax.jit(student_rgb)(params)
        jax.block_until_ready(grid_const)

        # VAE encode forward
        f_enc = jax.jit(lambda g: encode(g, key))
        jax.block_until_ready(f_enc(grid_const))
        res["vae_encode_fwd_ms"] = timeit(lambda: f_enc(grid_const),
                                          jax.block_until_ready)

        # VAE encode VJP (backward half only, cotangent of ones)
        def vjp_only(g):
            z, pull = jax.vjp(lambda gg: encode(gg, key), g)
            return pull(jnp.ones_like(z))[0]

        j_vjp = jax.jit(jax.grad(lambda g: jnp.sum(encode(g, key))))
        jax.block_until_ready(j_vjp(grid_const))
        res["vae_grad_ms"] = timeit(lambda: j_vjp(grid_const),
                                    jax.block_until_ready)

        # fused student -> VAE chain fwd+bwd (= loss_fn minus the teacher)
        g_chain = jax.jit(
            jax.grad(lambda p: jnp.sum(encode(student_rgb(p), key))))
        jax.block_until_ready(g_chain(params))
        res["student_vae_grad_ms"] = timeit(lambda: g_chain(params),
                                            jax.block_until_ready)

    if args.mode in ("all", "full", "emb", "emb_local"):
        import optax

        step, optimizer, hot = trainer._build_sds_step(setup, None)
        opt_state = optimizer.init(params)
        t = jnp.asarray([500], jnp.int32)
        out = step(params, opt_state, t, key, hot)
        jax.block_until_ready(out[2])
        name = {"emb": "full_step_emb_ms",
                "emb_local": "full_step_emb_local_ms"}.get(
                    args.mode, "full_step_ms")
        if args.mode in ("emb", "emb_local"):
            assert hot["emb_pts"] is not None, \
                "precompute_uv_embedding did not engage (kernel ineligible?)"
        res[name] = timeit(
            lambda: step(params, opt_state, t, key, hot),
            lambda o: jax.block_until_ready(o[2]))

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
