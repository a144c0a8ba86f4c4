"""Pre-populate the persistent XLA compile cache for a run config.

The CLI's first run pays the full-tower compile bill through the tunnel —
measured on chip: ~148 s for the 50-step SD2 bootstrap scan and ~150 s for
the jitted SDS step (docs/PERF.md, BENCH e2e phases). Those compiles are
one-time PER GRAPH SHAPE thanks to the persistent compile cache
(`~/.cache/ctnerf_jax`, shared with scripts/run_contexture.py and
bench.py): this tool triggers every hot compile for a given config WITHOUT
running the pipeline, so a production fleet can warm caches (or bake a
cache image) before scheduling real paint jobs. Verify re-runs measured
the bootstrap alone at 148-194 s cold vs 40-98 s warm (the residual is
executable deserialization + upload through the tunnel).

Graphs compiled: the 50-step img2img bootstrap (diffusion/sd_depth.py),
the production SDS step (trainer._build_sds_step, including any
data/tensor/sequence-parallel mesh the config requests), and the
eval/turntable render. Compilation uses `.lower().compile()` — no step is
executed and no output is produced.

Usage:  python tools/warmup_cache.py --config_path=configs/text_guided/nascar.yaml [overrides...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    import jax

    cache_dir = os.environ.get("CTN_JAX_CACHE",
                               os.path.expanduser("~/.cache/ctnerf_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from contexture_nerf_tpu.core.config import load_config
    from contexture_nerf_tpu.training.trainer import ConTEXTure

    cfg = load_config(argv)
    t0 = time.perf_counter()
    # CTN_WARMUP_TINY=1: tiny towers (tests/CI of the warmup flow itself)
    trainer = ConTEXTure(cfg, tiny_models=bool(os.environ.get(
        "CTN_WARMUP_TINY")))
    print(f"[warmup] trainer init {time.perf_counter() - t0:.1f} s",
          flush=True)

    # 1. bootstrap img2img scan — same static signature paint_viewpoint's
    #    bootstrap uses: paint_step==1 forces use_inpaint=False
    #    (trainer.py:1188), depth arrives pre-resized to the latent size
    #    (img2img_step), rgb/update_mask at image_size
    sd = trainer.diffusion
    image_size = 512 if sd.unet_config.block_out_channels[0] >= 320 else 64
    sig = (50, image_size, False, False, bool(cfg.log.vis_diffusion_steps),
           1.0, False)  # strength=1.0, update_mask given (paint_viewpoint)
    t0 = time.perf_counter()
    fn = sd._jit_cache.get(sig)
    if fn is None:
        fn = sd._build_img2img(*sig)  # use_inpaint is the sig param
        sd._jit_cache[sig] = fn
    S = image_size
    lat_sz = S // 2 ** (len(sd.vae_config.block_out_channels) - 1)
    ctx = jnp.zeros((2, 77, sd.unet_config.cross_attention_dim))
    # avals must match the production call EXACTLY or the persistent-cache
    # key differs: jnp.asarray(0.0) is WEAK-typed f32 while img2img_step
    # passes a strong f32 scalar — that one bit changed the traced HLO and
    # made every cross-process warmup miss (observed: four distinct 362 MB
    # jit_run cache entries for the same graph)
    fn.lower(sd.params, ctx, jnp.zeros((1, 3, S, S)),
             jnp.zeros((1, 1, lat_sz, lat_sz)), jnp.zeros((1, 1, S, S)),
             jnp.asarray(0.0, jnp.float32), jax.random.PRNGKey(0)).compile()
    print(f"[warmup] bootstrap img2img ({sig}) "
          f"{time.perf_counter() - t0:.1f} s", flush=True)

    # 2. the production SDS step (with the config's mesh, if any)
    t0 = time.perf_counter()
    setup = trainer.prepare_sds(skip_bootstrap=True)
    mesh = trainer._make_mesh()
    step, optimizer, hot = trainer._build_sds_step(setup, mesh)
    params = trainer.texture_params
    opt_state = optimizer.init(params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        opt_state = jax.device_put(opt_state, rep)
    step.lower(params, opt_state, jnp.asarray([500], jnp.int32),
               jax.random.PRNGKey(0), hot).compile()
    print(f"[warmup] sds step {time.perf_counter() - t0:.1f} s", flush=True)

    # 3. eval / turntable render at the eval chunk size
    t0 = time.perf_counter()
    chunk = mesh.shape["views"] if mesh is not None else 1
    eval_fn = trainer._eval_jit_for(chunk, mesh)
    z = jnp.zeros((chunk,), jnp.float32)
    eval_fn.lower(trainer.texture_params, z, z, z).compile()
    print(f"[warmup] eval render {time.perf_counter() - t0:.1f} s",
          flush=True)
    print(f"[warmup] done; cache at {cache_dir}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
