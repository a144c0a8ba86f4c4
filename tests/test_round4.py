"""Round-4 additions (VERDICT r3): Zero123++ generation-loop blending /
inpaint extensions (reference src/zero123plus.py:651-707) and the HLO
collective assertions for the sharded production step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contexture_nerf_tpu.diffusion.zero123plus import (VAE_SCALE,
                                                       Zero123PlusPipeline,
                                                       unscale_image,
                                                       unscale_latents)

H, W = 32, 32  # tiny VAE downsamples by 2 -> 16x16 latent


@pytest.fixture(scope="module")
def pipe():
    return Zero123PlusPipeline(tiny=True, seed=0)


def _gen_args(pipe):
    cond = jnp.zeros((1, 3, 32, 32))
    depth = jnp.ones((1, 3, H, W)) * 0.5
    return cond, depth


def _lat_shape(pipe):
    down = 2 ** (len(pipe.vae_config.block_out_channels) - 1)
    return (1, 4, H // down, W // down)


@pytest.mark.slow
def test_blending_mask_ones_reproduces_plain_loop(pipe):
    """mask==1 everywhere means every blend is `lat*1 + x*0` — the blended
    generation must be BIT-identical to the plain loop under the same key
    (the loop splits its per-step key 4 ways unconditionally so the RNG
    streams align across the two jit variants)."""
    cond, depth = _gen_args(pipe)
    key = jax.random.PRNGKey(3)
    plain = pipe.generate(cond, depth, num_inference_steps=3,
                          guidance_scale=2.0, key=key, height=H, width=W)
    ones = jnp.ones((1, 1) + _lat_shape(pipe)[2:], jnp.float32)
    renders = jax.random.normal(jax.random.PRNGKey(7), _lat_shape(pipe))
    blended = pipe.generate(cond, depth, num_inference_steps=3,
                            guidance_scale=2.0, key=key, height=H, width=W,
                            use_blending=True, latent_mask_grid=ones,
                            latent_renders_grid=renders)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(blended))


@pytest.mark.slow
def test_blending_mask_zeros_pins_output_to_renders(pipe):
    """mask==0 everywhere: the final-step blend (reference :706-707) replaces
    the latent wholesale with the clean renders grid, so the output image is
    exactly the decode of `latent_renders_grid`."""
    cond, depth = _gen_args(pipe)
    renders = 0.1 * jax.random.normal(jax.random.PRNGKey(11),
                                      _lat_shape(pipe))
    zeros = jnp.zeros((1, 1) + _lat_shape(pipe)[2:], jnp.float32)
    out = pipe.generate(cond, depth, num_inference_steps=3,
                        guidance_scale=2.0, key=jax.random.PRNGKey(5),
                        height=H, width=W, use_blending=True,
                        latent_mask_grid=zeros, latent_renders_grid=renders)

    lat = unscale_latents(renders)
    img = pipe.vae.apply(pipe.params["vae"], lat / VAE_SCALE,
                         method=pipe.vae.decode)
    expected = jnp.clip(unscale_image(img) / 2 + 0.5, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-5)


@pytest.mark.slow
def test_blending_mask_is_spatially_selective(pipe):
    """The renders grid only ever enters the loop multiplied by (1-mask)
    (pre-step blend AND final blend, reference :660,707) — so changing its
    values inside the mask==1 (generate) region must leave the output
    BIT-identical, while changing them inside the mask==0 (pinned) region
    must change it."""
    cond, depth = _gen_args(pipe)
    key = jax.random.PRNGKey(13)
    lh, lw = _lat_shape(pipe)[2:]
    mask = jnp.concatenate([jnp.zeros((1, 1, lh, lw // 2)),
                            jnp.ones((1, 1, lh, lw - lw // 2))], axis=3)
    renders = 0.1 * jax.random.normal(jax.random.PRNGKey(17),
                                      _lat_shape(pipe))
    gen = lambda r: pipe.generate(  # noqa: E731
        cond, depth, num_inference_steps=3, guidance_scale=2.0, key=key,
        height=H, width=W, use_blending=True, latent_mask_grid=mask,
        latent_renders_grid=r)
    base = gen(renders)
    # perturb only the mask==1 half: must be invisible
    bump = jnp.concatenate([jnp.zeros((1, 4, lh, lw // 2)),
                            jnp.ones((1, 4, lh, lw - lw // 2))], axis=3)
    same = gen(renders + 3.0 * bump)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    # perturb only the mask==0 half: must show up
    diff = gen(renders + 3.0 * (1.0 - bump))
    assert not np.array_equal(np.asarray(base), np.asarray(diff))


@pytest.mark.slow
def test_inpaint_routes_mid_steps_through_inpaint_unet(pipe):
    """use_inpaint: steps 10 < i < 20 run the 9-ch inpaint UNet
    (reference :651,676-689). With 12 steps only i==11 is in range; the
    output must differ from the plain run (different denoiser at step 11)
    and stay finite/in-range."""
    from contexture_nerf_tpu.diffusion.unet import (UNet2DCondition,
                                                    UNetConfig)

    cond, depth = _gen_args(pipe)
    icfg = UNetConfig.tiny(in_channels=9,
                           cross_attention_dim=pipe.text_config.hidden_size)
    inpaint = UNet2DCondition(icfg)
    lat9 = jnp.zeros((2, 9) + _lat_shape(pipe)[2:])
    ehs = jnp.zeros((2, pipe.text_config.max_positions,
                     pipe.text_config.hidden_size))
    iparams = jax.jit(inpaint.init)(jax.random.PRNGKey(23), lat9,
                                    jnp.array([1]), ehs)
    pipe.attach_inpaint_unet(inpaint, iparams)

    key = jax.random.PRNGKey(29)
    mask = jnp.ones((1, 1) + _lat_shape(pipe)[2:], jnp.float32)
    masked = jnp.zeros(_lat_shape(pipe))
    out = pipe.generate(cond, depth, num_inference_steps=12,
                        guidance_scale=2.0, key=key, height=H, width=W,
                        use_inpaint=True, latent_mask_grid=mask,
                        masked_input_latents=masked)
    plain = pipe.generate(cond, depth, num_inference_steps=12,
                          guidance_scale=2.0, key=key, height=H, width=W)
    arr = np.asarray(out)
    assert arr.shape == (1, 3, H, W)
    assert np.isfinite(arr).all() and arr.min() >= 0 and arr.max() <= 1
    assert not np.array_equal(arr, np.asarray(plain))


def test_generate_extension_arg_validation(pipe):
    cond, depth = _gen_args(pipe)
    with pytest.raises(ValueError, match="latent_mask_grid"):
        pipe.generate(cond, depth, num_inference_steps=2, height=H, width=W,
                      use_blending=True)
    with pytest.raises(ValueError, match="latent_renders_grid"):
        pipe.generate(cond, depth, num_inference_steps=2, height=H, width=W,
                      use_blending=True,
                      latent_mask_grid=jnp.ones((1, 1) + _lat_shape(pipe)[2:]))
    # the missing-inpaint error must fire on a pipeline WITHOUT an attached
    # inpaint UNet; detach/restore instead of constructing a second pipeline
    # (a fresh tiny-tower init costs ~10 s on the 1-core CI host)
    saved = getattr(pipe, "inpaint_unet", None), \
        getattr(pipe, "inpaint_params", None)
    pipe.inpaint_unet = pipe.inpaint_params = None
    try:
        with pytest.raises(ValueError, match="attach_inpaint_unet"):
            pipe.generate(cond, depth, num_inference_steps=2, height=H,
                          width=W, use_inpaint=True,
                          latent_mask_grid=jnp.ones(
                              (1, 1) + _lat_shape(pipe)[2:]),
                          masked_input_latents=jnp.zeros(_lat_shape(pipe)))
    finally:
        pipe.inpaint_unet, pipe.inpaint_params = saved


# ---------------------------------------------------------------------------
# HLO collective assertions for the sharded production step (VERDICT r3 #5):
# the dryrun proves sharded==single numerically, but a sharding-spec
# regression that silently REPLICATES the canvas (all-gather instead of a
# distributed layout) would pass that test while destroying scaling. Compile
# the real step on the 8-virtual-CPU mesh and inspect the SPMD-partitioned
# module text.
# ---------------------------------------------------------------------------


import re

from contexture_nerf_tpu.core.config import config_from_dict
from contexture_nerf_tpu.training.trainer import ConTEXTure


@pytest.fixture(scope="module")
def sphere_obj_r4(tmp_path_factory):
    from tools.make_shapes import uv_sphere, write_obj

    p = tmp_path_factory.mktemp("shapes_r4") / "sphere.obj"
    write_obj(p, *uv_sphere(8, 12))
    return str(p)


def _compiled_step(sphere_obj, tmp_path, name, **optim):
    cfg = config_from_dict({
        "log": {"exp_name": name, "exp_root": str(tmp_path),
                "eval_size": 1, "full_eval_size": 1, "log_images": False,
                "save_mesh": False},
        "render": {"train_grid_size": 48, "eval_grid_size": 48},
        "guide": {"text": "a test", "shape_path": sphere_obj,
                  "texture_resolution": 16},
        "optim": {"seed": 0, "sds_iterations": 1, **optim},
    })
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")
    mesh = tr._make_mesh()
    setup = tr.prepare_sds(skip_bootstrap=True)
    step, optimizer, hot = tr._build_sds_step(setup, mesh)
    params = tr.texture_params
    opt_state = optimizer.init(params)
    t = jnp.asarray([500], jnp.int32)
    key = jax.random.PRNGKey(0)
    return step.lower(params, opt_state, t, key, hot).compile()


_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "u8": 1,
          "pred": 1}


def _allgather_bytes(txt):
    """Result-buffer bytes of every all-gather instruction."""
    out = []
    for m in re.finditer(r"=\s*(?:\()?\s*([a-z0-9]+)\[([0-9,]*)\]"
                         r"[^a-z]*all-gather", txt):
        n = 1
        for d in m.group(2).split(","):
            if d:
                n *= int(d)
        out.append(n * _BYTES.get(m.group(1), 4))
    return out


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_sharded_step_stays_distributed(sphere_obj_r4, tmp_path):
    """The failure mode this guards: a sharding-spec regression that
    silently REPLICATES the canvas state on every device. Three checks on
    the compiled SPMD module (8-virtual-CPU mesh):

      1. the gradient all-reduce over the views axis exists;
      2. all-gather traffic stays small — legitimate gathers exist (self-
         attention KV over the canvas-token sequence, resize halo reads)
         but they are KBs; replication would show canvas-activation-sized
         results (the single-device temp pool is ~300 MB);
      3. per-device temp memory is a small fraction of the single-device
         compile's (measured 9.3% on an 8-way mesh; near-ideal 12.5%) —
         the direct, layout-agnostic signature of distributed state.
    """
    cs = _compiled_step(sphere_obj_r4, tmp_path, "hlo_dp",
                        data_parallel="on")
    low = cs.as_text().lower()
    assert "all-reduce" in low
    gathers = _allgather_bytes(low)
    assert gathers, "expected some collectives in the SPMD module"
    assert max(gathers) <= 2 * 2 ** 20, (
        f"all-gather of {max(gathers)} bytes — canvas-scale replication "
        f"(current max is ~384 KB attention-KV)")
    assert sum(gathers) <= 32 * 2 ** 20, sum(gathers)

    c1 = _compiled_step(sphere_obj_r4, tmp_path, "hlo_single",
                        data_parallel="off")
    sharded = cs.memory_analysis().temp_size_in_bytes
    single = c1.memory_analysis().temp_size_in_bytes
    assert sharded < 0.5 * single, (
        f"sharded per-device temp {sharded} vs single-device {single}: "
        "canvas state is being replicated")


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_tp_step_hlo_has_tower_collectives(sphere_obj_r4, tmp_path):
    """(views x 2) TP mesh: the Megatron-split towers must produce their
    partial-sum combines (all-reduce or reduce-scatter) in the compiled
    module, and the all-gather traffic bound holds there too."""
    cs = _compiled_step(sphere_obj_r4, tmp_path, "hlo_tp",
                        data_parallel="on", tensor_parallel=2)
    low = cs.as_text().lower()
    assert ("all-reduce" in low) or ("reduce-scatter" in low)
    gathers = _allgather_bytes(low)
    assert max(gathers) <= 2 * 2 ** 20, max(gathers)


# ---------------------------------------------------------------------------
# round-4 review fixes: static bootstrap graph + warmup tool
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_img2img_graph_is_crop_shape_independent():
    """The bootstrap's bbox crop is data-dependent; img2img_step must
    normalize every input to static shapes BEFORE the jit so different
    crops reuse ONE traced graph (review fix: depth was passed at crop
    size and re-traced/recompiled per bbox, defeating the cache)."""
    from contexture_nerf_tpu.diffusion.sd_depth import StableDiffusionDepth

    sd = StableDiffusionDepth(tiny=True, use_inpaint=False, seed=0)
    emb = jnp.zeros((2, 77, sd.unet_config.cross_attention_dim))
    for size in (40, 56):
        rgb = jnp.ones((1, 3, size, size)) * 0.5
        depth = jnp.ones((1, 1, size, size)) * 0.3
        img, _ = sd.img2img_step(emb, rgb, depth, num_inference_steps=2,
                                 fixed_seed=0)
        assert img.shape[-1] == img.shape[-2]
    assert len(sd._jit_cache) == 1
    jitted = next(iter(sd._jit_cache.values()))
    assert jitted._cache_size() == 1, (
        f"{jitted._cache_size()} traces for 2 crop sizes — the graph "
        "depends on the data-dependent crop shape")


@pytest.mark.slow
def test_warmup_cache_tool_runs(tmp_path, monkeypatch):
    """tools/warmup_cache.py compiles the hot graphs without running the
    pipeline (tiny towers via CTN_WARMUP_TINY)."""
    import tools.warmup_cache as wc

    monkeypatch.setenv("CTN_WARMUP_TINY", "1")
    wc.main([f"--config_path=configs/text_guided/spot_quick_test.yaml",
             "--log.exp_name=warmup_ut", f"--log.exp_root={tmp_path}",
             "--render.train_grid_size=48", "--render.eval_grid_size=48",
             "--guide.texture_resolution=16"])


@pytest.mark.slow
def test_img2img_strength_truncates_schedule():
    """strength runs only the last int(n*strength) scheduler steps
    (reference get_timesteps, stable_diffusion_depth.py:310) and
    update_mask=None starts from the noised gt latent (:322-327)."""
    from contexture_nerf_tpu.diffusion.sd_depth import StableDiffusionDepth

    sd = StableDiffusionDepth(tiny=True, use_inpaint=False, seed=0)
    emb = jnp.zeros((2, 77, sd.unet_config.cross_attention_dim))
    rgb = jnp.ones((1, 3, 48, 48)) * 0.5
    depth = jnp.ones((1, 1, 48, 48)) * 0.3

    full, _ = sd.img2img_step(emb, rgb, depth, num_inference_steps=4,
                              fixed_seed=0)
    half, _ = sd.img2img_step(emb, rgb, depth, num_inference_steps=4,
                              strength=0.5, fixed_seed=0)
    assert not np.array_equal(np.asarray(full), np.asarray(half))
    # distinct static signatures -> two cached graphs
    sigs = list(sd._jit_cache)
    assert {s[5] for s in sigs} == {1.0, 0.5}

    # `half` (update_mask=None) used the noised-gt init; an explicit
    # all-ones mask selects the pure-noise init at the same strength and
    # must differ (reference :322-327 branch)
    noise_init, _ = sd.img2img_step(emb, rgb, depth, num_inference_steps=4,
                                    strength=0.5, fixed_seed=0,
                                    update_mask=jnp.ones((1, 1, 48, 48)))
    assert not np.array_equal(np.asarray(half), np.asarray(noise_init))


@pytest.mark.slow
def test_paint_requires_zero123plus(tmp_path):
    """guide.use_zero123plus=False has no live paint path (the reference's
    paint() also hardwires the Zero123++ loop, trainer.py:367) — paint()
    must fail loudly, not with an AttributeError deep in prepare_sds."""
    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from tools.make_shapes import uv_sphere, write_obj

    p = tmp_path / "s.obj"
    write_obj(p, *uv_sphere(8, 12))
    cfg = config_from_dict({
        "log": {"exp_name": "noz123", "exp_root": str(tmp_path),
                "eval_size": 1, "full_eval_size": 1, "log_images": False,
                "save_mesh": False},
        "render": {"train_grid_size": 48, "eval_grid_size": 48},
        "guide": {"text": "a test", "shape_path": str(p),
                  "texture_resolution": 16, "use_zero123plus": False},
        "optim": {"seed": 0, "sds_iterations": 1},
    })
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")
    with pytest.raises(ValueError, match="use_zero123plus"):
        tr.paint()


def test_euler_trailing_timesteps_match_diffusers_rounding():
    """diffusers EulerAncestralDiscreteScheduler 'trailing' rounds BEFORE
    subtracting 1; with half-to-even rounding the orders diverge by +/-1
    whenever T/n has a .5 fraction (r4 review fix — 8/16 entries at n=16).
    Pinned against np.arange(T,0,-T/n).round()-1 computed independently."""
    from contexture_nerf_tpu.diffusion import schedulers as sch

    euler = sch.EulerAncestral.create()
    ts16, _ = euler.timesteps_and_sigmas(16)
    np.testing.assert_array_equal(
        np.asarray(ts16[:8]), [999, 937, 874, 811, 749, 687, 624, 561])
    ts28, _ = euler.timesteps_and_sigmas(28)
    np.testing.assert_array_equal(
        np.asarray(ts28[:8]), [999, 963, 928, 892, 856, 820, 785, 749])
