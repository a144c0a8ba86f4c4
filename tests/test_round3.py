"""Round-3 changes: tile-weighting modes, edit-mask localization, the
precomputed-embedding config path, incremental metrics persistence, and the
chart-overlap guard in the UV unwrap (ADVICE r2 items 1-5)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import contexture_nerf_tpu.training.trainer as trainer_mod
from contexture_nerf_tpu.core.config import config_from_dict
from contexture_nerf_tpu.training.trainer import ConTEXTure


@pytest.fixture(scope="module")
def sphere_obj(tmp_path_factory):
    from tools.make_shapes import uv_sphere, write_obj

    d = tmp_path_factory.mktemp("shapes")
    p = d / "sphere.obj"
    write_obj(p, *uv_sphere(8, 12))
    return str(p)


def _tiny_cfg(sphere_obj, tmp_path, name, iters=1, **optim):
    return config_from_dict({
        "log": {"exp_name": name, "exp_root": str(tmp_path),
                "eval_size": 1, "full_eval_size": 1, "log_images": False,
                "save_mesh": False},
        "render": {"train_grid_size": 48, "eval_grid_size": 48},
        "guide": {"text": "a test", "shape_path": sphere_obj,
                  "texture_resolution": 16},
        "optim": {"seed": 0, "sds_iterations": iters, **optim},
    })


# ---------------------------------------------------------------------------
# tile weighting (ADVICE 1)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_tile_weighting_modes(sphere_obj, tmp_path):
    cfg = _tiny_cfg(sphere_obj, tmp_path, "tiles")
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")

    cfg.optim.tile_weighting = "uniform"
    probs_u = np.asarray(tr.prepare_sds(skip_bootstrap=True)["tile_probs"])
    np.testing.assert_allclose(probs_u, np.full(6, 1 / 6), atol=1e-6)

    cfg.optim.tile_weighting = "mixed"
    probs_m = np.asarray(tr.prepare_sds(skip_bootstrap=True)["tile_probs"])
    assert probs_m.min() >= 1 / 12 - 1e-6  # uniform floor: no starved view
    np.testing.assert_allclose(probs_m.sum(), 1.0, atol=1e-6)

    cfg.optim.tile_weighting = "weighted"
    probs_w = np.asarray(tr.prepare_sds(skip_bootstrap=True)["tile_probs"])
    np.testing.assert_allclose(probs_w.sum(), 1.0, atol=1e-6)
    # mixed is exactly the half-blend of the other two
    np.testing.assert_allclose(probs_m, 0.5 * probs_u + 0.5 * probs_w,
                               atol=1e-6)

    cfg.optim.tile_weighting = "bogus"
    with pytest.raises(ValueError, match="tile_weighting"):
        tr.prepare_sds(skip_bootstrap=True)


# ---------------------------------------------------------------------------
# reference_texture edit localization (ADVICE 5)
# ---------------------------------------------------------------------------

def _one_step_param_delta(tr, setup):
    import optax

    step, optimizer, hot = tr._build_sds_step(setup, None)
    params = tr.texture_params
    opt_state = optimizer.init(params)
    t = jnp.asarray([500], jnp.int32)
    new_params, *_ = step(params, opt_state, t, jax.random.PRNGKey(1), hot)
    return sum(float(jnp.abs(a - b).sum()) for a, b in
               zip(jax.tree.leaves(params), jax.tree.leaves(new_params)))


@pytest.mark.slow
def test_edit_change_mask_localizes_gradients(sphere_obj, tmp_path):
    cfg = _tiny_cfg(sphere_obj, tmp_path, "editmask")
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")
    res = cfg.guide.texture_resolution

    # all-zero change mask -> every texel is 'unedited' -> no SDS gradient
    tr.edit_change_mask = jnp.zeros((1, res, res))
    setup = tr.prepare_sds(skip_bootstrap=True)
    assert setup["edit_mask_pts"] is not None
    assert _one_step_param_delta(tr, setup) == 0.0

    # all-one mask -> full gradient flow
    tr.edit_change_mask = jnp.ones((1, res, res))
    setup = tr.prepare_sds(skip_bootstrap=True)
    assert _one_step_param_delta(tr, setup) > 0.0

    # no mask -> hot arg is None and training proceeds
    tr.edit_change_mask = None
    setup = tr.prepare_sds(skip_bootstrap=True)
    assert setup["edit_mask_pts"] is None


# ---------------------------------------------------------------------------
# precomputed-embedding path (ADVICE 3)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_precompute_uv_embedding_consumed(sphere_obj, tmp_path, monkeypatch):
    cfg = _tiny_cfg(sphere_obj, tmp_path, "embpts",
                    precompute_uv_embedding=True)
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")

    # ineligible off-TPU -> warning-skip, plumbing stays None
    setup = tr.prepare_sds(skip_bootstrap=True)
    assert setup["emb_pts"] is None

    # interpret-mode eligibility: emb_pts is populated AND consumed, and the
    # step loss matches the uv-path loss (same rng)
    monkeypatch.setattr(trainer_mod, "_FUSED_EMB_INTERPRET", True)
    setup_emb = tr.prepare_sds(skip_bootstrap=True)
    assert setup_emb["emb_pts"] is not None

    def one_loss(setup):
        import optax

        step, optimizer, hot = tr._build_sds_step(setup, None)
        params = tr.texture_params
        opt_state = optimizer.init(params)
        t = jnp.asarray([500], jnp.int32)
        out = step(params, opt_state, t, jax.random.PRNGKey(2), hot)
        return float(out[2])

    loss_emb = one_loss(setup_emb)
    monkeypatch.setattr(trainer_mod, "_FUSED_EMB_INTERPRET", False)
    cfg.optim.precompute_uv_embedding = False
    loss_uv = one_loss(tr.prepare_sds(skip_bootstrap=True))
    np.testing.assert_allclose(loss_emb, loss_uv, rtol=2e-2)


@pytest.mark.slow
def test_precompute_uv_embedding_composes_with_mesh(sphere_obj, tmp_path,
                                                    monkeypatch):
    """optim.precompute_uv_embedding + optim.data_parallel: the fused
    emb kernel is opaque to GSPMD (XLA replicates its operands), so the
    sharded step must still match the single-device step bit-for-bit on
    the loss — the composition a pod user would actually run."""
    import optax

    cfg = _tiny_cfg(sphere_obj, tmp_path, "embmesh",
                    precompute_uv_embedding=True, data_parallel="on")
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")
    monkeypatch.setattr(trainer_mod, "_FUSED_EMB_INTERPRET", True)

    def one_loss(mesh):
        setup = tr.prepare_sds(skip_bootstrap=True)
        assert setup["emb_pts"] is not None
        step, optimizer, hot = tr._build_sds_step(setup, mesh)
        params = tr.texture_params
        opt_state = optimizer.init(params)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            params = jax.device_put(params, rep)
            opt_state = jax.device_put(opt_state, rep)
        out = step(params, opt_state, jnp.asarray([500], jnp.int32),
                   jax.random.PRNGKey(2), hot)
        return float(out[2])

    mesh = tr._make_mesh()
    assert mesh is not None and mesh.shape["views"] == 8
    loss_sharded = one_loss(mesh)
    loss_single = one_loss(None)
    # GSPMD repartitions the kernel's bf16-compute chain, so reduction
    # order shifts; observed drift ~0.25% (same order as the 2e-2 the
    # emb-vs-uv equivalence test above allows)
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-2)


# ---------------------------------------------------------------------------
# incremental metrics persistence (ADVICE 2)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_metrics_survive_interruption(sphere_obj, tmp_path):
    cfg = _tiny_cfg(sphere_obj, tmp_path, "interrupted", iters=3,
                    checkpoint_interval=1)
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")
    orig = tr.save_checkpoint

    def dying_save(params, opt_state, iteration):
        orig(params, opt_state, iteration)
        if iteration == 2:
            raise RuntimeError("simulated crash")

    tr.save_checkpoint = dying_save
    with pytest.raises(RuntimeError, match="simulated crash"):
        tr.paint()
    # metrics.json written at the iter-1 checkpoint survives the crash
    metrics = json.loads((Path(cfg.log.exp_dir) / "metrics.json").read_text())
    assert any(m["iter"] == 0 for m in metrics)


# ---------------------------------------------------------------------------
# chart-overlap guard (ADVICE 4)
# ---------------------------------------------------------------------------

def _spiral_ramp(turns=2.0, segs=48):
    """Parking-garage ramp: an annular strip winding `turns` times with a
    gentle slope. All face normals stay near +z (inside any 75-degree seed
    cone) yet successive turns overlap in the seed-plane projection."""
    thetas = np.linspace(0, 2 * np.pi * turns, segs)
    z = 0.02 * thetas
    inner = np.stack([0.8 * np.cos(thetas), 0.8 * np.sin(thetas), z], -1)
    outer = np.stack([1.2 * np.cos(thetas), 1.2 * np.sin(thetas), z], -1)
    verts = np.concatenate([inner, outer]).astype(np.float32)
    faces = []
    for i in range(segs - 1):
        a, b = i, i + 1
        c, d = segs + i, segs + i + 1
        faces.append([a, c, b])
        faces.append([b, c, d])
    return verts, np.asarray(faces, np.int64)


def test_overlap_helpers():
    from contexture_nerf_tpu.models.textured_mesh import (_chart_overlaps,
                                                          _overlap_frac)

    # two disjoint triangles: no overlap
    uv = np.array([[0, 0], [1, 0], [0, 1],
                   [2, 0], [3, 0], [2, 1]], np.float64)
    ft = np.array([[0, 1, 2], [3, 4, 5]])
    assert _overlap_frac(uv, ft) < 0.01
    assert not _chart_overlaps(uv, ft)
    # coincident triangles in one welded chart: overlap
    uv2 = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float64)
    ft2 = np.array([[0, 1, 2], [1, 3, 2]])  # clean quad: share the diagonal
    uv3 = np.array([[0, 0], [1, 0], [0, 1], [0.4, 0.4]], np.float64)
    ft3 = np.array([[0, 1, 2], [0, 1, 3]])  # second tri inside the first
    assert _overlap_frac(uv3, ft3) > 0.05
    assert _chart_overlaps(uv3, ft3)
    assert not _chart_overlaps(uv2, ft2)


def test_spiral_ramp_unwrap_has_no_overlap():
    from contexture_nerf_tpu.models.textured_mesh import (_overlap_frac,
                                                          atlas_unwrap)

    verts, faces = _spiral_ramp()
    vt, ft = atlas_unwrap(verts, faces)
    # the final atlas maps distinct surface regions to distinct texels
    assert _overlap_frac(vt, ft, G=256) < 0.02
    assert vt.min() >= 0.0 and vt.max() <= 1.0
    assert ft.shape == faces.shape


def test_clean_mesh_unwrap_still_welds(tiny_mesh_obj):
    """The overlap guard must not demote healthy charts: a flat two-triangle
    mesh keeps one welded chart (faces share vt indices)."""
    from contexture_nerf_tpu.models.textured_mesh import atlas_unwrap

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    vt, ft = atlas_unwrap(verts, faces)
    assert len(set(ft[0]) & set(ft[1])) == 2  # shared edge stays welded


# ---------------------------------------------------------------------------
# stale-key configs (VERDICT r2 missing #5: decide + test the behavior)
# ---------------------------------------------------------------------------

def test_stale_config_keys_warn_and_strict_raises(caplog):
    import logging

    from contexture_nerf_tpu.core.config import config_from_dict, load_config

    data = {"guide": {"text": "x", "guidance_scale_crossattn": 3,
                      "guidance_scale_concat": 5}}
    with caplog.at_level(logging.WARNING, logger="contexture_nerf_tpu"):
        cfg = config_from_dict(data)
    assert cfg.guide.text == "x"
    assert "guide.guidance_scale_crossattn" in caplog.text
    assert "pyrallis" in caplog.text
    with pytest.raises(ValueError, match="guidance_scale_concat"):
        config_from_dict(data, strict=True)

    # the shipped mickey mirror (stale keys included verbatim) parses
    repo = Path(__file__).resolve().parent.parent
    cfg = load_config(
        [f"--config_path={repo}/configs/text_guided/mickey.yaml"])
    assert cfg.guide.individual_control_of_conditions is True


@pytest.mark.slow
def test_tile_weighting_all_zero_falls_back_to_uniform(sphere_obj, tmp_path):
    """All-zero view weights must not produce NaN tile probabilities in
    'weighted'/'mixed' modes (r3 code review)."""
    cfg = _tiny_cfg(sphere_obj, tmp_path, "zerow", tile_weighting="weighted")
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")
    # view_weights are computed inside prepare_sds; zero them right after
    orig = tr.define_view_weights

    def zeroed():
        orig()
        tr.view_weights = jnp.zeros_like(tr.view_weights)

    tr.define_view_weights = zeroed
    probs = np.asarray(tr.prepare_sds(skip_bootstrap=True)["tile_probs"])
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs, np.full(6, 1 / 6), atol=1e-6)


@pytest.mark.slow
def test_explicit_tp_without_mesh_raises(sphere_obj, tmp_path):
    """optim.tensor_parallel/sequence_parallel > 1 must error loudly when no
    mesh can be built, not silently run single-device (r3 code review)."""
    cfg = _tiny_cfg(sphere_obj, tmp_path, "tpoff", data_parallel="off",
                    tensor_parallel=2)
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")
    with pytest.raises(ValueError, match="tensor_parallel"):
        tr._make_mesh()


# ---------------------------------------------------------------------------
# semantic SDS convergence smoke (VERDICT r2 weak #5)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_sds_converges_to_constructed_teacher_target(sphere_obj, tmp_path,
                                                     monkeypatch):
    """A 'trained-by-construction' teacher whose v-prediction is exactly the
    velocity consistent with a fixed target latent must pull the student's
    grid latent toward that target: v_pred - v = (z - z_tgt)/sqrt(1-acp_t),
    so the SDS update is a contraction toward z_tgt. This is the semantic
    smoke that the full differentiable chain (MLP -> grid -> VAE encode ->
    SDS grad -> adam) optimizes what the teacher asks for — independent of
    weight quality."""
    import optax

    # plumbing test, not reference hyperparams; pins the EXACT-gradient
    # (parity) path explicitly — monotone contraction is its contract, and
    # the r5 tile-local default clips boundary-cell gradients on this tiny
    # 48-px grid (the local-grad equivalence itself is covered at margin
    # limits by tests/test_local_grad.py)
    cfg = _tiny_cfg(sphere_obj, tmp_path, "semantic", iters=1,
                    sds_lr=2e-3, local_sds_grad=False)
    # real flax init for the tiny VAE: the contraction floor this smoke
    # asserts against depends on the encoder's init distribution, which the
    # conftest's fast-init fill (core/fastinit.py) deliberately does not
    # reproduce
    monkeypatch.delenv("CTN_FAST_TINY_INIT", raising=False)
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")
    setup = tr.prepare_sds(skip_bootstrap=True)
    pipe = tr.zero123plus
    acp = pipe.alphas_cumprod

    # target: a solid-color grid composited exactly like the student render
    mask = setup["mask_grid"]
    target_rgb = jnp.stack([jnp.ones_like(mask[0, 0]),
                            0.2 * jnp.ones_like(mask[0, 0]),
                            0.2 * jnp.ones_like(mask[0, 0])])[None]
    from contexture_nerf_tpu.diffusion.zero123plus import scale_image, \
        scale_latents
    target_grid = scale_image((target_rgb * mask + 0.5 * (1 - mask)) * 2 - 1)

    def z_mean(grid):
        mean, _ = pipe.vae.apply(pipe.params["vae"], grid,
                                 method=pipe.vae.encode_moments)
        return scale_latents(mean * pipe.vae_config.scaling_factor)

    z_tgt = z_mean(target_grid)

    def fake_cfg_v_pred(params, latents_noisy, t, cond_lat_pair, ehs, depth,
                        guidance_scale, key, scale_input, **kw):
        a = acp[t].reshape(-1, 1, 1, 1)
        eps = (latents_noisy - jnp.sqrt(a) * z_tgt) / jnp.sqrt(1 - a)
        return jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * z_tgt

    pipe._cfg_v_pred = fake_cfg_v_pred
    step, optimizer, hot = tr._build_sds_step(setup, None)
    params = tr.texture_params
    opt_state = optimizer.init(params)
    t = jnp.asarray([300], jnp.int32)
    key = jax.random.PRNGKey(0)

    dists = []
    for i in range(80):
        key, sub = jax.random.split(key)
        params, opt_state, loss, gn, fi, grid = step(params, opt_state, t,
                                                     sub, hot)
        if i % 20 == 0 or i == 79:
            dists.append(float(jnp.abs(z_mean(grid) - z_tgt).mean()))
    assert np.isfinite(dists).all()
    # monotone contraction toward the constructed target, down to the
    # chain's quantization floor. The floor moved up (0.028 -> 0.066) when
    # the VAE encoder adopted diffusers' asymmetric downsample padding
    # (round 4, tests/test_weights_numeric.py): latent cells now straddle
    # pixel-tile boundaries — same behavior as the real SD VAE — so the
    # tile-sliced loss cannot drive the boundary cells all the way. The
    # contraction itself (the thing this smoke guards: gradients flow the
    # right way through MLP -> grid -> VAE -> SDS -> adam) is unchanged.
    assert all(b <= a + 1e-6 for a, b in zip(dists, dists[1:])), dists
    assert dists[-1] < 0.8 * dists[0], dists
    # NOTE: pixel-space convergence is NOT implied here — the random tiny
    # VAE encoder is not injective, so z -> z_tgt can hold while pixels
    # drift. The visually-checkable version (fit the tiny VAE as a faithful
    # autoencoder first, then the sphere really turns red) lives in
    # tools/semantic_smoke.py and tests/test_semantic_smoke.py.


# ---------------------------------------------------------------------------
# loop-invariant ControlNet hint embedding hoist (r3 perf)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_precomputed_cn_cond_embedding_matches_inline():
    """_cfg_v_pred with the hoisted hint embedding == computing it inline
    (the embedding depends only on the depth image; trainer hoists it out of
    the SDS hot loop)."""
    from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline

    pipe = Zero123PlusPipeline(tiny=True, seed=0)
    key = jax.random.PRNGKey(1)
    lat = jax.random.normal(key, (1, 4, 24, 16)) * 0.3
    t = jnp.asarray([300], jnp.int32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8)) * 0.2
    ehs = jax.random.normal(jax.random.PRNGKey(3),
                            (2, 77, pipe.text_config.hidden_size)) * 0.02
    depth = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 24 * 8, 16 * 8))

    base = pipe._cfg_v_pred(pipe.params, lat, t, cond, ehs, depth, 5.0,
                            key, scale_input=lambda x: x)
    emb = pipe.embed_control_cond(pipe.params, depth, (24, 16))
    assert emb.shape == (1, 24, 16,
                         pipe.unet_config.block_out_channels[0])
    out = pipe._cfg_v_pred(pipe.params, lat, t, cond, ehs, depth, 5.0,
                           key, scale_input=lambda x: x, cn_cond_emb=emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
