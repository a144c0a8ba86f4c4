"""int8 quantization path (ops/quant.py + optim.int8_controlnet).

The depth ControlNet is the quantization-tolerant quarter of the SDS
teacher (residual hints through zero-init projections; reference applies it
per denoise step at /root/reference/src/zero123plus.py:283-290). These
tests pin: primitive accuracy, exact-backward gradients, param-tree
invariance, and end-to-end closeness of the quantized ControlNet.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contexture_nerf_tpu.ops.quant import (int8_conv_general_dilated,
                                           int8_dot_general, quantize_int8)


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


def test_quantize_int8_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    q, s = quantize_int8(x, axes=-1)
    assert q.dtype == jnp.int8 and s.shape == (64, 1)
    # dequantized error bounded by half a step per element
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    assert err.max() <= np.asarray(s).max() * 0.5 + 1e-7


def test_int8_dot_accuracy_and_fallback():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (32, 256), jnp.float32)
    w = jax.random.normal(k2, (256, 64), jnp.float32) * 0.05
    dims = (((1,), (0,)), ((), ()))
    exact = jax.lax.dot_general(x, w, dims)
    q = int8_dot_general(x, w, dims)
    # per-row/per-col symmetric int8 on gaussian data: ~1e-2 relative
    assert _rel_err(q, exact) < 3e-2
    # non-Dense contraction falls back to the exact op
    dims_t = (((0,), (0,)), ((), ()))
    np.testing.assert_allclose(
        np.asarray(int8_dot_general(x, x, dims_t)),
        np.asarray(jax.lax.dot_general(x, x, dims_t)), rtol=1e-5)


def test_int8_dot_gradients_are_exact_path():
    """Backward runs through the exact f32 dot (custom VJP), so gradients
    match the unquantized op — no silent zero-grads from round()."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (8, 32), jnp.float32)
    w = jax.random.normal(k2, (32, 16), jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    g_q = jax.grad(lambda a, b: int8_dot_general(a, b, dims).sum(),
                   argnums=(0, 1))(x, w)
    g_e = jax.grad(lambda a, b: jax.lax.dot_general(a, b, dims).sum(),
                   argnums=(0, 1))(x, w)
    for a, b in zip(g_q, g_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_int8_conv_accuracy_and_grad():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (2, 12, 12, 16), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 16, 24), jnp.float32) * 0.1
    kw = dict(window_strides=(1, 1), padding=[(1, 1), (1, 1)],
              dimension_numbers=("NHWC", "HWIO", "NHWC"))
    exact = jax.lax.conv_general_dilated(x, w, **kw)
    q = int8_conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                  dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert _rel_err(q, exact) < 5e-2
    g_q = jax.grad(lambda a: int8_conv_general_dilated(
        a, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")).sum())(x)
    g_e = jax.grad(lambda a: jax.lax.conv_general_dilated(
        a, w, **kw).sum())(x)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_e), rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_controlnets():
    from contexture_nerf_tpu.diffusion.controlnet import ControlNet
    from contexture_nerf_tpu.diffusion.unet import UNetConfig

    cfg = UNetConfig.tiny(in_channels=4)
    exact = ControlNet(cfg, dtype=jnp.float32)
    quant = ControlNet(cfg, dtype=jnp.float32, quant=True)
    lat = jnp.zeros((1, 4, 8, 8))
    ehs = jnp.zeros((1, 77, 64))
    cond = jnp.zeros((1, 3, 64, 64))
    params = jax.jit(exact.init)(jax.random.PRNGKey(0), lat,
                                 jnp.array([0]), ehs, cond)
    # the output projections are zero-init (hints vanish at init); randomize
    # them so the comparison below exercises non-trivial outputs
    key = jax.random.PRNGKey(7)

    def randomize(p):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, p.shape, p.dtype) * 0.1

    tree = params["params"]
    for name in list(tree):
        if name.startswith("controlnet_down_blocks") or \
                name == "controlnet_mid_block":
            tree[name] = jax.tree.map(randomize, tree[name])
    return exact, quant, params, (lat, ehs, cond), cfg


def test_controlnet_param_tree_invariant(tiny_controlnets):
    exact, quant, params, (lat, ehs, cond), _ = tiny_controlnets
    qparams = jax.jit(quant.init)(jax.random.PRNGKey(0), lat,
                                  jnp.array([0]), ehs, cond)
    assert jax.tree.structure(qparams) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(qparams), jax.tree.leaves(params)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.slow
def test_controlnet_int8_close_to_exact(tiny_controlnets):
    exact, quant, params, (lat, ehs, cond), _ = tiny_controlnets
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 3)
    lat = jax.random.normal(ks[0], lat.shape)
    ehs = jax.random.normal(ks[1], ehs.shape)
    cond = jax.random.uniform(ks[2], cond.shape)
    d_e, m_e = exact.apply(params, lat, jnp.array([500]), ehs, cond, 2.0)
    d_q, m_q = quant.apply(params, lat, jnp.array([500]), ehs, cond, 2.0)
    assert _rel_err(m_q, m_e) < 0.15, _rel_err(m_q, m_e)
    # averaged over all residuals the error should be small
    errs = [_rel_err(a, b) for a, b in zip(d_q, d_e)]
    assert float(np.mean(errs)) < 0.15, errs


@pytest.mark.slow
def test_pipeline_int8_controlnet_teacher_runs(monkeypatch):
    """int8_controlnet=True through the real teacher path: at zero-init
    output projections the quantized hints must stay exactly zero, so the
    v-prediction matches the unquantized pipeline bit-for-bit. (Real flax
    init required: the conftest fast-init fills the ControlNet zero-convs
    with random weights, which breaks the exactly-zero-hint premise.)"""
    from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline

    monkeypatch.delenv("CTN_FAST_TINY_INIT", raising=False)

    pipe = Zero123PlusPipeline(tiny=True, seed=0)
    pipe8 = Zero123PlusPipeline(tiny=True, seed=0, int8_controlnet=True)
    h = w = 16
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, h, w))
    clp = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    ehs = jax.random.normal(
        jax.random.PRNGKey(3), (2, 77, pipe.text_config.hidden_size))
    depth = jnp.zeros((1, 3, h * 8, w * 8))
    t = jnp.asarray([500], jnp.int32)
    key = jax.random.PRNGKey(0)
    v = pipe._cfg_v_pred(pipe.params, lat, t, clp, ehs, depth, 4.0, key,
                         scale_input=lambda x: x)
    v8 = pipe8._cfg_v_pred(pipe8.params, lat, t, clp, ehs, depth, 4.0, key,
                           scale_input=lambda x: x)
    assert np.isfinite(np.asarray(v8)).all()
    np.testing.assert_allclose(np.asarray(v8), np.asarray(v), atol=1e-5)


# NOTE (measured): a pipeline-level int8-vs-exact v_pred comparison with
# RANDOMIZED ControlNet output projections lands at ~0.79 relative error —
# NOT a scheme flaw but a random-weights artifact: ~0.15 module-level hint
# error under random weights (no trained robustness, heavy activation
# tails) amplified ~4-5x by the CFG arithmetic v_u + g*(v_c - v_u). Real
# trained checkpoints typically sit at ~1% per-layer W8A8 error; until real
# weights exist to measure against, optim.int8_controlnet stays opt-in and
# the caveat lives in core/config.py + docs/PERF.md.


@pytest.mark.slow
def test_int8_teacher_under_tp_mesh_matches_unsharded(monkeypatch):
    """int8 quantization composes with GSPMD: the quantized teacher under
    TP-sharded params equals the unsharded quantized teacher (the dynamic
    per-row/tensor amax reductions span sharded operands, so XLA must insert
    the right collectives around the int8 ops)."""
    monkeypatch.delenv("CTN_FAST_TINY_INIT", raising=False)
    import jax.numpy as jnp

    from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline
    from contexture_nerf_tpu.parallel.mesh import create_mesh
    from contexture_nerf_tpu.parallel.tp import (shard_params_tp,
                                                 tp_param_specs)

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    pipe = Zero123PlusPipeline(tiny=True, seed=0, int8_controlnet=True)
    key = jax.random.PRNGKey(1)
    lat = jax.random.normal(key, (1, 4, 24, 16)) * 0.3
    t = jnp.asarray([300], jnp.int32)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8)) * 0.2
    ehs = jax.random.normal(jax.random.PRNGKey(3),
                            (2, 77, pipe.text_config.hidden_size)) * 0.02
    depth = jax.random.uniform(jax.random.PRNGKey(4), (1, 3, 24 * 8, 16 * 8))

    def f(params):
        return pipe._cfg_v_pred(params, lat, t, cond, ehs, depth, 5.0,
                                key, scale_input=lambda x: x)

    baseline = jax.jit(f)(pipe.params)
    tp_mesh = create_mesh((8,), ("tp",))
    specs = tp_param_specs(pipe.params, tp_mesh)
    with tp_mesh:
        tp_params = shard_params_tp(pipe.params, tp_mesh)
        out = jax.jit(f, in_shardings=(specs,))(tp_params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(baseline),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_int8_unet_param_tree_invariant_and_close():
    """optim.int8_teacher quantizes the full denoiser UNet: the param tree is
    identical to the exact module (weights stay bf16/f32 masters) and the
    quantized forward tracks the exact one at W8A8-level error."""
    from contexture_nerf_tpu.diffusion.unet import UNet2DCondition, UNetConfig

    cfg = UNetConfig.tiny(in_channels=4)
    exact = UNet2DCondition(cfg, dtype=jnp.float32)
    quant = UNet2DCondition(cfg, dtype=jnp.float32, quant=True)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16, 16)) * 0.5
    ehs = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32)) * 0.1
    t = jnp.asarray([500], jnp.int32)
    params = jax.jit(exact.init)(jax.random.PRNGKey(0), lat, t, ehs)
    qparams = jax.jit(quant.init)(jax.random.PRNGKey(0), lat, t, ehs)
    assert jax.tree.structure(qparams) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(qparams), jax.tree.leaves(params)):
        assert a.shape == b.shape and a.dtype == b.dtype

    out_e = exact.apply(params, lat, t, ehs)
    out_q = quant.apply(params, lat, t, ehs)
    assert np.isfinite(np.asarray(out_q)).all()
    # random weights lack trained quantization robustness; bound the drift
    # rather than demand trained-checkpoint-level (~1%) accuracy
    assert _rel_err(out_q, out_e) < 0.25, _rel_err(out_q, out_e)


@pytest.mark.slow
def test_int8_teacher_config_knob(tmp_path):
    """optim.int8_teacher reaches the UNet AND implies the ControlNet path;
    one production SDS step through the fully quantized teacher stays
    finite."""
    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from tools.make_shapes import uv_sphere, write_obj

    sphere = tmp_path / "sphere.obj"
    write_obj(sphere, *uv_sphere(6, 8))
    cfg = config_from_dict({
        "log": {"exp_name": "q8", "exp_root": str(tmp_path / "exp"),
                "log_images": False, "save_mesh": False},
        "render": {"train_grid_size": 32, "eval_grid_size": 32},
        "guide": {"text": "q8", "shape_path": str(sphere),
                  "texture_resolution": 16},
        "optim": {"seed": 0, "sds_iterations": 1, "int8_teacher": True},
    })
    assert cfg.optim.int8_teacher is True
    trainer = ConTEXTure(cfg, tiny_models=True, backend="xla")
    assert trainer.zero123plus.unet.quant is True
    assert trainer.zero123plus.controlnet.quant is True

    setup = trainer.prepare_sds(skip_bootstrap=True)
    step, optimizer, hot = trainer._build_sds_step(setup, None)
    params = trainer.texture_params
    opt_state = optimizer.init(params)
    params, _, loss, grad_norm, _, _ = step(
        params, opt_state, jnp.asarray([500], jnp.int32),
        jax.random.PRNGKey(0), hot)
    assert np.isfinite(float(loss)) and np.isfinite(float(grad_norm))


@pytest.mark.slow
def test_config_knob_reaches_pipeline(tmp_path):
    from contexture_nerf_tpu.core.config import config_from_dict
    from tools.make_shapes import uv_sphere, write_obj

    sphere = tmp_path / "sphere.obj"
    write_obj(sphere, *uv_sphere(6, 8))
    cfg = config_from_dict({
        "log": {"exp_name": "q", "exp_root": str(tmp_path / "exp"),
                "log_images": False, "save_mesh": False},
        "render": {"train_grid_size": 32, "eval_grid_size": 32},
        "guide": {"text": "q", "shape_path": str(sphere),
                  "texture_resolution": 16},
        "optim": {"seed": 0, "sds_iterations": 1, "int8_controlnet": True},
    })
    assert cfg.optim.int8_controlnet is True
    from contexture_nerf_tpu.training.trainer import ConTEXTure

    trainer = ConTEXTure(cfg, tiny_models=True, backend="xla")
    assert trainer.zero123plus.controlnet.quant is True

    # one PRODUCTION SDS step through the quantized teacher: finite loss,
    # finite updated params
    import jax.numpy as jnp

    setup = trainer.prepare_sds(skip_bootstrap=True)
    step, optimizer, hot = trainer._build_sds_step(setup, None)
    params = trainer.texture_params
    opt_state = optimizer.init(params)
    params, _, loss, grad_norm, _, _ = step(
        params, opt_state, jnp.asarray([500], jnp.int32),
        jax.random.PRNGKey(0), hot)
    assert np.isfinite(float(loss)) and np.isfinite(float(grad_norm))
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree.leaves(params))
