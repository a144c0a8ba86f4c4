"""optim.local_sds_grad — tile-local SDS backward (training/trainer.py
render_grid_latent_local).

The SDS loss reads ONE latent tile per iteration (reference
/root/reference/src/training/trainer.py:840-854) while the default backward
runs through the full-canvas VAE encode + MLP query. The local path keeps
the forward identical and restricts the backward to a margin-padded slice.
Pinned here: (a) a slice covering the whole canvas reproduces the default
step exactly; (b) the loss value is identical at ANY margin (the forward is
shared); (c) small margins still produce finite, non-zero gradients;
(d) config validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contexture_nerf_tpu.core.config import config_from_dict
from contexture_nerf_tpu.training.trainer import ConTEXTure
from tools.make_shapes import uv_sphere, write_obj

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the core gate


def make_trainer(tmp_path, **optim):
    sphere = tmp_path / "sphere.obj"
    if not sphere.exists():
        write_obj(sphere, *uv_sphere(6, 8))
    cfg = config_from_dict({
        "log": {"exp_name": "localgrad", "exp_root": str(tmp_path / "exp"),
                "log_images": False, "save_mesh": False},
        "render": {"train_grid_size": 32, "eval_grid_size": 32},
        "guide": {"text": "localgrad", "shape_path": str(sphere),
                  "texture_resolution": 16},
        "optim": {"seed": 0, "sds_iterations": 1, **optim},
    })
    return ConTEXTure(cfg, tiny_models=True, backend="xla")


def run_step(trainer, setup=None):
    setup = setup or trainer.prepare_sds(skip_bootstrap=True)
    step, optimizer, hot = trainer._build_sds_step(setup, None)
    params = trainer.texture_params
    opt_state = optimizer.init(params)
    out = step(params, opt_state, jnp.asarray([500], jnp.int32),
               jax.random.PRNGKey(3), hot)
    jax.block_until_ready(out[2])
    return out, setup


def test_full_margin_reproduces_default_step(tmp_path):
    """Margin >= canvas -> the local backward sees the whole grid, so the
    step (loss, grad norm, updated params) matches the default path up to
    float reassociation."""
    tr_d = make_trainer(tmp_path)
    (p_d, _, loss_d, gn_d, _, grid_d), setup = run_step(tr_d)

    tr_l = make_trainer(tmp_path, local_sds_grad=True,
                        local_sds_margin_px=1024)
    (p_l, _, loss_l, gn_l, _, grid_l), _ = run_step(tr_l)

    np.testing.assert_allclose(float(loss_l), float(loss_d), rtol=1e-5)
    np.testing.assert_allclose(float(gn_l), float(gn_d), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grid_l), np.asarray(grid_d),
                               atol=1e-5)
    lr = tr_d.cfg.optim.sds_lr
    for a, b in zip(jax.tree.leaves(p_l), jax.tree.leaves(p_d)):
        # adam's sign-like first step bounds reassociation drift at ~lr
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3 * lr)


def test_small_margin_identical_forward_finite_grads(tmp_path):
    """At a small margin the loss value is still identical to the default
    path (the forward is the shared full-canvas graph) and the gradient is
    finite and non-zero."""
    tr_d = make_trainer(tmp_path)
    (_, _, loss_d, _, _, _), _ = run_step(tr_d)

    # tiny VAE downsamples 2x; margin 4 px -> slice 40x40 of the 96x64 grid
    tr_l = make_trainer(tmp_path, local_sds_grad=True,
                        local_sds_margin_px=4)
    (p_l, _, loss_l, gn_l, _, _), _ = run_step(tr_l)

    np.testing.assert_allclose(float(loss_l), float(loss_d), rtol=1e-5)
    assert np.isfinite(float(gn_l)) and float(gn_l) > 0.0
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree.leaves(p_l))


def test_local_grad_composes_with_precomputed_embedding(tmp_path,
                                                        monkeypatch):
    """local_sds_grad + precompute_uv_embedding: the full-canvas forward
    goes through the precomputed-embedding kernel AND the differentiable
    patch slices its rows out of the same embedding — the loss must match
    the plain local path (same forward graph value) and the step must stay
    finite. Interpret mode stands in for the TPU kernel."""
    import contexture_nerf_tpu.training.trainer as trainer_mod

    tr_l = make_trainer(tmp_path, local_sds_grad=True,
                        local_sds_margin_px=4)
    (_, _, loss_l, gn_l, _, _), _ = run_step(tr_l)

    monkeypatch.setattr(trainer_mod, "_FUSED_EMB_INTERPRET", True)
    tr_e = make_trainer(tmp_path, local_sds_grad=True,
                        local_sds_margin_px=4,
                        precompute_uv_embedding=True)
    setup_e = tr_e.prepare_sds(skip_bootstrap=True)
    assert setup_e["emb_pts"] is not None
    (p_e, _, loss_e, gn_e, _, _), _ = run_step(tr_e, setup_e)

    np.testing.assert_allclose(float(loss_e), float(loss_l), rtol=2e-2)
    assert np.isfinite(float(gn_e)) and float(gn_e) > 0.0
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree.leaves(p_e))


def test_local_grad_composes_with_data_parallel(tmp_path):
    """local_sds_grad under the 8-device views mesh: the dynamic-sliced
    backward path must produce the same step as the unsharded local path
    (the canvas tensors are spatially sharded; the slices cross shard
    boundaries)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    tr = make_trainer(tmp_path, local_sds_grad=True, local_sds_margin_px=4)
    (p_1, _, loss_1, gn_1, _, _), _ = run_step(tr)

    tr_dp = make_trainer(tmp_path, local_sds_grad=True,
                         local_sds_margin_px=4, data_parallel="on")
    mesh = tr_dp._make_mesh()
    assert mesh is not None and mesh.shape["views"] == 8
    setup = tr_dp.prepare_sds(skip_bootstrap=True)
    step, optimizer, hot = tr_dp._build_sds_step(setup, mesh)
    rep = NamedSharding(mesh, P())
    params = jax.device_put(tr_dp.texture_params, rep)
    opt_state = jax.device_put(optimizer.init(params), rep)
    p_8, _, loss_8, gn_8, _, _ = step(
        params, opt_state, jnp.asarray([500], jnp.int32),
        jax.random.PRNGKey(3), hot)

    np.testing.assert_allclose(float(loss_8), float(loss_1), rtol=1e-4)
    np.testing.assert_allclose(float(gn_8), float(gn_1), rtol=1e-3)
    for a, b in zip(jax.tree.leaves(p_8), jax.tree.leaves(p_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3 * tr.cfg.optim.sds_lr)


def test_margin_must_be_latent_aligned(tmp_path):
    tr = make_trainer(tmp_path, local_sds_grad=True, local_sds_margin_px=3)
    setup = tr.prepare_sds(skip_bootstrap=True)
    with pytest.raises(ValueError, match="multiple"):
        tr._build_sds_step(setup, None)


def test_local_grad_falls_back_under_exact_lattice_render(tmp_path, caplog):
    """exact_lattice_render is a reference-exactness request: it disables
    the (r5 default-on) local_sds_grad with a warning instead of erroring —
    the step builds and the backward is the full-canvas exact one."""
    import logging

    tr = make_trainer(tmp_path, local_sds_grad=True,
                      exact_lattice_render=True)
    setup = tr.prepare_sds(skip_bootstrap=True)
    with caplog.at_level(logging.WARNING, logger="contexture_nerf_tpu"):
        step, optimizer, hot = tr._build_sds_step(setup, None)
    assert any("disabling" in r.message and "local_sds_grad" in r.message
               for r in caplog.records)
    assert step is not None
