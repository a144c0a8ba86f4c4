"""End-to-end: full pipeline with tiny models on a procedural sphere +
multi-chip dry run + graft entry traceability.

This is the milestone test from SURVEY.md §7: OBJ load -> raster -> texture
MLP -> grid -> VAE -> Zero123++ teacher (random weights) -> SDS -> adam ->
eval/export, end to end on CPU."""

import os
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy compiles; excluded from the core gate

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="module")
def sphere_obj(tmp_path_factory):
    from tools.make_shapes import uv_sphere, write_obj

    d = tmp_path_factory.mktemp("shapes")
    p = d / "sphere.obj"
    write_obj(p, *uv_sphere(8, 12))
    return str(p)


def _tiny_cfg(sphere_obj, tmp_path, iters=2):
    from contexture_nerf_tpu.core.config import config_from_dict

    return config_from_dict({
        "log": {"exp_name": "e2e_tiny", "exp_root": str(tmp_path),
                "eval_size": 2, "full_eval_size": 2, "log_images": False},
        "render": {"train_grid_size": 48, "eval_grid_size": 48},
        "guide": {"text": "a tiny test prompt", "shape_path": sphere_obj,
                  "texture_resolution": 16},
        "optim": {"seed": 0, "sds_iterations": iters},
    })


def test_full_pipeline_tiny(sphere_obj, tmp_path):
    from contexture_nerf_tpu.training.trainer import ConTEXTure

    cfg = _tiny_cfg(sphere_obj, tmp_path)
    trainer = ConTEXTure(cfg, tiny_models=True, backend="xla")
    params_before = jax.tree.leaves(trainer.texture_params)
    trainer.paint()
    params_after = jax.tree.leaves(trainer.texture_params)

    # parameters moved (SDS actually optimized)
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                for a, b in zip(params_before, params_after))
    assert np.isfinite(moved) and moved > 0

    exp = Path(cfg.log.exp_dir)
    assert (exp / "config.yaml").exists()
    assert (exp / "metrics.json").exists()
    assert (exp / "mesh" / "mesh.obj").exists()
    assert (exp / "mesh" / "albedo.png").exists()
    vids = (list((exp / "results").glob("*.mp4"))
            + list((exp / "results").glob("*.gif")))
    assert vids, "turntable video missing"
    assert list((exp / "checkpoints").glob("iter_*")), "no checkpoint saved"


def test_dryrun_multichip_cpu8():
    import __graft_entry__ as ge

    n = min(8, jax.device_count())
    ge.dryrun_multichip(n)


def test_entry_traceable():
    os.environ["GRAFT_ENTRY_TINY"] = "1"
    try:
        import __graft_entry__ as ge

        fn, args = ge.entry()
        shape = jax.eval_shape(fn, *args)
        assert shape.shape == (1, 4, 24, 16)
    finally:
        os.environ.pop("GRAFT_ENTRY_TINY", None)


def test_full_pipeline_tiny_exact_lattice(sphere_obj, tmp_path):
    """The reference-exact lattice/bilinear student render path stays live."""
    from contexture_nerf_tpu.training.trainer import ConTEXTure

    cfg = _tiny_cfg(sphere_obj, tmp_path, iters=1)
    cfg.log.exp_name = "e2e_tiny_exact"
    cfg.optim.exact_lattice_render = True
    cfg.log.save_mesh = False
    trainer = ConTEXTure(cfg, tiny_models=True, backend="xla")
    trainer.paint()
    assert (Path(cfg.log.exp_dir) / "metrics.json").exists()


def test_resume_matches_uninterrupted(sphere_obj, tmp_path):
    """A run interrupted at iter 2 and resumed must produce the same final
    params and metrics as the uninterrupted run (full-fidelity checkpoints:
    params + opt_state + RNG key; reference has none, SURVEY.md §5)."""
    import json
    import shutil

    from contexture_nerf_tpu.training.trainer import ConTEXTure

    cfg = _tiny_cfg(sphere_obj, tmp_path, iters=4)
    cfg.log.exp_name = "e2e_resume_eq"
    cfg.log.save_mesh = False
    cfg.log.full_eval_size = 1
    cfg.optim.checkpoint_interval = 2
    trainer_a = ConTEXTure(cfg, tiny_models=True, backend="xla")
    trainer_a.paint()
    params_a = jax.tree.leaves(trainer_a.texture_params)
    metrics_a = json.loads((Path(cfg.log.exp_dir) / "metrics.json")
                           .read_text())

    # simulate the interruption: drop the final checkpoint, keep iter 2
    exp = Path(cfg.log.exp_dir)
    shutil.rmtree(exp / "checkpoints" / "iter_000004")
    assert (exp / "checkpoints" / "iter_000002").exists()

    cfg.optim.resume = True
    trainer_b = ConTEXTure(cfg, tiny_models=True, backend="xla")
    trainer_b.paint()  # replays iterations 2..3 from the checkpoint
    params_b = jax.tree.leaves(trainer_b.texture_params)
    metrics_b = json.loads((exp / "metrics.json").read_text())

    for a, b in zip(params_a, params_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    last_a = [m for m in metrics_a if m["iter"] == 3][0]
    last_b = [m for m in metrics_b if m["iter"] == 3][0]
    for k in ("sds_loss", "grad_norm", "fisher_divergence_t", "t",
              "view_consistency"):
        np.testing.assert_allclose(last_a[k], last_b[k], rtol=1e-6,
                                   err_msg=k)


def test_resume_from_checkpoint(sphere_obj, tmp_path):
    from contexture_nerf_tpu.core import checkpoint as ckpt
    from contexture_nerf_tpu.training.trainer import ConTEXTure

    cfg = _tiny_cfg(sphere_obj, tmp_path, iters=3)
    cfg.log.exp_name = "e2e_resume"
    cfg.log.save_mesh = False
    trainer = ConTEXTure(cfg, tiny_models=True, backend="xla")
    # seed a checkpoint at iteration 2, then resume
    trainer.save_checkpoint(trainer.texture_params, None, 2)
    assert ckpt.latest_iteration(trainer.ckpt_path) == 2
    cfg.optim.resume = True
    trainer.paint()  # runs only iteration 2
    assert (Path(cfg.log.exp_dir) / "metrics.json").exists()
