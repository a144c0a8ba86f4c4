"""core/imagewriter.py — async image logging (the loop thread must never
block on device->host fetch + PNG encode + disk IO; reference writes
synchronously in-loop, trainer.py:902-904,1162-1218)."""

import threading
from pathlib import Path
import time

import numpy as np
import pytest

from contexture_nerf_tpu.core.imagewriter import AsyncImageWriter, sync_writer


def test_writes_complete_and_order_preserved(tmp_path):
    w = AsyncImageWriter()
    written = []

    def make_fn(i):
        def fn(arr):
            assert arr.shape == (2, 2)
            written.append(i)
            (tmp_path / f"img_{i}.txt").write_text(str(arr.sum()))
        return fn

    for i in range(10):
        w.submit(np.full((2, 2), i, np.float32), make_fn(i))
    w.flush()
    assert written == list(range(10))  # single worker: submission order
    assert len(list(tmp_path.glob("img_*.txt"))) == 10


def test_exception_surfaces_at_flush():
    w = AsyncImageWriter()

    def bad(arr):
        raise ValueError("Tensor contains NaNs")

    w.submit(np.ones((1,)), bad)
    with pytest.raises(ValueError, match="NaNs"):
        w.flush()
    # writer stays usable after a failure
    w.submit(np.ones((1,)), lambda a: None)
    w.flush()


def test_exception_surfaces_at_later_submit():
    w = AsyncImageWriter(max_pending=1)

    def bad(arr):
        raise RuntimeError("disk full")

    w.submit(np.ones((1,)), bad)
    time.sleep(0.05)
    with pytest.raises(RuntimeError, match="disk full"):
        # either reaped-as-done or hit via backpressure — both must raise
        w.submit(np.ones((1,)), lambda a: None)
        w.submit(np.ones((1,)), lambda a: None)
        w.flush()


def test_backpressure_bounds_pending():
    w = AsyncImageWriter(max_pending=2)
    gate = threading.Event()
    done = []

    def slow(arr):
        gate.wait(5)
        done.append(1)

    w.submit(np.ones((1,)), slow)
    w.submit(np.ones((1,)), slow)
    t0 = time.perf_counter()
    gate.set()
    w.submit(np.ones((1,)), slow)  # must wait for a slot, then proceed
    w.flush()
    assert len(done) == 3
    assert time.perf_counter() - t0 < 5


def test_jax_array_submission(tmp_path):
    import jax.numpy as jnp

    w = AsyncImageWriter()
    out = {}
    w.submit(jnp.arange(4.0), lambda a: out.setdefault("sum", float(a.sum())))
    w.flush()
    assert out["sum"] == 6.0


def test_sync_writer_inline():
    w = sync_writer()
    seen = []
    w.submit(np.ones((2,)), lambda a: seen.append(a.sum()))
    assert seen == [2.0]  # ran inline, before submit returned
    w.flush()
    w.close()


@pytest.mark.slow
def test_trainer_async_logging_produces_artifacts(tmp_path):
    """Tiny paint with log_images=True: the async writer must land the
    texture-map PNGs and debug grid JPGs before paint() returns (flush at
    the loop/full_eval boundaries)."""
    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.core.imagewriter import AsyncImageWriter
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from tools.make_shapes import uv_sphere, write_obj

    sphere = tmp_path / "sphere.obj"
    write_obj(sphere, *uv_sphere(6, 8))
    cfg = config_from_dict({
        "log": {"exp_name": "imgw", "exp_root": str(tmp_path / "exp"),
                "eval_size": 1, "full_eval_size": 1, "log_images": True,
                "save_mesh": False},
        "render": {"train_grid_size": 32, "eval_grid_size": 32},
        "guide": {"text": "imgw", "shape_path": str(sphere),
                  "texture_resolution": 16},
        "optim": {"seed": 0, "sds_iterations": 2},
    })
    trainer = ConTEXTure(cfg, tiny_models=True, backend="xla")
    assert isinstance(trainer._img_writer, AsyncImageWriter)
    trainer.paint()

    vis = Path(cfg.log.exp_dir) / "vis" / "train"
    assert list(vis.glob("texture_map_iter_*.png")), "texture map not logged"
    assert list(vis.glob("debug_rendered_grid_clean_*.jpg")), \
        "train grid not logged"
