"""CLI entry (reference: scripts/run_contexture.py:1-17).

Usage (same contract as the reference, pyrallis-style):
    python -m scripts.run_contexture --config_path=configs/text_guided/napoleon.yaml
    python -m scripts.run_contexture --config_path=... --log.eval_only=true
"""

import os

import jax

from contexture_nerf_tpu.core.config import load_config
from contexture_nerf_tpu.training.trainer import ConTEXTure


def main(argv=None):
    # persistent compilation cache: the SD2/Zero123++ graphs take minutes to
    # compile; cached, a rerun starts painting almost immediately
    cache_dir = os.environ.get("CTN_JAX_CACHE",
                               os.path.expanduser("~/.cache/ctnerf_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    cfg = load_config(argv)
    trainer = ConTEXTure(cfg)
    if cfg.log.eval_only:
        trainer.full_eval()
    else:
        trainer.paint()


if __name__ == "__main__":
    main()
