"""CLI entry (reference: scripts/run_contexture.py:1-17).

Usage (same contract as the reference, pyrallis-style):
    python -m scripts.run_contexture --config_path=configs/text_guided/napoleon.yaml
    python -m scripts.run_contexture --config_path=... --log.eval_only=true
"""

from contexture_nerf_tpu.core.config import load_config
from contexture_nerf_tpu.training.trainer import ConTEXTure


def main(argv=None):
    cfg = load_config(argv)
    trainer = ConTEXTure(cfg)
    if cfg.log.eval_only:
        trainer.full_eval()
    else:
        trainer.paint()


if __name__ == "__main__":
    main()
