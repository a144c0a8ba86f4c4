"""Config schema parity with the reference (src/configs/train_config.py)."""

from pathlib import Path

from contexture_nerf_tpu.core.config import (TrainConfig, config_from_dict,
                                             config_to_dict, load_config)


def test_defaults_match_reference():
    cfg = TrainConfig()
    assert cfg.render.train_grid_size == 1200
    assert cfg.render.eval_grid_size == 1024
    assert cfg.render.radius == 1.5
    assert cfg.render.n_views == 8
    assert cfg.render.base_theta == 60
    assert cfg.render.views_after == [[180, 30], [180, 150]]
    assert cfg.render.alternate_views is True
    assert cfg.guide.diffusion_name == "stabilityai/stable-diffusion-2-depth"
    assert cfg.guide.use_zero123plus is True
    assert cfg.guide.shape_scale == 0.6
    assert cfg.guide.dy == 0.25
    assert cfg.guide.texture_resolution == 1024
    assert cfg.guide.guidance_scale == 7.5
    assert cfg.optim.seed == 0
    assert cfg.optim.min_timestep == 0.02
    assert cfg.optim.max_timestep == 0.98
    # reference parity: uniform tile draw (random.randint(0,5),
    # reference trainer.py:843); 'mixed' is the opt-in improvement
    assert cfg.optim.tile_weighting == "uniform"
    assert cfg.log.eval_size == 10
    assert cfg.log.full_eval_size == 100


def test_yaml_and_cli_overrides(tmp_path):
    yml = tmp_path / "c.yaml"
    yml.write_text(
        "log:\n  exp_name: napoleon\n"
        "guide:\n  text: a photo of napoleon\n  shape_path: shapes/nap.obj\n")
    cfg = load_config([f"--config_path={yml}", "--optim.seed", "3",
                       "--render.train_grid_size=768"])
    assert cfg.log.exp_name == "napoleon"
    assert cfg.guide.text == "a photo of napoleon"
    assert cfg.optim.seed == 3
    assert cfg.render.train_grid_size == 768
    assert cfg.log.exp_dir == Path("experiments/napoleon")


def test_roundtrip():
    cfg = TrainConfig()
    cfg.guide.text = "x"
    d = config_to_dict(cfg)
    cfg2 = config_from_dict(d)
    assert config_to_dict(cfg2) == d


def test_reference_yaml_configs_parse():
    """Every (non-stale) reference YAML must parse with our loader."""
    import yaml

    ref = Path("/root/reference/configs/text_guided")
    if not ref.exists():
        return
    stale = {"mickey.yaml", "beachball.yaml"}  # stale keys in reference repo
    for p in sorted(ref.glob("*.yaml")):
        if p.name in stale:
            continue
        cfg = config_from_dict(yaml.safe_load(p.read_text()))
        assert cfg.guide.text
