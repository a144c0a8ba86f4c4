"""Run-config fidelity guard (VERDICT r4 next-round item #4).

Every reference run config (/root/reference/configs/text_guided/*.yaml,
reference train_config schema at src/configs/train_config.py:7-133) must have
a same-named mirror in configs/text_guided/ that resolves to the SAME
effective TrainConfig when both are pushed through our loader.

Stale-key exceptions (documented in SURVEY.md §5 and the mirror headers):
mickey/beachball carry guidance_scale_crossattn/concat/control keys that the
reference's own pyrallis would reject — our loader warns-and-ignores them, so
"same effective config" already holds for those files by construction.
"""
from pathlib import Path

import pytest
import yaml

REFERENCE_CONFIGS = Path("/root/reference/configs/text_guided")
REPO_CONFIGS = Path(__file__).resolve().parent.parent / "configs" / "text_guided"

reference_names = (
    sorted(p.stem for p in REFERENCE_CONFIGS.glob("*.yaml"))
    if REFERENCE_CONFIGS.is_dir() else []
)


@pytest.mark.skipif(not reference_names, reason="reference checkout absent")
def test_every_reference_config_has_a_mirror():
    missing = [n for n in reference_names
               if not (REPO_CONFIGS / f"{n}.yaml").exists()]
    assert not missing, f"unmirrored reference configs: {missing}"


@pytest.mark.skipif(not reference_names, reason="reference checkout absent")
@pytest.mark.parametrize("name", reference_names)
def test_mirror_resolves_to_same_effective_config(name):
    from contexture_nerf_tpu.core.config import config_from_dict, config_to_dict

    ref_path = REFERENCE_CONFIGS / f"{name}.yaml"
    repo_path = REPO_CONFIGS / f"{name}.yaml"
    assert repo_path.exists(), f"missing mirror for {name}"

    ref_cfg = config_from_dict(yaml.safe_load(ref_path.read_text()))
    repo_cfg = config_from_dict(yaml.safe_load(repo_path.read_text()))

    ref_d, repo_d = config_to_dict(ref_cfg), config_to_dict(repo_cfg)
    diffs = []
    for section in sorted(set(ref_d) | set(repo_d)):
        rs, os_ = ref_d.get(section, {}), repo_d.get(section, {})
        for key in sorted(set(rs) | set(os_)):
            if rs.get(key) != os_.get(key):
                diffs.append(f"{section}.{key}: ref={rs.get(key)!r} "
                             f"repo={os_.get(key)!r}")
    assert not diffs, f"{name}.yaml drifted from reference:\n" + "\n".join(diffs)
