"""Ablation batch driver (reference: run_ablation_study.py:11-36).

Sweeps guidance scales over {1,3,5,7}^2, composing runs by writing temp YAML
configs — the same composition mechanism the reference uses."""

import itertools
import subprocess
import sys
import tempfile

import yaml

BASE = {
    "log": {"exp_name": "ablation"},
    "guide": {
        "text": "A photo of a nascar racing car",
        "shape_path": "shapes/nascar.obj",
        "use_zero123plus": True,
    },
}


def main():
    scales = [1, 3, 5, 7]
    for gi, gt in itertools.product(scales, scales):
        cfg = yaml.safe_load(yaml.safe_dump(BASE))
        cfg["guide"]["guidance_scale_i"] = gi
        cfg["guide"]["guidance_scale_t"] = gt
        cfg["guide"]["individual_control_of_conditions"] = True
        cfg["log"]["exp_name"] = f"ablation_gi{gi}_gt{gt}"
        with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                         delete=False) as f:
            yaml.safe_dump(cfg, f)
            path = f.name
        print(f"=== ablation gi={gi} gt={gt} -> {path}")
        subprocess.run([sys.executable, "-m", "scripts.run_contexture",
                        f"--config_path={path}"], check=False)


if __name__ == "__main__":
    main()
