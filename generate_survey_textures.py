"""Survey-texture batch driver (reference: generate_survey_textures.py).

Loops mesh x prompt pairs, runs the full paint per pair, then renders the 7
canonical views, crops/pads/resizes to 320^2, and writes per-prompt PNGs.
Retries each experiment a bounded number of times (the reference's loop
retries forever; bounded here so batch jobs terminate)."""

import traceback
from pathlib import Path

import numpy as np

SURVEY = [
    ("shapes/spot_triangulated.obj", "a photo of a dairy cow"),
    ("shapes/bunny.obj", "a ceramic easter bunny"),
    ("shapes/nascar.obj", "a photo of a nascar racing car"),
]
MAX_RETRIES = 3


def run_one(shape_path: str, prompt: str, out_dir: Path):
    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.ops.image import (crop_and_resize,
                                               get_nonzero_region_tuple,
                                               tensor2numpy)
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from PIL import Image

    name = Path(shape_path).stem + "_" + "".join(
        c for c in prompt if c.isalnum() or c == " ").replace(" ", "_")[:40]
    cfg = config_from_dict({
        "log": {"exp_name": f"survey_{name}"},
        "guide": {"text": prompt, "shape_path": shape_path},
    })
    trainer = ConTEXTure(cfg)
    trainer.paint()

    # render the 7 canonical views at 320^2 crops
    poses = trainer.dataloaders["train"].poses()
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, pose in enumerate(poses):
        out = trainer.mesh_model.render(
            trainer.texture_params, theta=pose["theta"], phi=pose["phi"],
            radius=pose["radius"], background="white")
        mask = np.asarray(out["mask"][0, 0])
        bbox = get_nonzero_region_tuple(mask)
        tile = crop_and_resize(out["image"], bbox, 320, 320)
        Image.fromarray(tensor2numpy(np.asarray(tile[0]).transpose(1, 2, 0))
                        ).save(out_dir / f"{name}_view{i}.png")


def main():
    out_dir = Path("experiments/survey_renders")
    for shape_path, prompt in SURVEY:
        if not Path(shape_path).exists():
            print(f"skip missing mesh {shape_path}")
            continue
        for attempt in range(MAX_RETRIES):
            try:
                run_one(shape_path, prompt, out_dir)
                break
            except Exception:
                traceback.print_exc()
                print(f"retry {attempt + 1}/{MAX_RETRIES} for {shape_path}")


if __name__ == "__main__":
    main()
