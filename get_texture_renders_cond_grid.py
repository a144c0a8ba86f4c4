"""Batch driver: paint a survey of mesh x prompt pairs, then export the 7
canonical Zero123++ view renders as uniform 320^2 crops per prompt
(reference: get_texture_renders_cond_grid.py:1-264).

Differences from the reference by design:
  - composition goes through config_from_dict instead of temp-YAML + pyrallis
    re-exec (same schema);
  - crops are padded to the batch's max bbox then resized on device
    (reference round-trips through PIL per image);
  - the texfusion/Renderpeople binary assets are not in either repo; pairs
    whose mesh is missing use a procedural stand-in when one exists
    (tools/make_shapes.ensure_shape) and are skipped otherwise;
  - bounded retries (the reference's outer loop is commented out there).
"""

import math
import sys
import traceback
from pathlib import Path

import numpy as np

# mesh x prompt survey (reference pairs list, get_texture_renders_cond_grid.py:36-113;
# trimmed to the meshes this repo can stand in for)
PAIRS = [
    {
        "prompts": [
            "a photo of spiderman",
            "a caricature of a pirate with a large hat and eye patch",
            "a whimsical wizard with a pointed hat, dark shadow",
            "a cartoon astronaut with a bubbly space helmet",
        ],
        "path": "shapes/human.obj",
    },
    {
        "prompts": [
            "white humanoid robot, movie poster, main character of a science fiction movie",
            "comic book superhero, red body suit",
        ],
        "path": "shapes/human.obj",
        "front_offset": -90.0,
    },
]

# the 7 canonical Zero123++ poses (reference :203-211)
CANONICAL_PHIS = [0, 30, 90, 150, 210, 270, 330]
MAX_RETRIES = 3


def canonical_theta(phi_deg: float) -> float:
    if phi_deg in (30, 150, 270):
        return math.radians(90 - 30)
    if phi_deg in (90, 210, 330):
        return math.radians(90 + 20)
    return math.radians(60)


def run_one(pair, prompt: str, out_root: Path):
    import jax.numpy as jnp
    from PIL import Image

    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.ops.image import (get_nonzero_region_tuple,
                                               pad_tensor_to_size,
                                               resize_bilinear, tensor2numpy)
    from contexture_nerf_tpu.training.trainer import ConTEXTure

    exp_name = f"{Path(pair['path']).stem}_" + "".join(
        c for c in prompt if c.isalnum() or c == " ").replace(" ", "_")[:40]
    data = {
        "log": {"exp_name": exp_name},
        "guide": {"text": prompt, "shape_path": pair["path"],
                  "guidance_scale": 10, "use_zero123plus": True},
        "optim": {"learn_max_z_normals": True},
    }
    if "front_offset" in pair:
        data["render"] = {"front_offset": pair["front_offset"]}
    cfg = config_from_dict(data)
    trainer = ConTEXTure(cfg)
    if cfg.log.eval_only:
        trainer.full_eval()
    else:
        trainer.paint()

    background = jnp.array([0.5, 0.5, 0.5])
    renders = []
    for phi in CANONICAL_PHIS:
        outputs = trainer.mesh_model.render(
            trainer.texture_params, theta=canonical_theta(phi),
            phi=math.radians(phi), radius=1.5, background=background)
        renders.append({"image": outputs["image"], "mask": outputs["mask"]})

    # white-composite, crop to per-view bbox, pad to the batch max, 320^2
    cropped = []
    max_h = max_w = 0
    for r in renders:
        rgba = r["image"] * r["mask"] + (1.0 - r["mask"])
        mh, mw, Mh, Mw = get_nonzero_region_tuple(
            np.asarray(r["mask"][0, 0]))
        crop = rgba[:, :, mh:Mh, mw:Mw]
        cropped.append(crop)
        max_h = max(max_h, crop.shape[-2])
        max_w = max(max_w, crop.shape[-1])

    out_dir = out_root / Path(pair["path"]).stem / exp_name
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, crop in enumerate(cropped):
        uniform = pad_tensor_to_size(crop, max_h, max_w)
        tile = resize_bilinear(uniform, 320, 320)
        Image.fromarray(tensor2numpy(np.asarray(tile[0]).transpose(1, 2, 0))
                        ).save(out_dir / f"rendered_image_{i}.png")
    print(f"wrote 7 canonical renders to {out_dir}")


def main():
    from tools.make_shapes import ensure_shape

    out_root = Path("experiments/texture_renders")
    for pair in PAIRS:
        if not ensure_shape(pair["path"]):
            print(f"skip {pair['path']}: mesh missing, no stand-in")
            continue
        for prompt in pair["prompts"]:
            for attempt in range(MAX_RETRIES):
                try:
                    run_one(pair, prompt, out_root)
                    break
                except KeyboardInterrupt:
                    sys.exit(0)
                except Exception:
                    traceback.print_exc()
                    print(f"retry {attempt + 1}/{MAX_RETRIES} for {prompt}")


if __name__ == "__main__":
    main()
