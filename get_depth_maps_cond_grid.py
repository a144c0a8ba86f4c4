"""Depth-grid + front-cond-image driver (reference: get_depth_maps_cond_grid.py).

Renders the 7 canonical Zero123++ views of a mesh, writes the 3x2 depth grid
PNG, and produces the SD2-depth front conditioning image. The reference used
an external CompVis `ldm` checkout for the cond image (:252-255); here the
in-framework SD2-depth img2img path is used."""

import argparse
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from contexture_nerf_tpu.core.config import config_from_dict
from contexture_nerf_tpu.ops.grid import merge_6_to_grid
from contexture_nerf_tpu.ops.image import (crop_and_resize,
                                           get_nonzero_region_tuple,
                                           tensor2numpy)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape_path", default="shapes/spot_triangulated.obj")
    ap.add_argument("--text", default="a photo of a cow")
    ap.add_argument("--out_dir", default="experiments/depth_grids")
    ap.add_argument("--tiny", action="store_true",
                    help="test-size diffusion models")
    args = ap.parse_args()

    from PIL import Image

    from contexture_nerf_tpu.training.trainer import ConTEXTure

    cfg = config_from_dict({
        "log": {"exp_name": "depth_grid"},
        "guide": {"text": args.text, "shape_path": args.shape_path},
    })
    trainer = ConTEXTure(cfg, tiny_models=args.tiny)
    trainer.define_view_weights()
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    cache = trainer._geometry_cache
    depth = 1.0 - cache.depth_map
    masks = cache.mask
    B = depth.shape[0]
    masks_np = np.asarray(masks[:, 0])

    tiles = []
    for i in range(1, B):
        bbox = get_nonzero_region_tuple(masks_np[i])
        d = crop_and_resize(depth[i:i + 1], bbox, 320, 320)
        a = crop_and_resize(masks[i:i + 1], bbox, 320, 320)
        tiles.append(jnp.concatenate([d, d, d], 1) * a + 0.5 * (1 - a))
    grid = merge_6_to_grid(jnp.concatenate(tiles, 0))
    Image.fromarray(tensor2numpy(
        np.asarray(grid[0]).transpose(1, 2, 0))).save(
            out_dir / "depth_grid.png")

    # front conditioning image via SD2-depth img2img
    pose = trainer.dataloaders["train"].poses()[0]
    rgb, mask = trainer.paint_viewpoint(pose, should_project_back=False)
    bbox = get_nonzero_region_tuple(np.asarray(mask[0, 0]))
    rgb_c = crop_and_resize(rgb, bbox, 320, 320)
    a_c = crop_and_resize(mask, bbox, 320, 320)
    cond = rgb_c * a_c + 0.5 * (1 - a_c)
    Image.fromarray(tensor2numpy(
        np.asarray(cond[0]).transpose(1, 2, 0))).save(
            out_dir / "cond_image.png")
    print(f"wrote {out_dir}/depth_grid.png and cond_image.png")


if __name__ == "__main__":
    main()
