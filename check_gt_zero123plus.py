"""Zero123++ ground-truth smoke driver (reference: check_gt_zero123plus.py).

Runs the Zero123++ + depth-ControlNet generator on saved cond/depth grid
images and slices the 3x2 result into per-view PNGs."""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline
from contexture_nerf_tpu.ops.grid import split_grid_to_6
from contexture_nerf_tpu.ops.image import tensor2numpy


def load_image(path, size=None):
    from PIL import Image

    im = Image.open(path).convert("RGB")
    if size is not None:
        im = im.resize(size)
    arr = np.asarray(im, np.float32) / 255.0
    return jnp.asarray(arr.transpose(2, 0, 1))[None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cond", required=True, help="front cond image png")
    ap.add_argument("--depth_grid", required=True, help="3x2 depth grid png")
    ap.add_argument("--out_dir", default="experiments/zero123plus_gt")
    ap.add_argument("--steps", type=int, default=28)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from PIL import Image

    pipe = Zero123PlusPipeline(tiny=args.tiny, seed=0)
    cond = load_image(args.cond, (320, 320)) * 2 - 1
    depth = load_image(args.depth_grid, (640, 960))
    grid = pipe.generate(cond, depth, num_inference_steps=args.steps,
                         guidance_scale=4.0, key=jax.random.PRNGKey(0))
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    Image.fromarray(tensor2numpy(
        np.asarray(grid[0]).transpose(1, 2, 0))).save(out_dir / "grid.png")
    for i, tile in enumerate(split_grid_to_6(grid, 320)):
        Image.fromarray(tensor2numpy(
            np.asarray(tile).transpose(1, 2, 0))).save(
                out_dir / f"view_{i}.png")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
