"""Visual semantic smoke: SDS paints a sphere the color the teacher asks for.

Random diffusion weights make every full-pipeline artifact in experiments/
a noise field (no public checkpoints in this zero-egress environment), so
this tool substitutes a *trained-by-construction* teacher — its
v-prediction is exactly the velocity consistent with a fixed target latent
(the encoding of a solid-red render) — and runs the PRODUCTION SDS step
(MLP student -> grid -> encode -> SDS grad -> adam) against it.

Why the VAE is swapped for a faithful-by-construction codec: a
randomly-initialized tiny VAE encoder is not injective, so pulling latents
toward E(red) does not pull PIXELS toward red (measured: the sphere
saturates a wrong pure channel while the latent distance contracts — that
latent-space contraction is tested in test_round3.py). A brief 400-step
autoencoder fit doesn't fix it either (measured decode(E(red)) =
(0.57,0.32,0.44) at AE loss 0.04). So the smoke uses FaithfulCodec — an
exactly-invertible-on-solid-colors linear encode (average-pool by the
config's downsample factor + injective channel map, zero sampling noise).
With it, latent convergence IS pixel convergence, and the sphere visibly
turns red through the production step graph. The day real SD-VAE weights
load (guide.zero123plus_path), the real VAE is near-faithful and the same
construction works unmodified on it.

Usage: python -m tools.semantic_smoke [--iters 200] [--out experiments/semantic_smoke]
Writes before.png / after.png (the 3x2 student grid), albedo_{before,after}.png
(the UV texture atlas), result.json; prints one JSON line.
"""

import argparse
import json
import tempfile
from pathlib import Path

import jax.numpy as jnp


class FaithfulCodec:
    """Duck-typed VAE stand-in (same .apply(params, x, method=...) calling
    convention as diffusion/vae.AutoencoderKL, params ignored).
    encode_moments: spatial average-pool by `factor` with channels
    (r, g, b, luma) — linear and injective on per-tile-constant images —
    and logvar=-20 (sampling noise ~e^-10). decode: nearest upsample of the
    rgb channels."""

    def __init__(self, factor: int):
        self.factor = factor

    def encode_moments(self, x):
        B, C, H, W = x.shape
        f = self.factor
        p = x.reshape(B, C, H // f, f, W // f, f).mean(axis=(3, 5))
        luma = p.mean(axis=1, keepdims=True)
        mean = jnp.concatenate([p, luma], axis=1)
        return mean, jnp.full_like(mean, -20.0)

    def decode(self, z):
        f = self.factor
        return jnp.repeat(jnp.repeat(z[:, :3], f, axis=2), f, axis=3)

    def apply(self, params, x, method=None):
        return method(x) if method is not None else self.decode(x)


def run(out_dir: Path, iters: int = 200, grid_size: int = 64,
        tex_res: int = 32, sds_lr: float = 2e-3) -> dict:
    import jax
    import numpy as np
    from PIL import Image

    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.diffusion.zero123plus import (scale_image,
                                                           scale_latents,
                                                           unscale_image)
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from tools.make_shapes import uv_sphere, write_obj

    tmp = Path(tempfile.mkdtemp(prefix="ctn_smoke_"))
    sphere = tmp / "sphere.obj"
    write_obj(sphere, *uv_sphere(12, 18))
    cfg = config_from_dict({
        "log": {"exp_name": "semantic_smoke", "exp_root": str(tmp / "exp"),
                "eval_size": 1, "full_eval_size": 1, "log_images": False,
                "save_mesh": False},
        "render": {"train_grid_size": grid_size, "eval_grid_size": grid_size},
        "guide": {"text": "smoke", "shape_path": str(sphere),
                  "texture_resolution": tex_res},
        "optim": {"seed": 0, "sds_iterations": 1, "sds_lr": sds_lr},
    })
    tr = ConTEXTure(cfg, tiny_models=True, backend="xla")
    pipe = tr.zero123plus
    vae_down = 2 ** (len(pipe.vae_config.block_out_channels) - 1)
    pipe.vae = FaithfulCodec(vae_down)

    setup = tr.prepare_sds(skip_bootstrap=True)
    acp = pipe.alphas_cumprod

    mask = setup["mask_grid"]
    target_rgb = jnp.stack([jnp.ones_like(mask[0, 0]),
                            0.2 * jnp.ones_like(mask[0, 0]),
                            0.2 * jnp.ones_like(mask[0, 0])])[None]
    target_grid = scale_image((target_rgb * mask + 0.5 * (1 - mask)) * 2 - 1)
    mean, _ = pipe.vae.encode_moments(target_grid)
    z_tgt = scale_latents(mean * pipe.vae_config.scaling_factor)

    def fake_cfg_v_pred(params, latents_noisy, t, cond_lat_pair, ehs, depth,
                        guidance_scale, key, scale_input, **kw):
        a = acp[t].reshape(-1, 1, 1, 1)
        eps = (latents_noisy - jnp.sqrt(a) * z_tgt) / jnp.sqrt(1 - a)
        return jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * z_tgt

    pipe._cfg_v_pred = fake_cfg_v_pred
    step, optimizer, hot = tr._build_sds_step(setup, None)
    params = tr.texture_params
    opt_state = optimizer.init(params)
    t = jnp.asarray([300], jnp.int32)
    key = jax.random.PRNGKey(0)

    out_dir.mkdir(parents=True, exist_ok=True)

    def save_grid(grid, name):
        rgb = np.asarray(unscale_image(grid) / 2 + 0.5)[0]
        rgb = np.clip(rgb.transpose(1, 2, 0), 0, 1)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(out_dir / name)
        m = np.asarray(mask)[0, 0] > 0.5
        return rgb[m].mean(axis=0)

    def save_albedo(p, name):
        tex, _ = tr.mesh_model.get_texture_map(p)
        tex = np.clip(np.asarray(tex), 0, 1)
        if tex.ndim == 4:
            tex = tex[0]
        if tex.shape[0] in (3, 4):
            tex = tex.transpose(1, 2, 0)[..., :3]
        Image.fromarray((tex * 255).astype(np.uint8)).save(out_dir / name)

    color_before = None
    save_albedo(params, "albedo_before.png")
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, loss, gn, fi, grid = step(params, opt_state, t,
                                                     sub, hot)
        if i == 0:
            color_before = save_grid(grid, "before.png")
    color_after = save_grid(grid, "after.png")
    save_albedo(params, "albedo_after.png")

    target = np.array([1.0, 0.2, 0.2])
    res = {
        "iters": iters,
        "color_before": [round(float(c), 4) for c in color_before],
        "color_after": [round(float(c), 4) for c in color_after],
        "target": target.tolist(),
        "err_before": round(float(np.abs(color_before - target).mean()), 4),
        "err_after": round(float(np.abs(color_after - target).mean()), 4),
    }
    (out_dir / "result.json").write_text(json.dumps(res, indent=1))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default="experiments/semantic_smoke")
    args = ap.parse_args()
    print(json.dumps(run(Path(args.out), args.iters)))


if __name__ == "__main__":
    main()
