"""Full-size architecture fidelity without weights: exact parameter counts.

The converter tests prove leaf-for-leaf structure against synthetic
snapshots at TINY size; this pins the FULL-SIZE configs against the
published Stable Diffusion 2 numbers (diffusers `stabilityai/
stable-diffusion-2-*`: UNet 865,910,724 params, VAE 83,653,863), so any
drift in block_out_channels / transformer depth / head counts is caught
before real checkpoints ever load. Shapes only — jax.eval_shape traces
init without allocating the 3.4 GB of f32 params.

Reference model loads: /root/reference/src/stable_diffusion_depth.py:58-74
(SD2-depth + SD2-inpainting), src/training/trainer.py:296-315 (Zero123++).
"""

import jax
import jax.numpy as jnp
import numpy as np

SD2_UNET_PARAMS = 865_910_724   # published SD2 UNet (4-ch latent input)
SD_VAE_PARAMS = 83_653_863      # published SD AutoencoderKL


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def _unet_count(cfg):
    from contexture_nerf_tpu.diffusion.unet import UNet2DCondition

    unet = UNet2DCondition(cfg)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.in_channels, 24, 16)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, cfg.cross_attention_dim)))
    return _count(shapes)


def test_zero123plus_unet_matches_published_sd2():
    from contexture_nerf_tpu.diffusion.unet import UNetConfig

    assert _unet_count(UNetConfig.zero123plus()) == SD2_UNET_PARAMS


def test_depth_and_inpaint_unets_differ_only_in_conv_in():
    """SD2-depth adds 1 input channel (depth), SD2-inpainting adds 5
    (mask + masked latents); everything past conv_in is the same backbone,
    so the param deltas are exactly the extra conv_in columns."""
    from contexture_nerf_tpu.diffusion.unet import UNetConfig

    base = UNetConfig.zero123plus()         # 4-ch SD2 backbone
    depth = UNetConfig.sd2_depth()          # 5-ch
    inpaint = UNetConfig.sd2_inpaint()      # 9-ch
    c0 = base.block_out_channels[0]
    assert _unet_count(depth) == SD2_UNET_PARAMS + \
        (depth.in_channels - 4) * 3 * 3 * c0
    assert _unet_count(inpaint) == SD2_UNET_PARAMS + \
        (inpaint.in_channels - 4) * 3 * 3 * c0


def test_clip_towers_match_published_openclip_vit_h():
    """Vision: exactly the published OpenCLIP ViT-H/14 visual count.
    Text: SD2 ships the TRUNCATED 23-layer text tower (conditioning on the
    penultimate layer; stabilityai/stable-diffusion-2 text_encoder config
    has num_hidden_layers=23) — 50.69M embeddings + 23 x 12.59M layers, not
    the full 24-layer/354M OpenCLIP tower."""
    from contexture_nerf_tpu.diffusion.clip import (CLIPTextConfig,
                                                    CLIPTextModel,
                                                    CLIPVisionConfig,
                                                    CLIPVisionModelWithProjection)

    t = CLIPTextModel(CLIPTextConfig.sd2())
    ts = jax.eval_shape(t.init, jax.random.PRNGKey(0),
                        jnp.zeros((1, 77), jnp.int32))
    assert _count(ts) == 340_387_840

    v = CLIPVisionModelWithProjection(CLIPVisionConfig.vit_h())
    vs = jax.eval_shape(v.init, jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 224, 224)))
    assert _count(vs) == 632_076_800


def test_controlnet_mirrors_unet_encoder_leaf_for_leaf():
    """The depth ControlNet copies the paired UNet's encoder (diffusers
    ControlNetModel.from_unet; reference attaches controlnet-zp11-depth-v1,
    src/training/trainer.py:302-304). Every shared subtree — conv_in, time
    embedding, down blocks, mid block — must match the UNet leaf-for-leaf
    at FULL size, or converted ControlNet checkpoints won't drop in."""
    from contexture_nerf_tpu.diffusion.controlnet import ControlNet
    from contexture_nerf_tpu.diffusion.unet import UNet2DCondition, UNetConfig

    cfg = UNetConfig.zero123plus()
    unet_shapes = jax.eval_shape(
        UNet2DCondition(cfg).init, jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 24, 16)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, cfg.cross_attention_dim)))["params"]
    cn_shapes = jax.eval_shape(
        ControlNet(cfg).init, jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 24, 16)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, cfg.cross_attention_dim)),
        jnp.zeros((1, 3, 192, 128)))["params"]

    shared = [n for n in cn_shapes
              if n.startswith(("down_", "mid_")) or
              n in ("conv_in", "time_embedding")]
    assert len(shared) > 10
    flat_u = jax.tree_util.tree_flatten_with_path(
        {n: unet_shapes[n] for n in shared})[0]
    flat_c = jax.tree_util.tree_flatten_with_path(
        {n: cn_shapes[n] for n in shared})[0]
    assert len(flat_u) == len(flat_c)
    for (pu, su), (pc, sc) in zip(flat_u, flat_c):
        assert pu == pc and su.shape == sc.shape, (pu, pc)
    # the ControlNet-only parts: hint embedder + one zero conv per residual
    extra = set(cn_shapes) - set(shared)
    assert "controlnet_cond_embedding" in extra
    assert "controlnet_mid_block" in extra
    n_down = len([n for n in extra if n.startswith("controlnet_down_blocks")])
    # 12 residuals for the SD2 encoder: conv_in + 2 resnets per level (x4)
    # + 3 downsamples
    assert n_down == 12, sorted(extra)


def test_vae_matches_published_sd():
    from contexture_nerf_tpu.diffusion.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig.sd())
    shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    assert _count(shapes) == SD_VAE_PARAMS
