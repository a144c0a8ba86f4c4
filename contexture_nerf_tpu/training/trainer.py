"""ConTEXTure trainer: SDS texture optimization with the Zero123++ teacher.

Replaces the reference orchestrator (src/training/trainer.py:108-1218) with a
TPU-native loop:

  - geometry is rasterized once; the per-iteration graph (render -> static
    crop+resize -> 3x2 grid -> VAE encode -> add_noise -> teacher v-pred
    (ControlNet + reference attention) -> SDS grad -> tile MSE -> adam) is ONE
    jitted function with zero host round-trips. The reference crosses
    host<->device every iteration (PIL conversions trainer.py:573,598,787-796,
    .cpu() indexing :799-831, per-iter wandb :875).
  - DreamTime timesteps are precomputed as an array (the reference rebuilds
    the scheduler object every iteration, trainer.py:695).
  - crop bboxes are computed once from the fixed view masks and baked into the
    jitted step as static slices (reference recomputes per iteration,
    trainer.py:716).
  - real checkpoint/resume via orbax (absent in the reference: its
    checkpoints/ dir is created but never written, SURVEY.md §5).
"""

from __future__ import annotations

import json
import logging
import os
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from contexture_nerf_tpu.core import profiler
from contexture_nerf_tpu.core.config import TrainConfig, dump_config
from contexture_nerf_tpu.diffusion import schedulers as sch
from contexture_nerf_tpu.diffusion.sd_depth import (SDWeightPaths,
                                                    StableDiffusionDepth)
from contexture_nerf_tpu.diffusion.zero123plus import (Zero123PlusPipeline,
                                                       Zero123PlusWeightPaths,
                                                       scale_image,
                                                       scale_latents,
                                                       unscale_image)
from contexture_nerf_tpu.models.textured_mesh import TexturedMeshModel
from contexture_nerf_tpu.ops.grid import merge_6_to_grid, split_grid_to_6
from contexture_nerf_tpu.ops.image import (color_with_shade, crop_and_resize,
                                           get_nonzero_region_tuple,
                                           resize_bilinear, tensor2numpy)
from contexture_nerf_tpu.ops.view_weights import compute_view_weights
from contexture_nerf_tpu.training.views_dataset import (MultiviewDataset,
                                                        ViewsDataset,
                                                        Zero123PlusDataset)

logger = logging.getLogger("contexture_nerf_tpu")

# tests flip this to exercise the precomputed-embedding kernel path off-TPU
_FUSED_EMB_INTERPRET = False


def _hbm_headroom_ok(need_bytes: int) -> bool:
    """True when the default device reports at least `need_bytes` of free
    memory (or does not report memory stats at all — CPU/interpret backends
    return None, where residency is a non-issue)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit, used = stats.get("bytes_limit"), stats.get("bytes_in_use")
        if limit is None or used is None:
            return True
        return (limit - used) >= need_bytes
    except Exception:
        return True


def make_path(p: Path) -> Path:
    p.mkdir(exist_ok=True, parents=True)
    return p


class ConTEXTure:
    """Text -> textured mesh (reference ConTEXTure, trainer.py:108)."""

    # max eval chunks holding device buffers at once (evaluate(): enough to
    # overlap fetch with render, bounded so 100x1024^2 eval doesn't pin
    # ~300 MB of frames next to the towers)
    _EVAL_INFLIGHT = 3

    def __init__(self, cfg: TrainConfig, tiny_models: bool = False,
                 backend: Optional[str] = None):
        self.cfg = cfg
        self.paint_step = 0
        self.tiny = tiny_models
        # Zero123++ grid tile size in pixels (reference: 320, trainer.py:573,
        # 587); reduced in tiny-model mode so test UNets see small token counts
        self.tile_px = 32 if tiny_models else 320

        self.exp_path = make_path(Path(cfg.log.exp_dir))
        self.ckpt_path = make_path(self.exp_path / "checkpoints")
        self.train_renders_path = make_path(self.exp_path / "vis" / "train")
        self.eval_renders_path = make_path(self.exp_path / "vis" / "eval")
        self.final_renders_path = make_path(self.exp_path / "results")
        self._init_logger()
        dump_config(cfg, self.exp_path / "config.yaml")

        self.key = jax.random.PRNGKey(cfg.optim.seed)
        self.view_dirs = ["front", "left", "back", "right", "overhead",
                          "bottom"]

        self.mesh_model = self._init_mesh_model(backend)
        self.diffusion = self._init_diffusion()
        if cfg.guide.use_zero123plus:
            self.zero123plus = self._init_zero123plus()
        self.text_z, self.text_string = self._calc_text_embeddings()
        self.dataloaders = self._init_dataloaders()

        bg_path = Path(cfg.guide.background_img)
        if bg_path.exists():
            from PIL import Image

            im = np.asarray(Image.open(bg_path).convert("RGB"),
                            np.float32) / 255.0
            self.back_im = jnp.asarray(im.transpose(2, 0, 1))
        else:
            self.back_im = jnp.full((3, 64, 64), 0.5)

        self.zero123_front_input = None
        self.view_weights = None
        self._median_eval = False

        # async image logging (core/imagewriter.py): the loop thread never
        # blocks on device->host fetch + PNG encode + disk IO
        from contexture_nerf_tpu.core.imagewriter import (AsyncImageWriter,
                                                          sync_writer)
        self._img_writer = (AsyncImageWriter()
                            if cfg.log.async_image_writer else sync_writer())

        # optional wandb (the reference hard-wires it, trainer.py:665-668;
        # here metrics.json is always written and wandb is opt-in)
        self._wandb = None
        if os.environ.get("WANDB_ENABLED"):
            try:
                import wandb

                self._wandb = wandb.init(project="ConTEXTure-NeRF-TPU",
                                         config=dict(exp=cfg.log.exp_name))
            except Exception:
                self._wandb = None

    # -- setup ------------------------------------------------------------

    def _init_logger(self):
        logging.basicConfig(level=logging.INFO,
                            format="%(asctime)s %(message)s")
        # the module logger is shared: drop handlers left by earlier
        # trainers (sweeps/tests construct many per process) or every later
        # line would also be written into every earlier run's log.txt and
        # the descriptors would leak (r4 code review)
        for h in list(logger.handlers):
            if isinstance(h, logging.FileHandler):
                logger.removeHandler(h)
                h.close()
        fh = logging.FileHandler(self.exp_path / "log.txt")
        logger.addHandler(fh)

    def _init_mesh_model(self, backend) -> TexturedMeshModel:
        if not Path(self.cfg.guide.shape_path).exists():
            # shipped configs stay runnable without binary assets: generate a
            # procedural stand-in for known shape names (tools/make_shapes.py)
            try:
                from tools.make_shapes import ensure_shape

                ensure_shape(self.cfg.guide.shape_path)
            except ImportError:
                pass
        cache_path = Path("cache") / Path(self.cfg.guide.shape_path).stem
        cache_path.mkdir(parents=True, exist_ok=True)
        model = TexturedMeshModel(
            self.cfg.guide,
            render_grid_size=self.cfg.render.train_grid_size,
            cache_path=cache_path,
            texture_resolution=self.cfg.guide.texture_resolution,
            fovyangle=np.pi / 3,
            env_sphere_path="shapes/env_sphere.obj",
            backend=backend)
        self.key, sub = jax.random.split(self.key)
        self.texture_params = model.init_params(sub)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(self.texture_params))
        logger.info(f"Loaded Mesh, #parameters: {n}")
        self._seed_texture_field(model)
        return model

    def _load_texture_image(self, path) -> Optional[jnp.ndarray]:
        from PIL import Image

        p = Path(path)
        if not p.exists():
            logger.warning(f"texture image {p} not found; skipping")
            return None
        res = self.cfg.guide.texture_resolution
        im = np.asarray(Image.open(p).convert("RGB").resize((res, res)),
                        np.float32) / 255.0
        return jnp.asarray(im.transpose(2, 0, 1))

    def _seed_texture_field(self, model: TexturedMeshModel):
        """Wire guide.initial_texture / guide.reference_texture.

        The reference seeds its texture_img parameter from initial_texture
        (src/models/textured_mesh.py:119-122 via train_config.py:73); the MLP
        equivalent is a short regression fit. reference_texture in the
        reference computes a change mask of edited texels and writes it into
        an undefined meta_texture_img (src/models/textured_mesh.py:138-149 —
        broken path there); here the mask is computed, stored, and logged."""
        init_tex = self.cfg.guide.initial_texture
        if init_tex is not None:
            img = self._load_texture_image(init_tex)
            if img is not None:
                self.key, sub = jax.random.split(self.key)
                self.texture_params = model.fit_texture_to_image(
                    self.texture_params, img, sub)
                logger.info(f"Seeded texture field from {init_tex}")

        self.edit_change_mask = None
        ref_tex = self.cfg.guide.reference_texture
        if ref_tex is not None:
            base = self._load_texture_image(ref_tex)
            if base is not None:
                current, _ = jax.jit(model.get_texture_map)(
                    self.texture_params)
                diff = jnp.abs(base[None] - current).sum(axis=1)
                self.edit_change_mask = (diff > 0.1).astype(jnp.float32)
                self.log_train_image(
                    jnp.repeat(self.edit_change_mask[:, None], 3, axis=1),
                    "reference_texture_change_mask", file_type="png")

    def _init_diffusion(self) -> StableDiffusionDepth:
        # full-size stacks run bf16 (MXU-native; both UNet pairs at f32 would
        # exceed a v5e chip's 16 GB HBM); tiny CPU test configs stay f32
        dtype = jnp.float32 if self.tiny else jnp.bfloat16
        g = self.cfg.guide
        # guide.diffusion_name doubles as a local snapshot root (reference
        # loads the same name from the hub, stable_diffusion_depth.py:58-100;
        # this environment is zero-egress so only local directories load)
        sd_root = g.diffusion_name if os.path.isdir(str(g.diffusion_name)) \
            else None
        wp = None
        if sd_root or g.inpaint_model_path:
            wp = SDWeightPaths.from_snapshot(sd_root, g.inpaint_model_path)
            logger.info(f"SD2 weights from snapshot: {wp}")
        diffusion = StableDiffusionDepth(
            min_timestep=self.cfg.optim.min_timestep,
            max_timestep=self.cfg.optim.max_timestep,
            no_noise=self.cfg.optim.no_noise,
            use_inpaint=True,
            weight_paths=wp,
            tiny=self.tiny,
            dtype=dtype,
            seed=self.cfg.optim.seed)
        # textual-inversion concept (reference loads in StableDiffusion
        # __init__, stable_diffusion_depth.py:104-105)
        cp = g.concept_path
        if cp is not None and Path(cp).exists():
            diffusion.load_concept(str(cp))
            logger.info(f"Loaded textual-inversion concept from {cp}")
        return diffusion

    def _init_zero123plus(self) -> Zero123PlusPipeline:
        dtype = jnp.float32 if self.tiny else jnp.bfloat16
        g = self.cfg.guide
        wp = None
        if g.zero123plus_path or g.controlnet_path:
            wp = Zero123PlusWeightPaths.from_snapshot(g.zero123plus_path,
                                                      g.controlnet_path)
            logger.info(f"Zero123++ weights from snapshot: {wp}")
        return Zero123PlusPipeline(conditioning_scale=2.0, weight_paths=wp,
                                   tiny=self.tiny, dtype=dtype,
                                   seed=self.cfg.optim.seed,
                                   int8_controlnet=self.cfg.optim.int8_controlnet,
                                   int8_unet=self.cfg.optim.int8_teacher)

    def _calc_text_embeddings(self):
        ref_text = self.cfg.guide.text
        if self.cfg.guide.use_zero123plus:
            assert not self.cfg.guide.append_direction, \
                "append_direction should be False when use_zero123plus is True"
            text_string = [ref_text, ref_text + ", front view"]
            text_z = [self.diffusion.get_text_embeds([t])
                      for t in text_string]
        elif not self.cfg.guide.append_direction:
            text_z = self.diffusion.get_text_embeds([ref_text])
            text_string = ref_text
        else:
            text_string = [ref_text.format(d) for d in self.view_dirs]
            text_z = [self.diffusion.get_text_embeds([t])
                      for t in text_string]
        return text_z, text_string

    def _init_dataloaders(self) -> Dict[str, Any]:
        if self.cfg.guide.use_zero123plus:
            train = Zero123PlusDataset(self.cfg.render)
        else:
            train = MultiviewDataset(self.cfg.render)
        return {
            "train": train,
            "val": ViewsDataset(self.cfg.render, size=self.cfg.log.eval_size),
            "val_large": ViewsDataset(self.cfg.render,
                                      size=self.cfg.log.full_eval_size),
        }

    # -- jitted render helpers (eager 1200^2 renders materialize every MLP
    # activation in HBM and can OOM; jit keeps intermediates fused/freed) ----

    def _jit_cache_get(self, sig, builder):
        if not hasattr(self, "_render_jit_cache"):
            self._render_jit_cache = {}
        if sig not in self._render_jit_cache:
            self._render_jit_cache[sig] = builder()
        return self._render_jit_cache[sig]

    def _render_pose_jit(self, dims=None, use_median: bool = False):
        model = self.mesh_model
        sig = ("pose", dims, use_median)

        def build():
            def f(params, theta, phi, radius, background):
                return model.render(params, theta=theta, phi=phi,
                                    radius=radius, background=background,
                                    dims=dims, use_median=use_median)
            return jax.jit(f)

        return self._jit_cache_get(sig, build)

    def _render_cache_jit(self):
        model = self.mesh_model
        sig = ("cached",)

        def build():
            def f(params, cache, background):
                return model.render(params, render_cache=cache,
                                    background=background)
            return jax.jit(f)

        return self._jit_cache_get(sig, build)

    # -- view weights -------------------------------------------------------

    def define_view_weights(self):
        """(reference trainer.py:370-415)"""
        poses = self.dataloaders["train"].poses()
        front_offset = np.deg2rad(self.cfg.render.front_offset)
        self.thetas = [p["theta"] for p in poses]
        self.phis = [(p["phi"] - front_offset) % (2 * np.pi) for p in poses]
        self.radii = [p["radius"] for p in poses]

        model = self.mesh_model

        @jax.jit
        def geometry_and_weights(theta, phi, radius):
            cache = model.render_geometry(theta=theta, phi=phi, radius=radius)
            weights = compute_view_weights(cache.face_idx[:, None],
                                           cache.face_normals[..., 2])
            return cache, weights

        cache, weight_masks = geometry_and_weights(
            jnp.asarray(self.thetas, jnp.float32),
            jnp.asarray(self.phis, jnp.float32),
            jnp.asarray(self.radii, jnp.float32))
        self.view_weights = weight_masks
        self._geometry_cache = cache
        logger.info(f"Successfully initialized {self.cfg.log.exp_name}")

    # -- main ----------------------------------------------------------------

    def paint(self):
        # The reference's paint() hardwires paint_zero123plus too
        # (trainer.py:367-368) and initializes the Zero123++ pipeline
        # unconditionally; use_zero123plus=False only switches text
        # embeddings/dataloaders there and has NO live paint path. We gate
        # pipeline construction on the flag (HBM), so fail loudly instead of
        # with an AttributeError deep in prepare_sds (r4 code review).
        if not self.cfg.guide.use_zero123plus:
            raise ValueError(
                "guide.use_zero123plus=False has no live paint path (the "
                "reference's paint() also runs the Zero123++ SDS loop "
                "unconditionally, reference trainer.py:367); set it to "
                "true, or use StableDiffusionDepth.img2img_step/sds_grad "
                "directly for single-view guidance")
        self.paint_zero123plus()

    def prepare_sds(self, skip_bootstrap: bool = False) -> Dict[str, Any]:
        """Front-view bootstrap + all-view geometry + one-time teacher
        conditioning (steps 1-5 of reference paint_zero123plus,
        trainer.py:545-645). Returns the static setup `_build_sds_step`
        consumes. skip_bootstrap=True replaces the 50-step SD2 img2img front
        image with the current front render (multi-chip dryrun path)."""
        self.define_view_weights()
        background_gray = jnp.array([0.5, 0.5, 0.5])

        # all-view geometry + depth (reference trainer.py:562)
        cache = self._geometry_cache
        outputs = self._render_cache_jit()(
            self.texture_params, cache, background_gray)
        object_masks = outputs["mask"]
        depth_maps = 1.0 - outputs["depth"]
        B = int(object_masks.shape[0])

        # front-view bootstrap (SD2-depth img2img, reference trainer.py:557)
        if skip_bootstrap:
            rgb_output_front = outputs["image"][:1]
            object_mask_front = object_masks[:1]
        else:
            frontview_data = self.dataloaders["train"].poses()[0]
            with profiler.phase("bootstrap"):
                rgb_output_front, object_mask_front = self.paint_viewpoint(
                    frontview_data, should_project_back=False)

        # cond image: front crop -> 320^2, gray-composited RGBA
        masks_np = np.asarray(object_masks[:, 0])
        bbox_front = get_nonzero_region_tuple(
            np.asarray(object_mask_front[0, 0]))
        tp = self.tile_px
        front_rgb = crop_and_resize(rgb_output_front, bbox_front, tp, tp)
        front_a = crop_and_resize(object_mask_front, bbox_front, tp, tp)
        cond_image = front_rgb * front_a + 0.5 * (1 - front_a)  # to_rgb_image

        # depth grid for the 6 target views (alpha -> gray bg)
        self._bboxes = [get_nonzero_region_tuple(masks_np[i])
                        for i in range(B)]
        depth_tiles = []
        for i in range(1, B):
            d = crop_and_resize(depth_maps[i:i + 1], self._bboxes[i], tp, tp)
            a = crop_and_resize(object_masks[i:i + 1], self._bboxes[i],
                                tp, tp)
            depth_tiles.append(
                jnp.concatenate([d, d, d], axis=1) * a + 0.5 * (1 - a))
        depth_grid = merge_6_to_grid(jnp.concatenate(depth_tiles, axis=0))
        self.log_train_image(depth_grid, "cropped_depth_grid",
                             file_type="png")

        # one-time teacher conditioning
        self.key, k_cond = jax.random.split(self.key)
        cond_lat_pair, encoder_hidden_states = \
            self.zero123plus.prepare_conditioning(cond_image * 2 - 1, k_cond)

        # slice the cache to the 6 target views for the hot loop; the default
        # render path then needs NO raster buffers at all (it works from the
        # crop-resized UV embedding), so both the 7-view cache and the slice
        # are dropped to free ~900 MB of HBM next to the diffusion towers
        exact = self.cfg.optim.exact_lattice_render
        cache6 = jax.tree.map(lambda x: x[1:], cache) if exact else None
        bboxes6 = self._bboxes[1:]

        # per-view tile-sampling probabilities from the view-weight masks:
        # views whose pixels mostly see their faces head-on (best view) get
        # proportionally more SDS tile draws. This consumes the reference's
        # computed-but-unused six_view_weights (trainer.py:709; SURVEY.md §7
        # "actually use or drop"). optim.tile_weighting selects: 'uniform'
        # (default — exact reference behavior), 'weighted', or 'mixed'
        # (recommended improvement — 0.5 uniform floor so a view with zero
        # best-view pixels still receives SDS gradients).
        fg = object_masks > 0.5
        best = jnp.logical_and(self.view_weights, fg)
        frac = (best.sum(axis=(1, 2, 3)) /
                jnp.maximum(fg.sum(axis=(1, 2, 3)), 1))
        w6 = np.asarray(frac, np.float64)[1:]
        mode = self.cfg.optim.tile_weighting
        uniform = np.full(6, 1.0 / 6.0)
        if w6.sum() <= 0:
            # no view has any best-view foreground pixel (front-dominated
            # geometry): weighted/mixed would divide by zero — fall back
            if mode != "uniform":
                logger.warning("all view weights are zero; tile_weighting "
                               f"'{mode}' falls back to uniform")
            w6 = uniform.copy()
        w6 = w6 / w6.sum()
        if mode == "uniform":
            probs = uniform
        elif mode == "weighted":
            probs = w6
        elif mode == "mixed":
            probs = 0.5 * uniform + 0.5 * w6
        else:
            raise ValueError(f"optim.tile_weighting: unknown mode {mode!r} "
                             "(expected uniform|mixed|weighted)")
        tile_probs = jnp.asarray(probs / probs.sum(), jnp.float32)
        logger.info(f"view tile probs ({mode}): "
                    f"{np.round(np.asarray(tile_probs), 3)}")

        setup: Dict[str, Any] = {
            "cache6": cache6, "bboxes6": bboxes6, "depth_grid": depth_grid,
            "cond_lat_pair": cond_lat_pair,
            "encoder_hidden_states": encoder_hidden_states,
            "cond_image": cond_image, "tile_probs": tile_probs,
            "uv_grid_pts": None, "mask_grid": None, "emb_pts": None,
        }

        if not self.cfg.optim.exact_lattice_render:
            # TPU-first student render (SURVEY.md §7): crop+resize the STATIC
            # uv/mask maps once, then each iteration evaluates the texture
            # MLP directly at the resized UVs — dense MXU math, no
            # lattice-gather/scatter in the hot loop. UVs are mask-weighted
            # through the resize so background zeros don't bleed into edges.
            uv_maps = jnp.transpose(cache.uv_features[1:], (0, 3, 1, 2))
            mask6 = cache.mask[1:]
            uv_tiles, m_tiles = [], []
            for i in range(6):
                m_t = crop_and_resize(mask6[i:i + 1], bboxes6[i], tp, tp)
                uvm = crop_and_resize((uv_maps * mask6)[i:i + 1], bboxes6[i],
                                      tp, tp)
                uv_tiles.append(uvm / jnp.maximum(m_t, 1e-6))
                m_tiles.append(m_t)
            uv_grid = merge_6_to_grid(jnp.concatenate(uv_tiles, axis=0))
            mask_grid = merge_6_to_grid(jnp.concatenate(m_tiles, axis=0))
            uv_pts = jnp.clip(
                jnp.transpose(uv_grid[0], (1, 2, 0)).reshape(-1, 2), 0.0, 1.0)
            setup["uv_grid_pts"] = uv_pts
            setup["mask_grid"] = mask_grid
            if self.cfg.optim.precompute_uv_embedding:
                # default-on since r5: precomputed Fourier embedding of the
                # static UVs + the fused_nerf2d_emb kernel — measured 243.6
                # vs 284.7 ms/iter (-14%) through this production step
                # (docs/PERF.md), and proven bit-identical END TO END on
                # chip (500-iter paint, PSNR inf vs the recompute path —
                # docs/knob_quality_r5.json). Stored in the kernel's compute
                # dtype (the kernel casts it there at every MXU use): bf16
                # halves the residency to ~157 MB vs 314 MB f32.
                mlp = self.mesh_model.texture_mlp
                eligible = (mlp.D == 8 and mlp.W == 256
                            and tuple(mlp.skips) == (4,)
                            and (jax.default_backend() == "tpu"
                                 or _FUSED_EMB_INTERPRET))
                # HBM-headroom auto-fallback (VERDICT r4 weak #3): the
                # residency once tipped the 16 GB chip into
                # RESOURCE_EXHAUSTED next to the full towers, so require
                # 2x the embedding bytes free before committing
                from contexture_nerf_tpu.ops.mlp_kernel import _EMB_PAD
                need = (uv_pts.shape[0] * _EMB_PAD
                        * jnp.dtype(self.zero123plus.dtype).itemsize)
                if eligible and not _hbm_headroom_ok(2 * need):
                    eligible = False
                    logger.warning(
                        "optim.precompute_uv_embedding skipped: < %.0f MB "
                        "free HBM headroom for the %.0f MB embedding; "
                        "falling back to per-iteration recompute "
                        "(bit-identical, ~14%% slower)",
                        2 * need / 2 ** 20, need / 2 ** 20)
                if eligible:
                    from contexture_nerf_tpu.ops.mlp_kernel import (
                        pad_embedding)

                    setup["emb_pts"] = pad_embedding(
                        uv_pts, multires=self.mesh_model.multires,
                        dtype=self.zero123plus.dtype)
                elif (mlp.D, mlp.W, tuple(mlp.skips)) != (8, 256, (4,)) or \
                        not (jax.default_backend() == "tpu"
                             or _FUSED_EMB_INTERPRET):
                    logger.warning(
                        "optim.precompute_uv_embedding ignored: fused kernel "
                        "needs a TPU backend and the 8x256 skip-4 MLP")
            # The raster buffers ARE dropped: this path works entirely from
            # the resized UVs + mask grid.
            self._geometry_cache = None

        # guide.reference_texture edit localization: gradients flow only
        # where the current texture differs from the reference (the change
        # mask _seed_texture_field computed; reference's broken
        # meta_texture_img path, src/models/textured_mesh.py:138-149).
        setup["edit_mask_pts"] = None
        if self.edit_change_mask is not None and \
                setup["uv_grid_pts"] is not None:
            res = self.edit_change_mask.shape[-1]
            pts = setup["uv_grid_pts"]
            # lattice convention (fields.uv_lattice): row = v*(res-1),
            # col = u*(res-1)
            coords = jnp.stack([pts[:, 1] * (res - 1),
                                pts[:, 0] * (res - 1)])
            setup["edit_mask_pts"] = jax.scipy.ndimage.map_coordinates(
                self.edit_change_mask[0], coords, order=1)[:, None]
        return setup

    def _make_mesh(self) -> Optional["jax.sharding.Mesh"]:
        """Device mesh for the SDS step per optim.data_parallel:
        'auto' -> all devices on a real multi-chip TPU backend; 'on' -> all
        visible devices (tests use the 8-virtual-CPU mesh); 'off' -> None.
        optim.tensor_parallel > 1 folds a `tp` axis into the mesh
        ((views x tp), SURVEY.md §2.3 TP row) — _build_sds_step then applies
        Megatron-style param shardings to the teacher/VAE towers."""
        from contexture_nerf_tpu.parallel.mesh import create_mesh

        dp = self.cfg.optim.data_parallel
        tp = max(1, int(self.cfg.optim.tensor_parallel))
        sp = max(1, int(self.cfg.optim.sequence_parallel))
        if tp > 1 and sp > 1:
            raise ValueError("optim.tensor_parallel and "
                             "optim.sequence_parallel are mutually exclusive")
        n = len(jax.devices())
        if n <= 1 or dp == "off":
            if tp > 1 or sp > 1:
                raise ValueError(
                    f"optim.tensor_parallel={tp}/sequence_parallel={sp} "
                    f"requested but no mesh can be built "
                    f"(data_parallel={dp!r}, {n} visible devices) — an "
                    "explicit TP/SP request must not be silently ignored")
            return None
        if dp == "on" or (dp == "auto" and jax.default_backend() == "tpu"):
            if tp > 1:
                if n % tp != 0:
                    raise ValueError(
                        f"optim.tensor_parallel={tp} does not divide the "
                        f"{n} visible devices")
                return create_mesh((n // tp, tp), ("views", "tp"))
            if sp > 1:
                if n % sp != 0:
                    raise ValueError(
                        f"optim.sequence_parallel={sp} does not divide the "
                        f"{n} visible devices")
                return create_mesh((n // sp, sp), ("views", "sp"))
            return create_mesh((n,), ("views",))
        if tp > 1 or sp > 1:
            raise ValueError(
                f"optim.tensor_parallel={tp}/sequence_parallel={sp} "
                f"requested but data_parallel='auto' builds no mesh on the "
                f"{jax.default_backend()} backend — set "
                "optim.data_parallel='on' to force one")
        return None

    def _build_sds_step(self, setup: Dict[str, Any], mesh=None):
        """Build the jitted SDS step (reference hot loop trainer.py:671-907
        as ONE graph). Returns (step_fn, optimizer, hot) where `hot` is the
        dict of per-iteration device arguments.

        With `mesh`, the step is jitted with explicit in_shardings: the
        canvas-shaped tensors (depth grid, cond latent pair, UV points, mask
        grid) shard spatially over the mesh axis, params/optimizer state
        replicate, and sharding constraints keep the student grid + VAE
        latents distributed — XLA emits the ICI collectives (conv halo
        exchanges, attention all-gathers, grad psum). This is the production
        multi-chip path replacing the reference's vestigial nn.DataParallel
        (reference trainer.py:134-135; SURVEY.md §2.3)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        cfg = self.cfg
        mesh_model = self.mesh_model
        zero123plus = self.zero123plus
        vae = zero123plus.vae
        acp = zero123plus.alphas_cumprod
        guidance_scale = 10.0  # reference trainer.py:768
        grad_scale = 0.2  # reference trainer.py:830
        vae_down = 2 ** (len(zero123plus.vae_config.block_out_channels) - 1)
        lat_tile = self.tile_px // vae_down
        tile_px = self.tile_px
        exact_render = cfg.optim.exact_lattice_render
        bboxes6 = setup["bboxes6"]
        individual = (cfg.guide.individual_control_of_conditions
                      and cfg.guide.guidance_scale_i is not None
                      and cfg.guide.guidance_scale_t is not None)
        gs_i = float(cfg.guide.guidance_scale_i or 0.0)
        gs_t = float(cfg.guide.guidance_scale_t or 0.0)

        optimizer = optax.adam(cfg.optim.sds_lr,
                               b1=cfg.optim.sds_betas[0],
                               b2=cfg.optim.sds_betas[1],
                               eps=cfg.optim.sds_eps)

        # hoist the loop-invariant ControlNet hint embedding out of the hot
        # loop: it depends only on the (fixed) depth grid (~6 ms/step on v5e;
        # the reference recomputes it inside every denoise call,
        # zero123plus.py:283-290)
        # the latent grid is depth_grid / vae_down (NOT /8: tiny test VAEs
        # downsample less); embed_control_cond resizes depth to 8x latent
        lat_hw = (setup["depth_grid"].shape[2] // vae_down,
                  setup["depth_grid"].shape[3] // vae_down)
        cn_cond_emb = zero123plus.embed_control_cond(
            zero123plus.params, setup["depth_grid"], lat_hw)

        hot = {
            # the raster cache is only consumed by the exact-lattice path;
            # keeping it out of the hot args otherwise saves ~400 MB HBM of
            # replicated per-view buffers at 1200^2
            "cache6": setup["cache6"] if exact_render else None,
            "depth_grid": setup["depth_grid"],
            "cn_cond_emb": cn_cond_emb,
            "cond_lat_pair": setup["cond_lat_pair"],
            "encoder_hidden_states": setup["encoder_hidden_states"],
            "zp_params": zero123plus.params,
            "vae_params": zero123plus.params["vae"],
            "uv_grid_pts": setup["uv_grid_pts"],
            "mask_grid": setup["mask_grid"],
            "emb_pts": setup["emb_pts"],
            "edit_mask_pts": setup.get("edit_mask_pts"),
            "tile_probs": setup["tile_probs"],
        }

        n_mesh = mesh.shape["views"] if mesh is not None else 1

        def shard_spec(x, spatial_dim):
            """Spatial sharding over the mesh axis when divisible."""
            if (mesh is None or not hasattr(x, "shape")
                    or x.shape[spatial_dim] % n_mesh != 0):
                return P()
            spec = [None] * x.ndim
            spec[spatial_dim] = "views"
            return P(*spec)

        def constrain(x, spatial_dim):
            if mesh is None:
                return x
            spec = shard_spec(x, spatial_dim)
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec))

        grid_hw = (3 * tile_px, 2 * tile_px)

        local_grad = bool(cfg.optim.local_sds_grad)
        if local_grad and exact_render:
            # local_sds_grad needs the fused-query render path;
            # exact_lattice_render backpropagates through the rasterizer
            # cache instead. exact_lattice is a reference-exactness request,
            # so fall back to the reference-exact gradient rather than
            # erroring on the (r5 default-on) local-grad knob.
            logger.warning(
                "optim.exact_lattice_render is on: disabling "
                "optim.local_sds_grad (it requires the fused-query render "
                "path); gradients follow the reference-exact full-canvas "
                "backward")
            local_grad = False
        margin_px = int(cfg.optim.local_sds_margin_px)
        if margin_px % vae_down:
            raise ValueError(
                f"optim.local_sds_margin_px={margin_px} must be a multiple "
                f"of the VAE downsample factor {vae_down}")
        # backward-slice dims: tile + 2*margin, clamped to the canvas and
        # kept latent-aligned (grid_hw and tile_px are vae_down multiples)
        sl_h = min(tile_px + 2 * margin_px, grid_hw[0])
        sl_w = min(tile_px + 2 * margin_px, grid_hw[1])

        def render_grid_latent(params, hot, key):
            if exact_render:
                texture, mlp_out = mesh_model.get_texture_map(params)
                image, mask, _, _ = \
                    mesh_model.renderer.render_texture_with_cache(
                        hot["cache6"], texture, background_type="none")
                image = jnp.clip(image * mask + 0.5 * (1 - mask), 0.0, 1.0)
                tiles = [crop_and_resize(image[i:i + 1], bboxes6[i],
                                         tile_px, tile_px)
                         for i in range(6)]
                grid = merge_6_to_grid(jnp.concatenate(tiles, axis=0))
            else:
                # student compute runs in the diffusion stack's dtype (bf16
                # full-size; the reference runs its loop under fp16 autocast,
                # stable_diffusion_depth.py:330) — fused VMEM-resident kernel
                # on TPU, flax path elsewhere/under GSPMD
                if hot["emb_pts"] is not None:
                    # optim.precompute_uv_embedding: static Fourier features
                    # feed the precomputed-embedding kernel directly
                    from contexture_nerf_tpu.ops.mlp_kernel import (
                        fused_nerf2d_emb)

                    out = fused_nerf2d_emb(params, hot["emb_pts"],
                                           mesh_model.multires,
                                           _FUSED_EMB_INTERPRET,
                                           zero123plus.dtype)
                    rgb = (jnp.tanh(out) + 1.0) / 2.0
                else:
                    rgb = mesh_model.query_texture_at_uv(
                        params, hot["uv_grid_pts"],
                        allow_fused=(mesh is None),
                        compute_dtype=zero123plus.dtype)
                if hot["edit_mask_pts"] is not None:
                    # localize guide.reference_texture edits: unedited texels
                    # contribute no gradient
                    m = hot["edit_mask_pts"]
                    rgb = m * rgb + (1 - m) * jax.lax.stop_gradient(rgb)
                mlp_out = rgb
                grid = jnp.transpose(
                    rgb.reshape(grid_hw[0], grid_hw[1], 3),
                    (2, 0, 1))[None]
                mask_grid = hot["mask_grid"]
                grid = jnp.clip(grid * mask_grid + 0.5 * (1 - mask_grid),
                                0.0, 1.0)
            grid = scale_image(grid * 2 - 1)
            grid = constrain(grid, 2)

            from contexture_nerf_tpu.diffusion.vae import sample_gaussian

            # activation memory is bounded by the VAE's own per-block remat
            # (vae.py:71-75); wrapping the whole encoder in a second
            # jax.checkpoint would recompute the forward twice over
            mean, logvar = vae.apply(hot["vae_params"], grid,
                                     method=vae.encode_moments)
            z = sample_gaussian(mean, logvar, key) * \
                zero123plus.vae_config.scaling_factor
            z = constrain(z, 2)
            return scale_latents(z), grid, mlp_out

        def render_grid_latent_local(params, hot, key, tile_idx):
            """optim.local_sds_grad: full-canvas render + VAE encode run
            FORWARD-ONLY (identical loss value / teacher input / logged grid
            to the default path — the full path below sees stop-gradiented
            params and the grafted deltas are zero in value), while the
            gradient flows through a (sl_h, sl_w) slice around the sampled
            tile: the pointwise texture-MLP gradient is exact; the VAE
            gradient is exact up to receptive-field truncation at the slice
            border. A slice covering the whole canvas reproduces the default
            gradient (tests/test_local_grad.py)."""
            z_full, grid_full, mlp_out = render_grid_latent(
                jax.lax.stop_gradient(params), hot, key)
            # column-major tile order (ops/grid.py: idx = 3*col + row)
            row = tile_idx % 3
            col = tile_idx // 3
            oy = jnp.clip(row * tile_px - (sl_h - tile_px) // 2, 0,
                          grid_hw[0] - sl_h)
            ox = jnp.clip(col * tile_px - (sl_w - tile_px) // 2, 0,
                          grid_hw[1] - sl_w)
            oy = (oy // vae_down) * vae_down  # keep latent-aligned
            ox = (ox // vae_down) * vae_down

            # differentiable patch: query only the slice's UV points. The
            # two opt-in knobs COMPOSE: the full-canvas forward above
            # already went through the precomputed-embedding kernel when
            # optim.precompute_uv_embedding is on, and here the patch
            # slices its rows out of the same precomputed embedding
            # (skipping the patch's sin/cos in fwd AND bwd too).
            if hot["emb_pts"] is not None:
                from contexture_nerf_tpu.ops.mlp_kernel import (
                    fused_nerf2d_emb)

                emb_hw = hot["emb_pts"].reshape(
                    grid_hw[0], grid_hw[1], hot["emb_pts"].shape[-1])
                emb_sl = jax.lax.dynamic_slice(
                    emb_hw, (oy, ox, 0),
                    (sl_h, sl_w, emb_hw.shape[-1]))
                out_sl = fused_nerf2d_emb(
                    params, emb_sl.reshape(sl_h * sl_w, -1),
                    mesh_model.multires, _FUSED_EMB_INTERPRET,
                    zero123plus.dtype)
                rgb_sl = (jnp.tanh(out_sl) + 1.0) / 2.0
            else:
                pts_hw = hot["uv_grid_pts"].reshape(
                    grid_hw[0], grid_hw[1], 2)
                pts_sl = jax.lax.dynamic_slice(pts_hw, (oy, ox, 0),
                                               (sl_h, sl_w, 2))
                rgb_sl = mesh_model.query_texture_at_uv(
                    params, pts_sl.reshape(-1, 2),
                    allow_fused=(mesh is None),
                    compute_dtype=zero123plus.dtype)
            if hot["edit_mask_pts"] is not None:
                m_hw = hot["edit_mask_pts"].reshape(
                    grid_hw[0], grid_hw[1], 1)
                m_sl = jax.lax.dynamic_slice(
                    m_hw, (oy, ox, 0), (sl_h, sl_w, 1)).reshape(-1, 1)
                rgb_sl = m_sl * rgb_sl + \
                    (1 - m_sl) * jax.lax.stop_gradient(rgb_sl)
            patch = jnp.transpose(rgb_sl.reshape(sl_h, sl_w, 3),
                                  (2, 0, 1))[None]
            mg = hot["mask_grid"]
            mask_sl = jax.lax.dynamic_slice(
                mg, (0, 0, oy, ox), (1, mg.shape[1], sl_h, sl_w))
            patch = jnp.clip(patch * mask_sl + 0.5 * (1 - mask_sl),
                             0.0, 1.0)
            patch = scale_image(patch * 2 - 1)
            grid = jax.lax.dynamic_update_slice(
                grid_full, patch.astype(grid_full.dtype), (0, 0, oy, ox))
            grid = constrain(grid, 2)

            # local VAE encode of the slice, reusing the full path's exact
            # noise draw (sample_gaussian: mean + exp(0.5*logvar) *
            # normal(key, mean.shape, mean.dtype), diffusion/vae.py:164-168)
            g_sl = jax.lax.dynamic_slice(grid, (0, 0, oy, ox),
                                         (1, 3, sl_h, sl_w))
            mean_l, logvar_l = vae.apply(hot["vae_params"], g_sl,
                                         method=vae.encode_moments)
            eps = jax.random.normal(key, z_full.shape, mean_l.dtype)
            eps_l = jax.lax.dynamic_slice(
                eps, (0, 0, oy // vae_down, ox // vae_down),
                (1, eps.shape[1], sl_h // vae_down, sl_w // vae_down))
            z_l = (mean_l + jnp.exp(0.5 * logvar_l) * eps_l) * \
                zero123plus.vae_config.scaling_factor
            z_l = scale_latents(z_l)

            # graft the tile's gradient into the forward-exact full latent
            ty = (row * tile_px - oy) // vae_down
            tx = (col * tile_px - ox) // vae_down
            C = z_full.shape[1]
            z_l_tile = jax.lax.dynamic_slice(
                z_l, (0, 0, ty, tx), (1, C, lat_tile, lat_tile))
            zy, zx = row * lat_tile, col * lat_tile
            z_tile_full = jax.lax.dynamic_slice(
                z_full, (0, 0, zy, zx), (1, C, lat_tile, lat_tile))
            delta = (z_l_tile -
                     jax.lax.stop_gradient(z_l_tile)).astype(z_full.dtype)
            z = jax.lax.dynamic_update_slice(z_full, z_tile_full + delta,
                                             (0, 0, zy, zx))
            z = constrain(z, 2)
            return z, grid, mlp_out

        def sds_step(params, opt_state, t, key, hot):
            k_enc, k_noise, k_teach, k_tile = jax.random.split(key, 4)
            # view-weighted tile sampling (uniform in the reference,
            # trainer.py:843; weights were computed there but never used)
            tile_idx = jax.random.choice(k_tile, 6, p=hot["tile_probs"])

            def loss_fn(p):
                if local_grad:
                    z, grid, mlp_out = render_grid_latent_local(
                        p, hot, k_enc, tile_idx)
                else:
                    z, grid, mlp_out = render_grid_latent(p, hot, k_enc)
                z_sg = jax.lax.stop_gradient(z)
                noise = jax.random.normal(k_noise, z.shape)
                latents_noisy = sch.add_noise(acp, z_sg, noise, t)
                if individual:
                    v_pred = zero123plus._cfg_v_pred_individual(
                        hot["zp_params"], latents_noisy, t,
                        hot["cond_lat_pair"], hot["encoder_hidden_states"],
                        hot["depth_grid"], gs_i, gs_t, k_teach,
                        scale_input=lambda x: x,
                        cn_cond_emb=hot["cn_cond_emb"])
                else:
                    v_pred = zero123plus._cfg_v_pred(
                        hot["zp_params"], latents_noisy, t,
                        hot["cond_lat_pair"], hot["encoder_hidden_states"],
                        hot["depth_grid"], guidance_scale, k_teach,
                        scale_input=lambda x: x,
                        cn_cond_emb=hot["cn_cond_emb"])
                v_pred = jax.lax.stop_gradient(v_pred)
                v = sch.velocity_target(acp, z_sg, noise, t)
                w = (1 - acp[t]).reshape(-1, 1, 1, 1)
                sqrt_acp = jnp.sqrt(acp[t]).reshape(-1, 1, 1, 1)
                g = grad_scale * w * sqrt_acp * (v_pred - v)
                g = jnp.nan_to_num(g)
                targets = jax.lax.stop_gradient(z_sg - g)
                z_tiles = split_grid_to_6(z, lat_tile)
                tgt_tiles = split_grid_to_6(targets, lat_tile)
                sds_loss = 0.5 * jnp.sum(
                    (z_tiles[tile_idx] - tgt_tiles[tile_idx]) ** 2
                ) / z.shape[0]
                return sds_loss, (grid, v_pred, v, w)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            grid, v_pred, v, w = aux
            grad_norm = optax.global_norm(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            fisher = jnp.sum((jnp.sqrt(acp[t]) /
                              jnp.clip(jnp.sqrt(1 - acp[t]), 1e-8)) ** 2
                             * jnp.abs(v_pred - v) ** 2)
            return params, opt_state, loss, grad_norm, fisher, grid

        if mesh is None:
            return jax.jit(sds_step), optimizer, hot

        if "sp" in mesh.axis_names and mesh.shape["sp"] > 1:
            # sequence parallelism: while TRACING the step, route eligible
            # teacher attention through ring attention over the sp axis
            # (ops/attention.sequence_parallel; parallel/ring.py)
            from contexture_nerf_tpu.ops.attention import sequence_parallel

            inner_step = sds_step

            def sds_step(params, opt_state, t, key, hot):
                with sequence_parallel(mesh):
                    return inner_step(params, opt_state, t, key, hot)

        rep = NamedSharding(mesh, P())

        def hot_sharding(x):
            if not hasattr(x, "shape"):
                return rep
            if x.ndim == 4:  # canvas tensors: shard H (dim 2)
                return NamedSharding(mesh, shard_spec(x, 2))
            if x.ndim == 2 and x.shape[-1] == 2:  # uv points: shard rows
                return NamedSharding(mesh, shard_spec(x, 0))
            return rep

        # tensor parallelism: Megatron-style tower shardings over the `tp`
        # mesh axis (parallel/tp.py); replicated otherwise
        tp_on = "tp" in mesh.axis_names and mesh.shape["tp"] > 1
        if tp_on:
            from contexture_nerf_tpu.parallel.tp import tp_param_specs

            zp_sh_tree = tp_param_specs(hot["zp_params"], mesh, "tp")
            vae_sh_tree = tp_param_specs(hot["vae_params"], mesh, "tp")
        else:
            zp_sh_tree = jax.tree.map(lambda x: rep, hot["zp_params"])
            vae_sh_tree = jax.tree.map(lambda x: rep, hot["vae_params"])

        hot_sh = {
            "cache6": jax.tree.map(lambda x: rep, hot["cache6"]),
            "depth_grid": hot_sharding(hot["depth_grid"]),
            # NHWC: shard H (dim 1), matching the canvas tensors' H split
            "cn_cond_emb": NamedSharding(mesh,
                                         shard_spec(hot["cn_cond_emb"], 1)),
            "cond_lat_pair": hot_sharding(hot["cond_lat_pair"]),
            "encoder_hidden_states": rep,
            "zp_params": zp_sh_tree,
            "vae_params": vae_sh_tree,
            "uv_grid_pts": (hot_sharding(hot["uv_grid_pts"])
                            if hot["uv_grid_pts"] is not None else None),
            "mask_grid": (hot_sharding(hot["mask_grid"])
                          if hot["mask_grid"] is not None else None),
            "emb_pts": (NamedSharding(mesh, shard_spec(hot["emb_pts"], 0))
                        if hot["emb_pts"] is not None else None),
            "edit_mask_pts": (
                NamedSharding(mesh, shard_spec(hot["edit_mask_pts"], 0))
                if hot["edit_mask_pts"] is not None else None),
            "tile_probs": rep,
        }
        hot = jax.tree.map(jax.device_put, hot, hot_sh)
        step = jax.jit(
            sds_step,
            in_shardings=(None, None, rep, rep, hot_sh),
            out_shardings=None)
        return step, optimizer, hot

    def paint_zero123plus(self):
        """The SDS texture loop (reference trainer.py:545-911)."""
        logger.info("Starting SDS Texture Generation ^_^")
        setup = self.prepare_sds()
        mesh = self._make_mesh()
        if mesh is not None:
            logger.info(f"SDS step sharded over {mesh.shape} device mesh")
        sds_step_jit, optimizer, hot = self._build_sds_step(setup, mesh)

        iterations = self.cfg.optim.sds_iterations
        acp = self.zero123plus.alphas_cumprod
        t_schedule = sch.dreamtime_schedule(acp, iterations, m=500, s=125)

        params = self.texture_params
        opt_state = optimizer.init(params)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            params = jax.device_put(params, rep)
            opt_state = jax.device_put(opt_state, rep)

        if os.environ.get("CTN_DUMP_SDS_MEM"):
            t0_ = jnp.asarray([500], jnp.int32)
            k0_ = jax.random.PRNGKey(0)
            comp = sds_step_jit.lower(
                params, opt_state, t0_, k0_, hot).compile()
            ma = comp.memory_analysis()
            logger.info(
                f"sds_step memory: temp {ma.temp_size_in_bytes/2**30:.2f} GB "
                f"args {ma.argument_size_in_bytes/2**30:.2f} GB "
                f"out {ma.output_size_in_bytes/2**30:.2f} GB")

        # full-fidelity resume: params + opt_state + RNG key + iteration
        start_iter = 0
        if self.cfg.optim.resume:
            from contexture_nerf_tpu.core.checkpoint import latest_iteration

            latest = latest_iteration(self.ckpt_path)
            if latest is not None:
                restored = self._restore_checkpoint(latest, params, opt_state)
                params = restored["params"]
                if restored.get("opt_state") is not None:
                    opt_state = restored["opt_state"]
                if restored.get("rng_key") is not None:
                    self.key = jnp.asarray(restored["rng_key"])
                start_iter = int(restored["iteration"])
                logger.info(f"Resumed from checkpoint iter {start_iter}")

        metrics_log: List[Dict[str, Any]] = []
        if start_iter > 0 and (self.exp_path / "metrics.json").exists():
            # keep the pre-interruption metric history on resume
            try:
                prev = json.loads(
                    (self.exp_path / "metrics.json").read_text())
                metrics_log = [m for m in prev if m["iter"] < start_iter]
            except (json.JSONDecodeError, KeyError):
                pass
        ikl_running_avg = None
        t_schedule_np = np.asarray(t_schedule)
        if self.cfg.log.log_images:
            # pre-compile the logging graphs (texture-map render + uint8
            # quantize): their first-call compile otherwise lands inside the
            # loop's first timing window and on its critical path
            if not hasattr(self, "_texmap_jit"):
                model = self.mesh_model
                self._texmap_jit = jax.jit(
                    lambda p: self._quantize_u8(
                        model.get_texture_map(p)[0][0]))
            jax.block_until_ready(self._texmap_jit(params))
            if not hasattr(self, "_quant_jit"):
                self._quant_jit = jax.jit(self._quantize_u8)
            grid_hw = (3 * self.tile_px, 2 * self.tile_px)
            jax.block_until_ready(
                self._quant_jit(jnp.zeros((3,) + grid_hw, jnp.float32)))
        t0 = time.time()
        win_t0, win_i0 = None, start_iter
        for i in range(start_iter, iterations):
            self.key, sub = jax.random.split(self.key)
            t = jnp.asarray([int(t_schedule_np[i])], jnp.int32)
            with profiler.phase("sds_step"):
                params, opt_state, loss, grad_norm, fisher, grid = \
                    sds_step_jit(params, opt_state, t, sub, hot)
            if i % 50 == 0 or i == iterations - 1:
                loss_f = float(loss)
                # float(loss) drained the device queue: note the
                # sync-to-sync window so timings.json carries the
                # device-inclusive per-iteration rate, not just the ~6 ms
                # async dispatch time the phase above measures
                if win_t0 is not None and i > win_i0:
                    profiler.GLOBAL_TIMINGS.note_window(
                        "sds_step", i - win_i0, time.time() - win_t0)
                fisher_f = float(fisher)
                ikl_running_avg = (fisher_f if ikl_running_avg is None
                                   else 0.99 * ikl_running_avg
                                   + 0.01 * fisher_f)
                entry = {"iter": i, "sds_loss": loss_f,
                         "grad_norm": float(grad_norm),
                         "fisher_divergence_t": fisher_f,
                         "ikl_running_avg": ikl_running_avg,
                         "t": int(t_schedule_np[i]),
                         "elapsed_s": time.time() - t0}
                if i % 250 == 0 or i == iterations - 1:
                    # cross-view color consistency (reference computes it with
                    # weight 0 at trainer.py:429-531/856-863; logged as a
                    # metric). Its own phase: the first call compiles a
                    # 7-view render (~10 s) and must not be silently folded
                    # into the loop's window rate.
                    with profiler.phase("view_consistency_metric"):
                        entry["view_consistency"] = float(
                            self._view_consistency_metric(params))
                metrics_log.append(entry)
                logger.info(f"iter {i}: sds_loss={loss_f:.4f} "
                            f"t={int(t_schedule_np[i])} "
                            f"grad_norm={float(grad_norm):.4g}")
                if self._wandb is not None:
                    self._wandb.log(metrics_log[-1])
                # restart the window AFTER the sync-point metric work so
                # window_iter_ms reflects loop iterations, not the
                # once-per-250-iters metric (or its first-call compile)
                win_t0, win_i0 = time.time(), i
            if self.cfg.log.log_images and \
                    ((i % 10 == 0 and i < 1000) or i % 100 == 0):
                # reference image cadence (trainer.py:902-904)
                self.log_texture_map(params, i)
                self.log_train_image(
                    (unscale_image(grid) + 1) / 2,
                    f"rendered_grid_clean_{i}")
            interval = self.cfg.optim.checkpoint_interval
            if interval > 0 and (i + 1) % interval == 0 \
                    and (i + 1) < iterations:
                self.texture_params = params
                self.save_checkpoint(params, opt_state, i + 1)
                # metrics survive a genuine interruption, not just the
                # resume-after-success test scenario
                (self.exp_path / "metrics.json").write_text(
                    json.dumps(metrics_log, indent=1))

        self.texture_params = params
        (self.exp_path / "metrics.json").write_text(
            json.dumps(metrics_log, indent=1))
        self.save_checkpoint(params, opt_state, iterations)
        self._median_eval = True  # change_default_to_median (trainer.py:909)
        logger.info("Finished SDS Painting ^_^")
        self.full_eval()
        self._img_writer.flush()  # surface any failed/pending log writes
        profiler.GLOBAL_TIMINGS.dump(self.exp_path / "timings.json")

    def _view_consistency_metric(self, params) -> jnp.ndarray:
        """Render the 6 target views at reduced resolution with the current
        texture and compute the cross-view consistency score
        (reference compute_view_consistency, trainer.py:429-531)."""
        if not hasattr(self, "_consistency_jit"):
            dims = min(192, self.cfg.render.train_grid_size)
            cache = jax.jit(partial(self.mesh_model.render_geometry,
                                    dims=(dims, dims)))(
                jnp.asarray(self.thetas[1:], jnp.float32),
                jnp.asarray(self.phis[1:], jnp.float32),
                jnp.asarray(self.radii[1:], jnp.float32))
            model = self.mesh_model
            n_verts = int(model.faces.max()) + 1

            def f(p, cache):
                V, H, W = cache.face_idx.shape
                uv = cache.uv_features.reshape(-1, 2)
                rgb = model.query_texture_at_uv(p, uv, allow_fused=False)
                imgs = jnp.transpose(rgb.reshape(V, H, W, 3), (0, 3, 1, 2))
                imgs = imgs * cache.mask + 0.5 * (1 - cache.mask)
                from contexture_nerf_tpu.ops.view_consistency import (
                    compute_view_consistency)

                return compute_view_consistency(
                    imgs, model.faces, cache.face_idx,
                    cache.face_vertices_image, n_vertices=n_verts)

            self._consistency_cache = cache
            self._consistency_jit = jax.jit(f)
        return self._consistency_jit(params, self._consistency_cache)

    def compute_view_consistency(self, rendered_views, render_cache):
        """Cross-view color-consistency metric (reference trainer.py:429-531;
        disabled in the reference loss, exposed here as a metric)."""
        from contexture_nerf_tpu.ops.view_consistency import (
            compute_view_consistency)

        return compute_view_consistency(
            rendered_views, self.mesh_model.faces,
            render_cache.face_idx, render_cache.face_vertices_image)

    # -- front-view bootstrap ---------------------------------------------------

    def paint_viewpoint(self, data: Dict[str, Any],
                        should_project_back: bool = True):
        """(reference trainer.py:971-1117). should_project_back is kept for
        signature parity but is DEAD, exactly as in the reference: its
        consumer `project_back` is undefined there (trainer.py:1081-1086,
        documented non-port in PARITY.md) and the one live call site passes
        False (reference trainer.py:559)."""
        self.paint_step += 1
        logger.info(f"--- Painting step #{self.paint_step} ---")
        theta, phi, radius = data["theta"], data["phi"], data["radius"]
        phi = phi - np.deg2rad(self.cfg.render.front_offset)
        phi = float(phi + 2 * np.pi if phi < 0 else phi)
        logger.info(
            f"Painting from theta: {theta}, phi: {phi}, radius: {radius}")

        if self.cfg.guide.use_background_color:
            background = jnp.array([0.0, 0.8, 0.0])
        else:
            sz = self.cfg.render.train_grid_size
            background = resize_bilinear(self.back_im[None], sz, sz)

        # median default-fill on repaint passes (reference trainer.py:1001)
        outputs = self._render_pose_jit(use_median=self.paint_step > 1)(
            self.texture_params, jnp.asarray([theta], jnp.float32),
            jnp.asarray([phi], jnp.float32),
            jnp.asarray([radius], jnp.float32), background)
        rgb_render = outputs["image"]
        depth_render = outputs["depth"]
        object_mask = outputs["mask"]

        self.log_train_image(rgb_render, "paint_viewpoint:rgb_render")

        if self.cfg.guide.use_zero123plus:
            text_z = self.text_z[1]
        else:
            text_z = self.text_z
        bbox = get_nonzero_region_tuple(np.asarray(object_mask[0, 0]))
        mh, mw, Mh, Mw = bbox
        cropped_rgb = rgb_render[:, :, mh:Mh, mw:Mw]
        cropped_depth = depth_render[:, :, mh:Mh, mw:Mw]
        cropped_mask = object_mask[:, :, mh:Mh, mw:Mw]

        self.diffusion.use_inpaint = (self.cfg.guide.use_inpainting
                                      and self.paint_step > 1)
        start = time.perf_counter()
        cropped_rgb_output, steps_vis = self.diffusion.img2img_step(
            text_z, cropped_rgb, cropped_depth,
            guidance_scale=self.cfg.guide.guidance_scale,
            strength=1.0, update_mask=cropped_mask,
            fixed_seed=self.cfg.optim.seed,
            intermediate_vis=self.cfg.log.vis_diffusion_steps)
        logger.info(f"img2img elapsed: {time.perf_counter() - start:.2f}s")
        self.log_diffusion_steps(steps_vis)

        # paste the generated crop back into the full frame
        cropped_rgb_output = resize_bilinear(cropped_rgb_output,
                                             Mh - mh, Mw - mw)
        rgb_output = rgb_render.at[:, :, mh:Mh, mw:Mw].set(cropped_rgb_output)
        self.log_train_image(rgb_output, "full_output")
        return rgb_output, object_mask

    # -- eval ---------------------------------------------------------------------

    def _build_eval_render(self, dim: int, use_median: bool, mesh=None):
        """One jitted eval-render graph per (dim, median, batch) signature —
        eager per-op dispatch is expensive through the device tunnel. With a
        device mesh, the pose batch shards over the `views` axis (turntable
        frames are the eval data-parallel axis, SURVEY.md §2.3 table) and
        params replicate."""
        model = self.mesh_model

        def f(params, theta, phi, radius):
            outputs = model.render(params, theta=theta, phi=phi,
                                   radius=radius, dims=(dim, dim),
                                   background="white",
                                   use_median=use_median)
            z_normals = jnp.clip(outputs["normals"][:, -1:], 0, 1)
            rgb_render = outputs["image"]
            default = jnp.asarray(model.default_color).reshape(1, 3, 1, 1)
            diff = jnp.abs(rgb_render - default).sum(axis=1)
            uncolored = (diff < 0.1).astype(rgb_render.dtype)[:, None]
            shade = color_with_shade([0.85, 0.85, 0.85], z_normals,
                                     light_coef=0.3)
            rgb_render = rgb_render * (1 - uncolored) + shade * uncolored
            rgb = jnp.clip(jnp.transpose(rgb_render, (0, 2, 3, 1)), 0, 1)
            texture = jnp.clip(
                jnp.transpose(outputs["texture_map"], (0, 2, 3, 1)), 0, 1)
            depth = jnp.transpose(outputs["depth"], (0, 2, 3, 1))
            return rgb, texture, depth, z_normals

        if mesh is None:
            return jax.jit(f)
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        shv = NamedSharding(mesh, P("views"))
        return jax.jit(f, in_shardings=(None, shv, shv, shv),
                       out_shardings=(shv, rep, shv, shv))

    def _eval_jit_for(self, batch: int, mesh=None):
        dim = self.cfg.render.eval_grid_size
        sig = ("eval_render", dim, self._median_eval, batch,
               mesh is not None)
        if not hasattr(self, "_eval_jit"):
            self._eval_jit = {}
        if sig not in self._eval_jit:
            self._eval_jit[sig] = self._build_eval_render(
                dim, self._median_eval, mesh)
        return self._eval_jit[sig]

    def _adjust_phi(self, phi) -> float:
        phi = phi - np.deg2rad(self.cfg.render.front_offset)
        return float(phi + 2 * np.pi if phi < 0 else phi)

    def eval_render(self, data):
        """(reference trainer.py:1119-1157)"""
        return self._eval_jit_for(1)(
            self.texture_params,
            jnp.asarray([data["theta"]], jnp.float32),
            jnp.asarray([self._adjust_phi(data["phi"])], jnp.float32),
            jnp.asarray([data["radius"]], jnp.float32))

    def evaluate(self, dataloader, save_path: Path,
                 save_as_video: bool = False):
        logger.info(f"Evaluating and saving model, painting iteration "
                    f"#{self.paint_step}...")
        save_path.mkdir(exist_ok=True, parents=True)
        all_preds = []
        texture = None

        poses = list(dataloader)
        mesh = self._make_mesh()
        chunk = mesh.shape["views"] if mesh is not None else 1
        eval_fn = self._eval_jit_for(chunk, mesh)
        thetas = np.asarray([p["theta"] for p in poses], np.float32)
        phis = np.asarray([self._adjust_phi(p["phi"]) for p in poses],
                          np.float32)
        radii = np.asarray([p["radius"] for p in poses], np.float32)
        n = len(poses)
        pad = (-n) % chunk
        if pad:  # repeat the last pose to fill the sharded batch
            thetas = np.concatenate([thetas, np.repeat(thetas[-1:], pad)])
            phis = np.concatenate([phis, np.repeat(phis[-1:], pad)])
            radii = np.concatenate([radii, np.repeat(radii[-1:], pad)])

        # pipelined dispatch with a BOUNDED in-flight window: each chunk is
        # dispatched (device-side uint8 quantization + async device->host
        # copy) so the frame fetch (dim^2 x 3 bytes instead of x12 f32)
        # overlaps the next chunk's render — but at most _EVAL_INFLIGHT
        # chunks hold device buffers at once (an unbounded window held every
        # frame until the loop ended: ~300 MB device-side at 100 poses x
        # 1024^2 next to the towers)
        if not hasattr(self, "_quant_jit"):
            self._quant_jit = jax.jit(self._quantize_u8)
        from collections import deque

        from PIL import Image

        pending = deque()
        # steady per-frame eval rate, compile excluded: window from the
        # first chunk's materialization (which absorbs the eval-render
        # compile) to the last — bench.project_full_run uses the resulting
        # window_iter_ms so the one-time compile is not charged per pose
        win = {"t_first": None, "frames": 0}

        def drain_one():
            start, pq, bad = pending.popleft()
            if int(np.asarray(bad)):
                raise ValueError(
                    "Tensor contains NaNs or infinite values "
                    f"(eval frames {start}..{start + chunk - 1})")
            arr = np.asarray(pq)
            if win["t_first"] is None:
                win["t_first"] = time.perf_counter()
            else:
                win["frames"] += min(chunk, n - start)
            for j in range(min(chunk, n - start)):
                i = start + j
                if save_as_video:
                    all_preds.append(arr[j])
                else:
                    Image.fromarray(arr[j]).save(
                        save_path / f"eval_rendered_{i:04d}_rgb.jpg")

        for start in range(0, n + pad, chunk):
            sl = slice(start, start + chunk)
            preds, textures, depths, normals = eval_fn(
                self.texture_params, jnp.asarray(thetas[sl]),
                jnp.asarray(phis[sl]), jnp.asarray(radii[sl]))
            texture = textures
            pq, bad = self._quant_jit(preds)
            for a in (pq, bad):
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
            pending.append((start, pq, bad))
            if len(pending) >= self._EVAL_INFLIGHT:
                drain_one()
        while pending:
            drain_one()
        if win["t_first"] is not None and win["frames"] > 0:
            profiler.GLOBAL_TIMINGS.note_window(
                "eval", win["frames"], time.perf_counter() - win["t_first"])
        Image.fromarray(tensor2numpy(texture[0])).save(
            save_path / "eval_texture_atlas.png")
        if save_as_video and all_preds:
            import imageio

            stacked = np.stack(all_preds, axis=0)
            base = save_path / \
                f"eval_video_all_rendered_rgb_{self.cfg.optim.seed}"
            try:
                imageio.mimsave(base.with_suffix(".mp4"), stacked, fps=25,
                                quality=8, macro_block_size=1)
            except (ValueError, ImportError):
                # no ffmpeg backend in this environment: fall back to GIF
                imageio.mimsave(base.with_suffix(".gif"), stacked, fps=25)
        logger.info("Eval Done!")

    def full_eval(self, output_dir: Optional[Path] = None):
        output_dir = output_dir or self.final_renders_path
        self._img_writer.flush()  # train-loop log writes land before eval's
        with profiler.phase("eval"):
            self.evaluate(self.dataloaders["val_large"], output_dir,
                          save_as_video=True)
        if self.cfg.log.save_mesh:
            save_path = make_path(self.exp_path / "mesh")
            logger.info(f"Saving mesh to {save_path}")
            with profiler.phase("export"):
                self.mesh_model.export_mesh(save_path, self.texture_params)
            logger.info("\t Full Eval Done!")

    # -- checkpointing (new capability; SURVEY.md §5: the reference creates an
    # always-empty checkpoints/ dir, trainer.py:118) --------------------------

    def save_checkpoint(self, params, opt_state, iteration: int):
        """Full-fidelity snapshot: params + optimizer state + RNG key +
        iteration, so a resumed run is bit-identical to an uninterrupted
        one (tests/test_e2e.py::test_resume_matches_uninterrupted)."""
        from contexture_nerf_tpu.core import checkpoint as ckpt

        ckpt.save(self.ckpt_path / f"iter_{iteration:06d}", params,
                  opt_state=opt_state, iteration=iteration,
                  rng_key=self.key)

    def _restore_checkpoint(self, iteration: int, params_like, opt_state_like):
        """Typed restore (optax NamedTuple states need a structure target).
        Old-format checkpoints (params+iteration only) restore untyped; a
        full-payload checkpoint that fails the typed restore is a real error
        (shape/config mismatch, corruption) and propagates."""
        from contexture_nerf_tpu.core import checkpoint as ckpt

        path = self.ckpt_path / f"iter_{iteration:06d}"
        raw = ckpt.restore(path)
        if "opt_state" not in raw:
            return raw  # old format: nothing typed to recover
        target = {"params": params_like, "opt_state": opt_state_like,
                  "iteration": 0, "rng_key": np.asarray(self.key)}
        return ckpt.restore(path, target)

    def load_checkpoint(self, iteration: int):
        from contexture_nerf_tpu.core import checkpoint as ckpt

        restored = ckpt.restore(self.ckpt_path / f"iter_{iteration:06d}")
        self.texture_params = restored["params"]
        return restored

    # -- logging --------------------------------------------------------------------

    @staticmethod
    def _quantize_u8(tensor):
        """Device-side half of image logging: clip + scale to uint8 BEFORE
        the device->host copy (4x less tunnel traffic than f32; the NaN
        guard must therefore run here — uint8 can't carry NaN/Inf)."""
        t = jnp.asarray(tensor).astype(jnp.float32)
        bad = jnp.logical_not(jnp.all(jnp.isfinite(t)))
        q = (jnp.clip(t, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return q, bad.astype(jnp.uint8)

    @staticmethod
    def _write_chw_image(path):
        """Writer-thread half of image logging: materialize, guard, encode,
        save. Runs off the loop thread via core/imagewriter.py. Receives the
        (uint8 CHW image, nan-flag) pair from _quantize_u8."""
        from PIL import Image

        def write(packed):
            arr, bad = packed
            if int(bad):
                raise ValueError(
                    f"Tensor contains NaNs or infinite values ({path})")
            arr = np.asarray(arr).transpose(1, 2, 0)
            if arr.shape[-1] == 4:
                arr = arr[..., :3]
            Image.fromarray(arr).save(path)

        return write

    def log_train_image(self, tensor, name: str, file_type: str = "jpg",
                        colormap: bool = False):
        """(reference log_train_image, trainer.py:1162-1177; colormap routes
        a (H,W) scalar map through the seismic colormap). The device clip is
        dispatched here; fetch/encode/IO run on the writer thread."""
        if not self.cfg.log.log_images:
            return
        path = self.train_renders_path / f"debug_{name}.{file_type}"
        if colormap:
            from contexture_nerf_tpu.ops.image import save_colormap

            self._img_writer.submit(tensor,
                                    lambda arr: save_colormap(arr, path))
            return
        if not hasattr(self, "_quant_jit"):
            self._quant_jit = jax.jit(self._quantize_u8)
        self._img_writer.submit(self._quant_jit(jnp.asarray(tensor)[0]),
                                self._write_chw_image(path))

    def log_diffusion_steps(self, intermediate_vis):
        """Save intermediate denoise frames to a per-paint-step folder
        (reference log_diffusion_steps, trainer.py:1179-1185)."""
        if not intermediate_vis:
            return
        folder = (self.train_renders_path
                  / f"{self.paint_step:04d}_diffusion_steps")
        folder.mkdir(exist_ok=True, parents=True)
        if not hasattr(self, "_quant_jit"):
            self._quant_jit = jax.jit(self._quantize_u8)
        for k, frame in enumerate(intermediate_vis):
            self._img_writer.submit(
                self._quant_jit(jnp.asarray(frame)[0]),
                self._write_chw_image(folder / f"{k:02d}_diffusion_step.jpg"))

    def log_texture_map(self, params, iteration: int):
        # jitted: the eager 1M-point lattice query materializes every MLP
        # activation in HBM (~1 GB each at res=1024), and this runs at the
        # reference's 10/100-iter cadence; the uint8 quantization rides the
        # same graph so only 1 byte/px crosses the tunnel
        if not hasattr(self, "_texmap_jit"):
            model = self.mesh_model
            self._texmap_jit = jax.jit(
                lambda p: self._quantize_u8(model.get_texture_map(p)[0][0]))
        self._img_writer.submit(
            self._texmap_jit(params), self._write_chw_image(
                self.train_renders_path
                / f"texture_map_iter_{iteration:06d}.png"))
