"""SD2-depth guidance: text embedding, depth-conditioned img2img, SDS.

Replaces the reference's StableDiffusion wrapper
(src/stable_diffusion_depth.py:27-1031). Differences by design:

  - the whole 50-step PNDM denoise loop is ONE jitted graph (lax.scan over
    steps, lax.cond between the depth UNet and the 9-ch inpaint UNet for
    steps 10<i<20) — the reference re-enters Python + torch per step;
  - randomness is explicit key-threading (the reference reseeds global RNGs,
    stable_diffusion_depth.py:312-313);
  - weights come from convert_* (diffusion/weights.py) when local checkpoints
    exist, random init otherwise (zero-egress test environments).

Dead reference paths intentionally not rebuilt (SURVEY.md §7): zero123 /
control_zero123 second-model branches (their checkpoints are absent from the
reference repo), zero123plus_img2img_step (never called), textual-inversion
concept loading is accepted but requires a local embedding file.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from contexture_nerf_tpu.core.fastinit import maybe_jit_init
import numpy as np

from contexture_nerf_tpu.diffusion import schedulers as sch
from contexture_nerf_tpu.diffusion.clip import (CLIPTextConfig, CLIPTextModel,
                                                CLIPTokenizer)
from contexture_nerf_tpu.diffusion.unet import UNet2DCondition, UNetConfig
from contexture_nerf_tpu.diffusion.vae import (AutoencoderKL, VAEConfig,
                                               sample_gaussian)

SD_VAE_SCALE = 0.18215  # reference stable_diffusion_depth.py:973,988


@dataclass
class SDWeightPaths:
    """Local checkpoint directories (diffusers layout); all optional."""

    unet: Optional[str] = None
    inpaint_unet: Optional[str] = None
    vae: Optional[str] = None
    text_encoder: Optional[str] = None
    tokenizer_vocab: Optional[str] = None
    tokenizer_merges: Optional[str] = None

    @staticmethod
    def from_snapshot(root: Optional[str] = None,
                      inpaint_root: Optional[str] = None) -> "SDWeightPaths":
        """Resolve a diffusers snapshot directory into component paths.

        `root` is an SD2-depth-style snapshot (unet/vae/text_encoder/
        tokenizer subfolders — the layout `guide.diffusion_name` points at
        when it is a local directory; reference loads the same subfolders by
        name, stable_diffusion_depth.py:58-100). `inpaint_root` is an
        SD2-inpaint snapshot (guide.inpaint_model_path); only its unet is
        consumed (reference :71-74). Missing subfolders stay None (random
        init)."""
        from pathlib import Path

        wp = SDWeightPaths()
        if root is not None:
            root = Path(root)
            for attr, sub in (("unet", "unet"), ("vae", "vae"),
                              ("text_encoder", "text_encoder")):
                p = root / sub
                if p.exists():
                    setattr(wp, attr, str(p))
            vocab = root / "tokenizer" / "vocab.json"
            merges = root / "tokenizer" / "merges.txt"
            if vocab.exists() and merges.exists():
                wp.tokenizer_vocab = str(vocab)
                wp.tokenizer_merges = str(merges)
        if inpaint_root is not None:
            ip = Path(inpaint_root)
            wp.inpaint_unet = str(ip / "unet" if (ip / "unet").exists()
                                  else ip)
        return wp


class StableDiffusionDepth:
    """SD2-depth (+ SD2-inpaint) guidance stack."""

    def __init__(self,
                 min_timestep: float = 0.02, max_timestep: float = 0.98,
                 no_noise: bool = False, use_inpaint: bool = True,
                 weight_paths: Optional[SDWeightPaths] = None,
                 tiny: bool = False,
                 dtype: jnp.dtype = jnp.float32,
                 seed: int = 0):
        self.num_train_timesteps = 1000
        self.min_step = int(self.num_train_timesteps * min_timestep)
        self.max_step = int(self.num_train_timesteps * max_timestep)
        self.no_noise = no_noise
        self.use_inpaint = use_inpaint
        self.dtype = dtype

        if tiny:
            self.unet_config = UNetConfig.tiny(in_channels=5)
            self.inpaint_config = UNetConfig.tiny(in_channels=9)
            self.vae_config = VAEConfig.tiny()
            self.text_config = CLIPTextConfig.tiny()
        else:
            self.unet_config = UNetConfig.sd2_depth()
            self.inpaint_config = UNetConfig.sd2_inpaint()
            self.vae_config = VAEConfig.sd()
            self.text_config = CLIPTextConfig.sd2()

        self.unet = UNet2DCondition(self.unet_config, dtype=dtype)
        self.inpaint_unet = (UNet2DCondition(self.inpaint_config, dtype=dtype)
                             if use_inpaint else None)
        self.vae = AutoencoderKL(self.vae_config, dtype=dtype)
        self.text_encoder = CLIPTextModel(self.text_config, dtype=dtype)
        wp = weight_paths or SDWeightPaths()
        self.tokenizer = CLIPTokenizer(
            vocab_path=wp.tokenizer_vocab, merges_path=wp.tokenizer_merges,
            vocab_size=self.text_config.vocab_size)

        self.scheduler = sch.PNDM.create(self.num_train_timesteps)
        self.alphas = self.scheduler.alphas_cumprod

        self.params = self._init_or_load(wp, seed)
        self._jit_cache: Dict[Any, Any] = {}

    # -- weights -------------------------------------------------------------

    def _cast(self, tree):
        """Parameter precision policy: big stacks live in the compute dtype
        (bf16 on TPU halves HBM: both SD2 UNets + Zero123++ would not fit in
        16 GB at f32). Norm math still accumulates f32 (see layers.py)."""
        if self.dtype == jnp.float32:
            return tree
        return jax.tree.map(
            lambda x: x.astype(self.dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def _init_or_load(self, wp: SDWeightPaths, seed: int) -> Dict[str, Any]:
        from contexture_nerf_tpu.diffusion import weights as W

        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 4)
        ctx_dim = self.unet_config.cross_attention_dim
        lat_res = 8
        params: Dict[str, Any] = {}

        if wp.unet:
            params["unet"] = self._cast(W.convert_unet(W.load_state_dict(wp.unet),
                                            self.unet_config))
        else:
            params["unet"] = self._cast(maybe_jit_init(self.unet.init, 
                ks[0], jnp.zeros((1, self.unet_config.in_channels, lat_res,
                                  lat_res)),
                jnp.array([0]), jnp.zeros((1, 77, ctx_dim))))
        if self.use_inpaint:
            if wp.inpaint_unet:
                params["inpaint_unet"] = self._cast(W.convert_unet(
                    W.load_state_dict(wp.inpaint_unet), self.inpaint_config))
            else:
                params["inpaint_unet"] = self._cast(
                    maybe_jit_init(self.inpaint_unet.init, 
                        ks[1], jnp.zeros((1, 9, lat_res, lat_res)),
                        jnp.array([0]), jnp.zeros((1, 77, ctx_dim))))
        if wp.vae:
            params["vae"] = self._cast(W.convert_vae(W.load_state_dict(wp.vae),
                                          self.vae_config))
        else:
            params["vae"] = self._cast(maybe_jit_init(self.vae.init, 
                ks[2], jnp.zeros((1, 3, 8 * lat_res, 8 * lat_res)), ks[2]))
        if wp.text_encoder:
            params["text"] = self._cast(W.convert_clip_text(
                W.load_state_dict(wp.text_encoder), self.text_config))
        else:
            params["text"] = self._cast(maybe_jit_init(self.text_encoder.init, 
                ks[3], jnp.zeros((1, 77), jnp.int32)))
        return params

    # -- text ----------------------------------------------------------------

    def get_text_embeds(self, prompts, negative_prompts=None) -> jnp.ndarray:
        """[uncond; cond] CFG embedding pair (reference
        stable_diffusion_depth.py:222-244)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        if negative_prompts is None:
            negative_prompts = [""] * len(prompts)
        ids = jnp.asarray(self.tokenizer(prompts))
        uids = jnp.asarray(self.tokenizer(negative_prompts))
        # cache the jitted apply: a fresh jax.jit per call is keyed on a new
        # function object and re-traces the text tower every prompt
        if not hasattr(self, "_text_apply_jit"):
            self._text_apply_jit = jax.jit(self.text_encoder.apply)
        cond = self._text_apply_jit(self.params["text"], ids)
        uncond = self._text_apply_jit(self.params["text"], uids)
        return jnp.concatenate([uncond, cond], axis=0)

    # -- VAE helpers ----------------------------------------------------------

    def encode_imgs(self, imgs: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """[0,1] images -> scaled latents (reference :982-990)."""
        mean, logvar = self.vae.apply(self.params["vae"], 2 * imgs - 1,
                                      method=self.vae.encode_moments)
        return sample_gaussian(mean, logvar, key) * SD_VAE_SCALE

    def decode_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        """scaled latents -> [0,1] images (reference :971-980)."""
        imgs = self.vae.apply(self.params["vae"], latents / SD_VAE_SCALE,
                              method=self.vae.decode)
        return jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)

    # -- img2img --------------------------------------------------------------

    def _build_img2img(self, num_inference_steps: int, image_size: int,
                       use_inpaint: bool, use_latent_blending: bool,
                       intermediate_vis: bool = False, strength: float = 1.0,
                       noised_gt_init: bool = False):
        """Compile the full denoise loop once per static signature.
        intermediate_vis additionally decodes ~10 evenly-spaced intermediate
        latents from the scan (reference stable_diffusion_depth.py:501-511
        collects PIL frames per step; here the frames come out of the same
        jitted graph).

        strength follows the reference's get_timesteps (:310): run the last
        int(n*strength) scheduler steps. noised_gt_init mirrors the
        reference's update_mask=None branch (:322-327): start from the
        noised ground-truth latent at the first kept timestep instead of
        pure noise (with an update mask the reference replaces the latent
        with pure noise and keeps gt for blending — the default path here).
        """
        pndm = self.scheduler
        init_t = min(int(num_inference_steps * strength),
                     num_inference_steps)
        t_start = max(num_inference_steps - init_t, 0)
        timesteps = pndm.timesteps(num_inference_steps)[t_start:]
        vae_down = 2 ** (len(self.vae_config.block_out_channels) - 1)
        lat_sz = image_size // vae_down
        inpaint_on = use_inpaint and self.inpaint_unet is not None
        n_vis = min(10, int(timesteps.shape[0]))

        def run(params, text_embeddings, rgb, depth, update_mask,
                guidance_scale, key):
            # rgb: (1,3,S,S) in [0,1]; depth: (1,1,S,S); update_mask (1,1,S,S)
            k_enc, k_enc2, k_lat, k_noise = jax.random.split(key, 4)
            depth64 = (depth if depth.shape[2:] == (lat_sz, lat_sz) else
                       jax.image.resize(depth, (1, 1, lat_sz, lat_sz),
                                        method="bicubic"))
            dmin = depth64.min()
            dmax = depth64.max()
            depth64 = 2.0 * (depth64 - dmin) / jnp.maximum(dmax - dmin,
                                                           1e-8) - 1.0
            depth_pair = jnp.concatenate([depth64] * 2)

            # VAE weights come from the params ARGUMENT (the closure methods
            # read self.params at trace time, which would bake stale weights
            # into the cached graph after a reload; r4 code review)
            def enc(imgs, k):
                mean, logvar = self.vae.apply(params["vae"], 2 * imgs - 1,
                                              method=self.vae.encode_moments)
                return sample_gaussian(mean, logvar, k) * SD_VAE_SCALE

            gt_latents = enc(rgb, k_enc)
            noise = jax.random.normal(k_noise, gt_latents.shape)
            if noised_gt_init:
                latents = pndm.add_noise(gt_latents, noise, timesteps[0])
            else:
                latents = jax.random.normal(k_lat, gt_latents.shape)

            mask_small = jax.image.resize(
                update_mask, (1, 1, image_size, image_size), method="nearest")
            masked_inputs = (rgb * (mask_small < 0.5)
                             + 0.5 * (mask_small >= 0.5))
            masked_latents = enc(masked_inputs, k_enc2)
            mask_lat = jax.image.resize(update_mask, (1, 1, lat_sz, lat_sz),
                                        method="nearest")

            state = pndm.init_state(latents.shape)

            def step_fn(carry, inp):
                latents, state = carry
                t, i = inp

                def depth_branch(latents):
                    lat_in = jnp.concatenate([latents] * 2)
                    lat_in = jnp.concatenate([lat_in, depth_pair], axis=1)
                    noise_pred = self.unet.apply(
                        params["unet"], lat_in, t, text_embeddings)
                    u, c = jnp.split(noise_pred, 2, axis=0)
                    return u + guidance_scale * (c - u)

                def inpaint_branch(latents):
                    lat_in = jnp.concatenate([latents] * 2)
                    m = jnp.concatenate([mask_lat] * 2)
                    ml = jnp.concatenate([masked_latents] * 2)
                    lat_in = jnp.concatenate([lat_in, m, ml], axis=1)
                    noise_pred = self.inpaint_unet.apply(
                        params["inpaint_unet"], lat_in, t, text_embeddings)
                    u, c = jnp.split(noise_pred, 2, axis=0)
                    return u + guidance_scale * (c - u)

                if use_latent_blending:
                    noised_truth = pndm.add_noise(gt_latents, noise, t)
                    latents = jnp.where(
                        (i <= 10) | (i >= 20),
                        latents * mask_lat + noised_truth * (1 - mask_lat),
                        latents)

                if inpaint_on:
                    is_inpaint = (i > 10) & (i < 20)
                    noise_pred = jax.lax.cond(is_inpaint, inpaint_branch,
                                              depth_branch, latents)
                else:
                    noise_pred = depth_branch(latents)

                state, latents = pndm.step(state, noise_pred, t, latents,
                                           num_inference_steps)
                ys = latents if intermediate_vis else None
                return (latents, state), ys

            def dec(lat):
                imgs = self.vae.apply(params["vae"], lat / SD_VAE_SCALE,
                                      method=self.vae.decode)
                return jnp.clip(imgs / 2 + 0.5, 0.0, 1.0)

            idx = jnp.arange(timesteps.shape[0])
            (latents, _), inters = jax.lax.scan(step_fn, (latents, state),
                                                (timesteps, idx))
            if intermediate_vis:
                sel = np.linspace(0, timesteps.shape[0] - 1,
                                  n_vis).astype(np.int32)
                inter_imgs = jax.lax.map(dec, inters[sel])
            else:
                inter_imgs = jnp.zeros((0,))
            return dec(latents), latents, inter_imgs

        return jax.jit(run)

    def img2img_step(self, text_embeddings, inputs, depth_mask,
                     guidance_scale: float = 7.5, strength: float = 1.0,
                     num_inference_steps: int = 50, update_mask=None,
                     fixed_seed: Optional[int] = None,
                     intermediate_vis: bool = False,
                     use_latent_blending: bool = False):
        """Depth-conditioned img2img (reference img2img_step,
        stable_diffusion_depth.py:284-578). inputs/depth/update_mask are
        (1,C,H,W) crops at arbitrary square size; resized to 512 internally.
        strength runs only the last int(50*strength) scheduler steps
        (reference get_timesteps, :310); the live reference call site uses
        1.0. Returns ([0,1] rgb at 512^2, intermediates list)."""
        image_size = 512 if self.unet_config.block_out_channels[0] >= 320 \
            else 64
        rgb = jax.image.resize(
            inputs, (1, 3, image_size, image_size), method="linear")
        # resize depth to the latent size OUTSIDE the jit (same single
        # bicubic the reference does at :524 — numerics identical) so the
        # traced graph is static in the data-dependent bbox-crop shape:
        # repaint passes with different crops reuse one compiled graph, and
        # tools/warmup_cache.py can pre-compile it
        vae_down = 2 ** (len(self.vae_config.block_out_channels) - 1)
        lat_sz = image_size // vae_down
        depth_mask = jax.image.resize(depth_mask, (1, 1, lat_sz, lat_sz),
                                      method="bicubic")
        # reference :322-327: with an update mask the latent starts from
        # pure noise (gt kept for blending); without one it starts from the
        # gt noised to the first kept timestep
        noised_gt_init = update_mask is None
        if update_mask is None:
            update_mask = jnp.ones((1, 1, image_size, image_size))
        else:
            update_mask = jax.image.resize(
                update_mask, (1, 1, image_size, image_size), method="nearest")
        sig = (num_inference_steps, image_size, self.use_inpaint,
               use_latent_blending, intermediate_vis, float(strength),
               noised_gt_init)
        if sig not in self._jit_cache:
            self._jit_cache[sig] = self._build_img2img(*sig)
        key = jax.random.PRNGKey(0 if fixed_seed is None else fixed_seed)
        img, latents, inter_imgs = self._jit_cache[sig](
            self.params, text_embeddings, rgb, depth_mask,
            update_mask, jnp.asarray(guidance_scale, jnp.float32), key)
        intermediates = ([inter_imgs[i] for i in range(inter_imgs.shape[0])]
                         if intermediate_vis else [])
        return img, intermediates

    def img2img_single_step(self, text_embeddings, prev_latents, depth_mask,
                            step: int, guidance_scale: float = 100.0,
                            num_inference_steps: int = 50):
        """One CFG denoise step at a given scheduler step (reference
        img2img_single_step, stable_diffusion_depth.py:246-278)."""
        lat_sz = prev_latents.shape[-1]
        depth64 = jax.image.resize(depth_mask,
                                   (1, 1, lat_sz, lat_sz), method="bicubic")
        dmin, dmax = depth64.min(), depth64.max()
        depth64 = 2.0 * (depth64 - dmin) / jnp.maximum(dmax - dmin, 1e-8) - 1
        lat_in = jnp.concatenate([prev_latents] * 2)
        lat_in = jnp.concatenate(
            [lat_in, jnp.concatenate([depth64] * 2)], axis=1)
        pred = self.unet.apply(self.params["unet"], lat_in,
                               jnp.asarray([step]), text_embeddings)
        u, c = jnp.split(pred, 2, axis=0)
        noise_pred = u + guidance_scale * (c - u)
        state = self.scheduler.init_state(prev_latents.shape)
        _, prev = self.scheduler.step(state, noise_pred, step, prev_latents,
                                      num_inference_steps)
        return prev

    def produce_latents(self, text_embeddings, depth_mask, key,
                        height: int = 512, width: int = 512,
                        num_inference_steps: int = 50,
                        guidance_scale: float = 7.5):
        """Pure txt2img latent generation (reference produce_latents,
        stable_diffusion_depth.py:931-969)."""
        vae_down = 2 ** (len(self.vae_config.block_out_channels) - 1)
        h, w = height // vae_down, width // vae_down
        pndm = self.scheduler
        timesteps = pndm.timesteps(num_inference_steps)
        latents = jax.random.normal(
            key, (text_embeddings.shape[0] // 2,
                  self.unet_config.in_channels - 1, h, w))
        depth_pair = jnp.concatenate([depth_mask] * 2)
        state = pndm.init_state(latents.shape)

        def step_fn(carry, t):
            latents, state = carry
            lat_in = jnp.concatenate([latents] * 2)
            lat_in = jnp.concatenate([lat_in, depth_pair], axis=1)
            pred = self.unet.apply(self.params["unet"], lat_in, t,
                                   text_embeddings)
            u, c = jnp.split(pred, 2, axis=0)
            noise_pred = u + guidance_scale * (c - u)
            state, latents = pndm.step(state, noise_pred, t, latents,
                                       num_inference_steps)
            return (latents, state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def prompt_to_img(self, prompts, depth_mask, height: int = 512,
                      width: int = 512, num_inference_steps: int = 50,
                      guidance_scale: float = 7.5, seed: int = 0):
        """Text -> image via depth-conditioned txt2img (reference
        prompt_to_img, stable_diffusion_depth.py:1001-1031). Returns uint8
        numpy images."""
        import numpy as np

        if isinstance(prompts, str):
            prompts = [prompts]
        text_embeds = self.get_text_embeds(prompts)
        dmin, dmax = depth_mask.min(), depth_mask.max()
        depth_mask = 2.0 * (depth_mask - dmin) / jnp.maximum(
            dmax - dmin, 1e-8) - 1.0
        vae_down = 2 ** (len(self.vae_config.block_out_channels) - 1)
        depth_mask = jax.image.resize(
            depth_mask, (depth_mask.shape[0], 1, height // vae_down,
                         width // vae_down), method="bicubic")
        latents = self.produce_latents(
            text_embeds, depth_mask, jax.random.PRNGKey(seed),
            height=height, width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale)
        imgs = self.decode_latents(latents)
        return (np.asarray(imgs).transpose(0, 2, 3, 1) * 255).round().astype(
            "uint8")

    def load_concept(self, concept_path: str):
        """Textual-inversion concept loading from a local learned_embeds file
        (reference load_concept, stable_diffusion_depth.py:185-220; hub
        download replaced by an explicit local path). Adds each trained token
        to the tokenizer-id space by extending the embedding table."""
        import numpy as np
        import torch

        learned = torch.load(concept_path, map_location="cpu",
                             weights_only=True)
        table = self.params["text"]["params"]["token_embedding"]["embedding"]
        emb_table = np.asarray(table, np.float32)
        for token, emb in learned.items():
            emb_np = emb.float().numpy().reshape(1, -1)
            emb_table = np.concatenate([emb_table, emb_np], axis=0)
            # the new row's id becomes the token's id (transformers
            # add_tokens + resize_token_embeddings equivalent)
            self.tokenizer.add_token(token, emb_table.shape[0] - 1)
        self.params["text"]["params"]["token_embedding"]["embedding"] = (
            jnp.asarray(emb_table, dtype=table.dtype))
        # resize_token_embeddings equivalent: flax validates param shapes
        # against the module config, so the text tower must be rebuilt with
        # the grown vocab
        self.text_config.vocab_size = emb_table.shape[0]
        self.text_encoder = CLIPTextModel(self.text_config, dtype=self.dtype)

    # -- SDS train step (non-Zero123++ path) ----------------------------------

    def sds_grad(self, params_vae_latents: jnp.ndarray, text_embeddings,
                 depth_mask, key: jax.Array,
                 guidance_scale: float = 100.0) -> jnp.ndarray:
        """eps-prediction SDS gradient w.r.t. latents (reference train_step,
        stable_diffusion_depth.py:866-929): grad = w(t) (eps_pred - eps),
        w = 1 - alpha_cumprod[t]."""
        latents = params_vae_latents
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (1,), self.min_step, self.max_step + 1)
        noise = (jnp.zeros_like(latents) if self.no_noise
                 else jax.random.normal(k_n, latents.shape))
        latents_noisy = sch.add_noise(self.alphas, latents, noise, t)
        lat_in = jnp.concatenate([latents_noisy] * 2)
        lat_in = jnp.concatenate(
            [lat_in, jnp.concatenate([depth_mask] * 2)], axis=1)
        noise_pred = self.unet.apply(self.params["unet"], lat_in, t,
                                     text_embeddings)
        u, c = jnp.split(noise_pred, 2, axis=0)
        noise_pred = u + guidance_scale * (c - u)
        w = (1 - self.alphas[t]).reshape(-1, 1, 1, 1)
        grad = w * (noise_pred - noise)
        return jnp.nan_to_num(grad)
