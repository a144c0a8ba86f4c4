"""Zero123++ v1.1 multiview pipeline with depth ControlNet — TPU-native.

Replaces the hub pipeline the reference downloads at runtime
(trainer.py:296-315; vendored documentation copy src/zero123plus.py). The
pieces and their reference counterparts:

  - reference-only attention: two UNet passes in ONE jitted graph — pass 1
    runs the noised cond latent and collects each self-attn's tokens
    (mode='w', zero123plus.py:190-200), pass 2 denoises the 3x2 grid with
    those tokens appended to every self-attn KV (mode='r', :153). No Python
    dict side channel.
  - depth ControlNet at conditioning_scale=2 (trainer.py:302-304,
    DepthControlUNet zero123plus.py:260-298).
  - CLIP-vision global embeds blended into empty-prompt text embeds via
    per-token ramping coefficients (zero123plus.py:784-803).
  - latent/image domain scalings (zero123plus.py:240-257 == trainer.py:38-52).
  - the SDS teacher path: num_inference_steps=1 at an externally chosen t,
    returning the CFG-combined v-prediction (trainer.py:771-796 captures it
    via callback_on_step_end; here it is simply the function's return value).

Grid geometry: 3x2 tiles of 320 px -> 960x640 canvas, 120x80 latent
(trainer.py:590-594,723-727).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from contexture_nerf_tpu.core.fastinit import maybe_jit_init
import numpy as np

from contexture_nerf_tpu.diffusion import schedulers as sch
from contexture_nerf_tpu.diffusion.clip import (CLIPTextConfig, CLIPTextModel,
                                                CLIPTokenizer,
                                                CLIPVisionConfig,
                                                CLIPVisionModelWithProjection)
from contexture_nerf_tpu.diffusion.controlnet import ControlNet
from contexture_nerf_tpu.diffusion.unet import UNet2DCondition, UNetConfig
from contexture_nerf_tpu.diffusion.vae import (AutoencoderKL, VAEConfig,
                                               sample_gaussian)

VAE_SCALE = 0.18215


def scale_latents(latents):
    """(zero123plus.py:240-242 / trainer.py:38-40)"""
    return (latents - 0.22) * 0.75


def unscale_latents(latents):
    return latents / 0.75 + 0.22


def scale_image(image):
    """(zero123plus.py:251-253 / trainer.py:46-48)"""
    return image * 0.5 / 0.8


def unscale_image(image):
    return image / 0.5 * 0.8


# Zero123++ v1.1 ramping coefficients are learned per text-token; without the
# hub checkpoint we default to a linear ramp over the 77 tokens (the converter
# loads the real ones from a local snapshot's config when available).
def default_ramping_coefficients(n_tokens: int = 77) -> np.ndarray:
    return np.linspace(0.0, 1.0, n_tokens, dtype=np.float32)


@dataclass
class Zero123PlusWeightPaths:
    unet: Optional[str] = None
    vae: Optional[str] = None
    controlnet: Optional[str] = None
    text_encoder: Optional[str] = None
    vision_encoder: Optional[str] = None
    tokenizer_vocab: Optional[str] = None
    tokenizer_merges: Optional[str] = None
    # json file: either a plain list or a dict with a "ramping_coefficients"
    # key (the hub pipeline registers them into its model_index.json config,
    # reference src/zero123plus.py:392, consumed at trainer.py:631)
    ramping_coefficients: Optional[str] = None

    @staticmethod
    def from_snapshot(root: Optional[str] = None,
                      controlnet_root: Optional[str] = None
                      ) -> "Zero123PlusWeightPaths":
        """Resolve a Zero123++ diffusers snapshot (guide.zero123plus_path)
        plus an optional standalone ControlNet snapshot
        (guide.controlnet_path) into component paths. Missing pieces stay
        None (random init)."""
        from pathlib import Path

        wp = Zero123PlusWeightPaths()
        if root is not None:
            root = Path(root)
            for attr, sub in (("unet", "unet"), ("vae", "vae"),
                              ("text_encoder", "text_encoder"),
                              ("vision_encoder", "vision_encoder")):
                p = root / sub
                if p.exists():
                    setattr(wp, attr, str(p))
            vocab = root / "tokenizer" / "vocab.json"
            merges = root / "tokenizer" / "merges.txt"
            if vocab.exists() and merges.exists():
                wp.tokenizer_vocab = str(vocab)
                wp.tokenizer_merges = str(merges)
            if wp.controlnet is None and (root / "controlnet").exists():
                wp.controlnet = str(root / "controlnet")
            mi = root / "model_index.json"
            if mi.exists():
                wp.ramping_coefficients = str(mi)
        if controlnet_root is not None:
            wp.controlnet = str(controlnet_root)
        return wp


class Zero123PlusPipeline:
    """Multiview teacher/generator."""

    def __init__(self, conditioning_scale: float = 2.0,
                 weight_paths: Optional[Zero123PlusWeightPaths] = None,
                 tiny: bool = False, dtype: jnp.dtype = jnp.float32,
                 seed: int = 0, int8_controlnet: bool = False,
                 int8_unet: bool = False):
        self.conditioning_scale = conditioning_scale
        self.dtype = dtype
        self.int8_controlnet = int8_controlnet
        self.int8_unet = int8_unet
        if tiny:
            self.unet_config = UNetConfig.tiny(in_channels=4)
            self.vae_config = VAEConfig.tiny()
            self.text_config = CLIPTextConfig.tiny()
            self.vision_config = CLIPVisionConfig.tiny()
            # tiny vision proj dim must match text hidden
            self.vision_config.projection_dim = self.text_config.hidden_size
        else:
            self.unet_config = UNetConfig.zero123plus()
            self.vae_config = VAEConfig.sd()
            self.text_config = CLIPTextConfig.sd2()
            self.vision_config = CLIPVisionConfig.vit_h()

        # optim.int8_controlnet / optim.int8_teacher: W8A8 dynamic
        # quantization of the heavy blocks on the MXU's 2x int8 path
        # (ops/quant.py); params stay bf16 masters so init/convert/checkpoint
        # paths are identical. int8_unet extends it from the ControlNet
        # (~1/4 of teacher FLOPs) to the full denoiser.
        self.unet = UNet2DCondition(self.unet_config, dtype=dtype,
                                    quant=int8_unet)
        self.controlnet = ControlNet(self.unet_config, dtype=dtype,
                                     quant=int8_controlnet or int8_unet)
        self.vae = AutoencoderKL(self.vae_config, dtype=dtype)
        self.text_encoder = CLIPTextModel(self.text_config, dtype=dtype)
        self.vision_encoder = CLIPVisionModelWithProjection(
            self.vision_config, dtype=dtype)
        wp = weight_paths or Zero123PlusWeightPaths()
        self.tokenizer = CLIPTokenizer(
            vocab_path=wp.tokenizer_vocab, merges_path=wp.tokenizer_merges,
            vocab_size=self.text_config.vocab_size)

        # trainer.py:306 swaps the gen scheduler for DDPM (v-prediction);
        # generation default is EulerAncestral (hub config)
        self.ddpm = sch.DDPM.create(prediction_type="v_prediction")
        self.euler = sch.EulerAncestral.create(
            prediction_type="v_prediction", timestep_spacing="trailing")
        self.alphas_cumprod = self.ddpm.alphas_cumprod

        data = None
        if wp.ramping_coefficients:
            import json

            with open(wp.ramping_coefficients) as f:
                data = json.load(f)
            if isinstance(data, dict):
                # Zero123++ snapshots carry the coefficients in
                # model_index.json; a generic diffusers export won't have
                # the key — fall back to the default ramp rather than crash
                data = data.get("ramping_coefficients")
                if data is None:
                    import warnings

                    warnings.warn(
                        f"{wp.ramping_coefficients} has no "
                        "'ramping_coefficients' key; using the default "
                        "linear ramp")
        if data is not None:
            self.ramping = np.asarray(data, np.float32)
            if self.ramping.shape[0] != self.text_config.max_positions:
                raise ValueError(
                    f"ramping_coefficients length {self.ramping.shape[0]} != "
                    f"max_positions {self.text_config.max_positions}")
        else:
            self.ramping = default_ramping_coefficients(
                self.text_config.max_positions)

        self.params = self._init_or_load(wp, seed)
        self._jit_cache: Dict[Any, Any] = {}

    # -- weights ---------------------------------------------------------------

    def _cast(self, tree):
        """bf16 parameter policy (see sd_depth.StableDiffusionDepth._cast)."""
        if self.dtype == jnp.float32:
            return tree
        return jax.tree.map(
            lambda x: x.astype(self.dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def _init_or_load(self, wp: Zero123PlusWeightPaths, seed: int):
        from contexture_nerf_tpu.diffusion import weights as W

        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 5)
        ctx = self.text_config.hidden_size
        params: Dict[str, Any] = {}
        lat = jnp.zeros((1, 4, 24, 16))
        emb = jnp.zeros((1, 77, ctx))
        if wp.unet:
            params["unet"] = self._cast(W.convert_unet(W.load_state_dict(wp.unet),
                                            self.unet_config))
        else:
            params["unet"] = self._cast(maybe_jit_init(self.unet.init, ks[0], lat,
                                                     jnp.array([0]), emb))
        if wp.controlnet:
            params["controlnet"] = self._cast(W.convert_controlnet(
                W.load_state_dict(wp.controlnet), self.unet_config))
        else:
            params["controlnet"] = self._cast(maybe_jit_init(self.controlnet.init, 
                ks[1], lat, jnp.array([0]), emb,
                jnp.zeros((1, 3, 24 * 8, 16 * 8))))
        if wp.vae:
            params["vae"] = self._cast(W.convert_vae(W.load_state_dict(wp.vae),
                                          self.vae_config))
        else:
            params["vae"] = self._cast(maybe_jit_init(self.vae.init, 
                ks[2], jnp.zeros((1, 3, 64, 64)), ks[2]))
        if wp.text_encoder:
            params["text"] = self._cast(W.convert_clip_text(
                W.load_state_dict(wp.text_encoder), self.text_config))
        else:
            params["text"] = self._cast(maybe_jit_init(self.text_encoder.init, 
                ks[3], jnp.zeros((1, 77), jnp.int32)))
        if wp.vision_encoder:
            params["vision"] = self._cast(W.convert_clip_vision(
                W.load_state_dict(wp.vision_encoder), self.vision_config))
        else:
            sz = self.vision_config.image_size
            params["vision"] = self._cast(maybe_jit_init(self.vision_encoder.init, 
                ks[4], jnp.zeros((1, 3, sz, sz))))
        return params

    # -- conditioning -----------------------------------------------------------

    def encode_condition_image(self, image: jnp.ndarray,
                               key: jax.Array) -> jnp.ndarray:
        """cond image (1,3,H,W) in [-1,1] -> UNSCALED latent sample
        (hub encode_condition_image; trainer.py:621)."""
        mean, logvar = self.vae.apply(self.params["vae"], image,
                                      method=self.vae.encode_moments)
        return sample_gaussian(mean, logvar, key)

    def prepare_conditioning(self, cond_image: jnp.ndarray, key: jax.Array
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """cond_image (1,3,Hc,Wc) in [-1,1] (already feature-extractor sized).

        Returns (cond_lat_pair (2,4,h,w), encoder_hidden_states (2,77,ctx)):
        CFG pairs [negative, positive] (trainer.py:608-639)."""
        k1, k2 = jax.random.split(key)
        cond_lat = self.encode_condition_image(cond_image, k1)
        negative_lat = self.encode_condition_image(
            jnp.zeros_like(cond_image), k2)
        cond_lat_pair = jnp.concatenate([negative_lat, cond_lat])

        # CLIP-vision pixel values: resize to the tower's expected size and
        # apply CLIP normalization from [-1,1] input
        sz = self.vision_config.image_size
        x01 = cond_image / 2 + 0.5
        x01 = jax.image.resize(x01, (1, 3, sz, sz), method="linear")
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073]
                           ).reshape(1, 3, 1, 1)
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711]
                          ).reshape(1, 3, 1, 1)
        pixel_values = (x01 - mean) / std
        global_embeds = self.vision_encoder.apply(
            self.params["vision"], pixel_values)[:, None, :]  # (1,1,ctx)

        empty_ids = jnp.asarray(self.tokenizer([""]))
        text_embeds = self.text_encoder.apply(self.params["text"], empty_ids)
        ramp = jnp.asarray(self.ramping).reshape(1, -1, 1)
        cond_hidden = text_embeds + global_embeds * ramp  # (1,77,ctx)
        uncond_hidden = text_embeds  # empty prompt, no vision ramp
        encoder_hidden_states = jnp.concatenate([uncond_hidden, cond_hidden])
        return cond_lat_pair, encoder_hidden_states

    # -- core UNet forward (ref-attn + controlnet + CFG) ------------------------

    def embed_control_cond(self, params, depth_image, latent_hw):
        """Precompute the ControlNet hint embedding for a depth image
        (B,3,H,W), resized to 8x the latent grid. The embedding depends only
        on the depth image — loop-invariant across SDS iterations — so the
        trainer computes it once per run and passes it through
        _cfg_v_pred(cn_cond_emb=...) (controlnet.embed_cond)."""
        from contexture_nerf_tpu.diffusion.controlnet import embed_cond

        th, tw = latent_hw[0] * 8, latent_hw[1] * 8
        if depth_image.shape[2:] != (th, tw):
            depth_image = jax.image.resize(
                depth_image, depth_image.shape[:2] + (th, tw),
                method="linear")
        return embed_cond(params["controlnet"], self.unet_config,
                          depth_image, dtype=self.dtype)

    def _cfg_core(self, params, latents, t, branch_cond_lats, branch_ehs,
                  depth_image, key, scale_input, cn_cond_emb=None):
        """Run the ref-attn UNet + depth ControlNet over nb CFG branches and
        return the per-branch v-predictions as a list of (B,4,H,W) arrays.

        latents: (B,4,H,W); branch_cond_lats: (nb,4,hc,wc) cond latent per
        branch; branch_ehs: (nb,77,ctx). Mirrors RefOnlyNoisedUNet.forward +
        DepthControlUNet.forward (zero123plus.py:202-237,280-298).

        Write-pass noising: the cond latent is DDPM-noised to t and fed to
        the UNet as-is. The hub's val path noises in the live scheduler's
        native domain then applies scale_model_input, which for EulerAncestral
        (x0 + sigma*eps, scaled by 1/sqrt(sigma^2+1)) equals exactly the
        DDPM-noised latent — so no second input scaling is applied here.
        Branches that share a cond latent share the write-pass noise, so a
        branch's reference KV depends only on (cond latent, ehs, t)."""
        B = latents.shape[0]
        nb = branch_cond_lats.shape[0]
        # one noise draw per distinct cond latent row 0 (negative) vs rest
        k_neg, k_cond = jax.random.split(key)
        neg_noise = jax.random.normal(k_neg, branch_cond_lats.shape[1:],
                                      branch_cond_lats.dtype)
        cond_noise = jax.random.normal(k_cond, branch_cond_lats.shape[1:],
                                       branch_cond_lats.dtype)
        branch_noise = jnp.stack([neg_noise] + [cond_noise] * (nb - 1))

        # tile branches across the latent batch: [b0 x B, b1 x B, ...]
        cond_lats = jnp.repeat(branch_cond_lats, B, axis=0)
        ehs = jnp.repeat(branch_ehs, B, axis=0)
        noise = jnp.repeat(branch_noise, B, axis=0)
        lat_in = scale_input(jnp.concatenate([latents] * nb))

        # the ControlNet cond embedder downsamples by 8; align the pixel-space
        # depth image to 8x the latent grid (matters when the VAE's downsample
        # factor differs, e.g. tiny test configs)
        th, tw = latents.shape[2] * 8, latents.shape[3] * 8
        if cn_cond_emb is None and depth_image.shape[2:] != (th, tw):
            depth_image = jax.image.resize(
                depth_image, depth_image.shape[:2] + (th, tw),
                method="linear")

        noisy_cond = sch.add_noise(self.alphas_cumprod, cond_lats, noise,
                                   jnp.broadcast_to(t, (cond_lats.shape[0],)))
        ref = []
        self.unet.apply(params["unet"], noisy_cond, t, ehs, ref_out=ref)

        depth_all = jnp.concatenate([depth_image] * nb)
        emb_all = (None if cn_cond_emb is None else
                   jnp.concatenate([cn_cond_emb] * nb))
        downs, mid = self.controlnet.apply(
            params["controlnet"], lat_in, t, ehs,
            depth_all, self.conditioning_scale, cond_embedding=emb_all)

        v = self.unet.apply(params["unet"], lat_in, t, ehs,
                            down_residuals=downs, mid_residual=mid,
                            ref_kv_list=ref)
        return jnp.split(v, nb, axis=0)

    def _cfg_v_pred(self, params, latents, t, cond_lat_pair,
                    encoder_hidden_states, depth_image, guidance_scale,
                    key, scale_input, cn_cond_emb=None):
        """Standard two-branch CFG: v_u + g * (v_c - v_u)."""
        v_uncond, v_cond = self._cfg_core(
            params, latents, t, cond_lat_pair, encoder_hidden_states,
            depth_image, key, scale_input, cn_cond_emb=cn_cond_emb)
        return v_uncond + guidance_scale * (v_cond - v_uncond)

    def _cfg_v_pred_individual(self, params, latents, t, cond_lat_pair,
                               encoder_hidden_states, depth_image,
                               guidance_scale_i, guidance_scale_t, key,
                               scale_input, cn_cond_emb=None):
        """Three-branch CFG with separate image/text guidance scales
        (guide.individual_control_of_conditions + guidance_scale_i/t,
        reference train_config.py:51-53; the reference's consuming branches
        are commented out, stable_diffusion_depth.py:461,754 — realized here
        for the Zero123++ teacher so run_ablation_study.py sweeps something
        real). Branches: uncond (negative latent, un-ramped empty prompt),
        image-only (cond latent, un-ramped prompt), full (cond latent,
        vision-ramped prompt):

            v = v_u + gs_i * (v_img - v_u) + gs_t * (v_full - v_img)

        gs_i == gs_t == g collapses algebraically to standard CFG at scale g.
        """
        neg_lat, cond_lat = jnp.split(cond_lat_pair, 2, axis=0)
        uncond_e, cond_e = jnp.split(encoder_hidden_states, 2, axis=0)
        branch_lats = jnp.concatenate([neg_lat, cond_lat, cond_lat])
        branch_ehs = jnp.concatenate([uncond_e, uncond_e, cond_e])
        v_u, v_img, v_full = self._cfg_core(
            params, latents, t, branch_lats, branch_ehs, depth_image, key,
            scale_input, cn_cond_emb=cn_cond_emb)
        return (v_u + guidance_scale_i * (v_img - v_u)
                + guidance_scale_t * (v_full - v_img))

    # -- SDS teacher -------------------------------------------------------------

    def teacher_v_pred(self, latents_noisy, t, cond_lat_pair,
                       encoder_hidden_states, depth_image,
                       guidance_scale: float, key: jax.Array) -> jnp.ndarray:
        """Single-step teacher: the CFG v-prediction at externally-noised
        latents (reference trainer.py:771-796: num_inference_steps=1 with
        callback capturing noise_pred). Jit-cached per latent shape."""
        sig = ("teacher", latents_noisy.shape, depth_image.shape)
        if sig not in self._jit_cache:
            def f(params, latents_noisy, t, cond_lat_pair, ehs, depth, gs, key):
                return self._cfg_v_pred(params, latents_noisy, t,
                                        cond_lat_pair, ehs, depth, gs, key,
                                        scale_input=lambda x: x)  # DDPM: id
            self._jit_cache[sig] = jax.jit(f)
        return self._jit_cache[sig](self.params, latents_noisy, t,
                                    cond_lat_pair, encoder_hidden_states,
                                    depth_image,
                                    jnp.asarray(guidance_scale, jnp.float32),
                                    key)

    # -- generation ---------------------------------------------------------------

    def attach_inpaint_unet(self, module, params) -> None:
        """Wire the SD2-inpaint UNet into the generation loop (reference
        trainer.py:308: `pipeline.inpaint_unet = diffusion.inpaint_unet`).
        `module` is a 9-channel UNet2DCondition, `params` its variables."""
        self.inpaint_unet = module
        self.inpaint_params = params

    def generate(self, cond_image: jnp.ndarray, depth_image: jnp.ndarray,
                 num_inference_steps: int = 28, guidance_scale: float = 4.0,
                 key: Optional[jax.Array] = None,
                 height: int = 960, width: int = 640,
                 use_blending: bool = False, use_inpaint: bool = False,
                 latent_mask_grid: Optional[jnp.ndarray] = None,
                 latent_renders_grid: Optional[jnp.ndarray] = None,
                 masked_input_latents: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        """Full EulerAncestral generation of the 3x2 grid (hub __call__,
        zero123plus.py:751-833). cond_image (1,3,Hc,Wc) in [-1,1];
        depth_image (1,3,height,width) in [0,1]-ish (depth transforms).
        Returns [0,1] RGB grid (1,3,height,width).

        The authors' generation-loop extensions (run_sd_pipeline,
        reference src/zero123plus.py:651-707):

          - use_blending: before each non-inpaint denoise step, the latent is
            blended with the current-noise-level noising of the clean render
            grid latent — `lat*mask + (renders + sigma_i*eps)*(1-mask)` —
            keeping already-textured regions (mask==0) pinned to the student
            render while the masked region (mask==1) is generated; after the
            LAST step the clean `latent_renders_grid` is blended in
            (:706-707). Parity note: the reference's pre-step blend noises
            `latent_mask_grid` (:655) where every surrounding name
            (`noised_cropped_rgb_renders_grid`) and the final blend (:707)
            say `latent_renders_grid` was intended — this implementation
            noises the renders grid.
          - use_inpaint: denoise steps 10 < i < 20 route through the 9-ch
            SD2-inpaint UNet on [latents, mask, masked_input_latents]
            (:676-689; wire it via attach_inpaint_unet, reference
            trainer.py:308). Its output feeds the SAME v-prediction
            EulerAncestral step as the main UNet's, mirroring the reference.

        latent_mask_grid: (1,1,h,w) latent-resolution mask, 1 = generate.
        latent_renders_grid / masked_input_latents: (1,4,h,w) SCALED latents
        (scale_latents domain, like the loop's own)."""
        if use_inpaint and getattr(self, "inpaint_unet", None) is None:
            raise ValueError("use_inpaint=True requires attach_inpaint_unet "
                             "(reference trainer.py:308)")
        if (use_blending or use_inpaint) and latent_mask_grid is None:
            raise ValueError("use_blending/use_inpaint require "
                             "latent_mask_grid")
        if use_blending and latent_renders_grid is None:
            raise ValueError("use_blending requires latent_renders_grid")
        if use_inpaint and masked_input_latents is None:
            raise ValueError("use_inpaint requires masked_input_latents")

        key = jax.random.PRNGKey(0) if key is None else key
        k_cond, k_loop = jax.random.split(key)
        cond_lat_pair, ehs = self.prepare_conditioning(cond_image, k_cond)

        sig = ("gen", num_inference_steps, height, width, use_blending,
               use_inpaint)
        if sig not in self._jit_cache:
            euler = self.euler
            ts, sigmas = euler.timesteps_and_sigmas(num_inference_steps)
            n_steps = int(ts.shape[0])
            # latent size follows the VAE's downsample factor (8 for SD;
            # smaller for tiny test configs)
            down = 2 ** (len(self.vae_config.block_out_channels) - 1)

            def run(params, inpaint_params, cond_lat_pair, ehs, depth, gs,
                    key, mask, renders, masked_lat):
                kl, key = jax.random.split(key)
                lat = jax.random.normal(
                    kl, (1, 4, height // down, width // down)) * sigmas[0]

                def body(carry, inp):
                    lat, key = carry
                    t, i = inp
                    # 4-way split regardless of the blending flag so the
                    # kw/ks_ streams are identical across use_blending
                    # variants (mask==1 therefore reproduces the plain loop
                    # bit-for-bit — tests/test_round4.py)
                    kw, ks_, kb, key = jax.random.split(key, 4)
                    sigma = sigmas[i]
                    in_inpaint = (i > 10) & (i < 20) if use_inpaint else False

                    if use_blending:
                        eps = jax.random.normal(kb, renders.shape,
                                                renders.dtype)
                        blended = (lat * mask
                                   + euler.add_noise(renders, eps, sigma)
                                   * (1 - mask))
                        if use_inpaint:
                            # the reference skips the pre-step blend inside
                            # the inpaint range (:652)
                            lat = jnp.where(in_inpaint, lat, blended)
                        else:
                            lat = blended

                    def main_branch(lat):
                        return self._cfg_v_pred(
                            params, lat, t, cond_lat_pair, ehs, depth, gs,
                            kw, scale_input=lambda x: euler.scale_model_input(
                                x, sigma))

                    def inpaint_branch(lat):
                        # 9-ch [latents, mask, masked latents] x2 for CFG,
                        # empty-prompt/cond prompt pair as ehs already is.
                        # scale_model_input is applied to the WHOLE 9-ch
                        # concat — including mask and masked latents —
                        # mirroring the reference exactly (:678-682), even
                        # though standard inpaint pipelines scale only the
                        # latent channels.
                        nine = jnp.concatenate([lat, mask, masked_lat],
                                               axis=1)
                        nine = euler.scale_model_input(
                            jnp.concatenate([nine] * 2), sigma)
                        pred = self.inpaint_unet.apply(inpaint_params, nine,
                                                       t, ehs)
                        p_u, p_c = jnp.split(pred, 2, axis=0)
                        return p_u + gs * (p_c - p_u)

                    if use_inpaint:
                        v = jax.lax.cond(in_inpaint, inpaint_branch,
                                         main_branch, lat)
                    else:
                        v = main_branch(lat)
                    lat = euler.step(v, i, lat, sigmas, ks_)
                    if use_blending:
                        # final-step blend with the CLEAN renders grid
                        # (reference :706-707)
                        is_last = i == n_steps - 1
                        lat = jnp.where(is_last,
                                        lat * mask + renders * (1 - mask),
                                        lat)
                    return (lat, key), None

                (lat, _), _ = jax.lax.scan(
                    body, (lat, key), (ts, jnp.arange(n_steps)))
                lat = unscale_latents(lat)
                img = self.vae.apply(params["vae"],
                                     lat / self.vae_config.scaling_factor,
                                     method=self.vae.decode)
                img = unscale_image(img)
                return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

            self._jit_cache[sig] = jax.jit(run)

        down = 2 ** (len(self.vae_config.block_out_channels) - 1)
        h, w = height // down, width // down
        zero_mask = jnp.zeros((1, 1, h, w), jnp.float32)
        zero_lat = jnp.zeros((1, 4, h, w), jnp.float32)
        inpaint_params = (getattr(self, "inpaint_params", None)
                          if use_inpaint else None)
        return self._jit_cache[sig](
            self.params, inpaint_params, cond_lat_pair, ehs, depth_image,
            jnp.asarray(guidance_scale, jnp.float32), k_loop,
            latent_mask_grid if latent_mask_grid is not None else zero_mask,
            latent_renders_grid if latent_renders_grid is not None else zero_lat,
            masked_input_latents if masked_input_latents is not None else zero_lat)
