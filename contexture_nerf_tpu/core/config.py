"""Config schema + pyrallis-compatible YAML/CLI loader.

Mirrors the reference schema exactly (same section names, keys, and defaults) so the
reference's `configs/text_guided/*.yaml` files parse unchanged:
reference: src/configs/train_config.py:7-133.

pyrallis is not a dependency here; `load_config` implements the same contract:
  - YAML file with nested sections {log, render, optim, guide}
  - CLI overrides as --section.key=value (pyrallis syntax)
  - dataclass defaults for everything else
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field, fields, is_dataclass
from pathlib import Path
from typing import Any, List, Optional, Tuple

import yaml


@dataclass
class RenderConfig:
    """Parameters for the mesh renderer (reference: train_config.py:7-31)."""

    # Grid size for rendering during painting
    train_grid_size: int = 1200
    # Grid size of evaluation
    eval_grid_size: int = 1024
    # training camera radius range
    radius: float = 1.5
    # Set [0, overhead_range] as the overhead region
    overhead_range: float = 40
    # Define the front angle region
    front_range: float = 70
    # The front offset, use to rotate shape from code
    front_offset: float = 0.0
    # Number of views to use
    n_views: int = 8
    # Theta value for rendering during training
    base_theta: float = 60
    # Additional views to use before rotating around shape
    views_before: List[Tuple[float, float]] = field(default_factory=list)
    # Additional views to use after rotating around shape
    views_after: List[Tuple[float, float]] = field(
        default_factory=lambda: [[180, 30], [180, 150]]
    )
    # Whether to alternate between the rotating views from the different sides
    alternate_views: bool = True


@dataclass
class GuideConfig:
    """Parameters defining the guidance (reference: train_config.py:34-81)."""

    # Guiding text prompt
    text: str = ""
    # The mesh to paint
    shape_path: str = "shapes/spot_triangulated.obj"
    # Append direction to text prompts
    append_direction: bool = False
    # A Textual-Inversion concept to use
    concept_name: Optional[str] = None
    # Path to the TI embedding
    concept_path: Optional[Path] = None
    # A huggingface diffusion model to use
    diffusion_name: str = "stabilityai/stable-diffusion-2-depth"

    second_model_type: Optional[str] = None
    individual_control_of_conditions: bool = False
    guidance_scale_i: Optional[int] = None
    guidance_scale_t: Optional[int] = None

    use_zero123plus: Optional[bool] = True

    guess_mode: Optional[bool] = False
    # Scale of mesh in 1x1x1 cube
    shape_scale: float = 0.6
    # height of mesh
    dy: float = 0.25
    # texture image resolution
    texture_resolution: int = 1024
    # texture mapping interpolation: 'nearest', 'bilinear', 'bicubic'
    texture_interpolation_mode: str = "bilinear"
    # Guidance scale for score distillation
    guidance_scale: float = 7.5
    # Use inpainting in relevant iterations
    use_inpainting: bool = True
    # The texture before editing
    reference_texture: Optional[Path] = None
    # The edited texture
    initial_texture: Optional[Path] = None
    # Whether to use background color or image
    use_background_color: bool = False
    # Background image to use
    background_img: str = "textures/brick_wall.png"
    # Threshold for defining refine regions
    z_update_thr: float = 0.2
    # Some more strict masking for projecting back
    strict_projection: bool = True
    # TPU additions: local checkpoint snapshot roots (diffusers layout).
    # When diffusion_name is a local directory it is used as the SD2-depth
    # snapshot root; these cover the other models. All optional (random init
    # otherwise — this environment is zero-egress).
    inpaint_model_path: Optional[str] = None
    zero123plus_path: Optional[str] = None
    controlnet_path: Optional[str] = None


@dataclass
class OptimConfig:
    """Parameters for the optimization process (reference: train_config.py:84-100)."""

    # Seed for experiment
    seed: int = 0
    # Learning rate for projection
    lr: float = 1e-2
    # For Diffusion model
    min_timestep: float = 0.02
    # For Diffusion model
    max_timestep: float = 0.98
    # For Diffusion model
    no_noise: bool = False

    learn_max_z_normals: bool = True
    alpha: float = -100
    # TPU additions (defaults preserve reference behavior)
    # SDS iterations (reference hardcodes 5000, trainer.py:662)
    sds_iterations: int = 5000
    # Adam hyperparams of the SDS loop (reference trainer.py:603)
    sds_lr: float = 1e-5
    sds_betas: Tuple[float, float] = (0.9, 0.99)
    sds_eps: float = 1e-15
    # Resume the SDS loop from the newest checkpoint in exp_dir/checkpoints
    resume: bool = False
    # Save a full checkpoint (params + opt state + RNG key) every N SDS iters
    checkpoint_interval: int = 1000
    # SDS tile sampling distribution over the 6 grid tiles: 'uniform'
    # (default) reproduces the reference exactly (random.randint(0,5),
    # trainer.py:843); 'mixed' = 0.5 uniform floor + 0.5 view-weight, the
    # recommended improvement (views whose pixels see their faces head-on
    # get more SDS draws while no view is starved); 'weighted' = pure
    # view-weight proportions.
    tile_weighting: str = "uniform"
    # Precompute the Fourier embedding of the static grid UVs and evaluate
    # the fused precomputed-embedding kernel in the hot loop (~18 ms/iter
    # faster; ~157 MB bf16 HBM residency). Default ON since r5: proven
    # bit-identical end to end on chip (500-iter paint, PSNR inf vs the
    # recompute path — docs/knob_quality_r5.json) and the trainer
    # auto-falls-back to per-iteration recompute when free HBM headroom is
    # short (trainer.py:_hbm_headroom_ok).
    precompute_uv_embedding: bool = True
    # Student render in the SDS loop: False (default) queries the texture MLP
    # directly at the crop-resized rasterized UVs (dense MXU math, ~10x faster
    # on TPU); True reproduces the reference's lattice->bilinear-sample->
    # crop-resize pipeline exactly (gather-heavy).
    exact_lattice_render: bool = False
    # Multi-chip SPMD for the SDS step: 'auto' shards over all devices when
    # the backend is a real multi-chip TPU; 'on' forces sharding over all
    # visible devices (tests use this on the virtual 8-CPU mesh); 'off'
    # keeps the step single-device.
    data_parallel: str = "auto"
    # Tensor-parallel degree for the diffusion towers inside the SDS step:
    # devices form a (views x tp) mesh and teacher/VAE params take
    # Megatron-style shardings (parallel/tp.py). 1 = off. Requires
    # data_parallel != 'off' and device count divisible by the degree.
    tensor_parallel: int = 1
    # Sequence/context-parallel degree: devices form a (views x sp) mesh and
    # the teacher's long self-attention (incl. the reference-attention
    # doubled KV) runs as ring attention over the sp axis (parallel/ring.py,
    # SURVEY.md §2.3). 1 = off. Mutually exclusive with tensor_parallel.
    sequence_parallel: int = 1
    # Run the depth ControlNet's heavy blocks (resnet/downsample convs +
    # transformer matmuls) as dynamic W8A8 int8 on the MXU's 2x int8 path
    # (ops/quant.py). Forward-only inference optimization of the
    # stop-gradiented SDS teacher; params stay bf16 masters. Off by default
    # (bit-parity with the reference's fp16 autocast path). Validate output
    # quality against the bf16 path once real checkpoints load — the
    # random-weights parity tests bound per-module error, not end-to-end
    # guidance quality (tests/test_quant.py NOTE).
    int8_controlnet: bool = False
    # Extend int8 from the ControlNet to the FULL Zero123++ teacher: every
    # resnet/transformer/resample matmul of the denoiser UNet runs W8A8
    # (conv_in/conv_out/time-embedding stay exact). Implies int8_controlnet.
    # Same quality caveat as above, amplified — the main UNet is less
    # quantization-tolerant than the residual-hint ControlNet.
    int8_teacher: bool = False
    # Tile-local SDS backward. The SDS loss reads ONE 40x40 latent tile per
    # iteration (reference trainer.py:840-854) yet the default backward runs
    # through the FULL 960x640 VAE encode + 614k-point MLP query — measured
    # 187 ms of the 286 ms step (tools/student_ablation.py). With this on,
    # the forward (loss value, teacher input, logged grid) stays identical,
    # but gradients flow through a margin-padded slice around the sampled
    # tile only: exact for the pointwise texture MLP; exact for the VAE up
    # to receptive-field truncation at the slice border (controlled by
    # local_sds_margin_px) and the encoder mid-attention's global term.
    # Default ON since r5 (-77 ms/iter): the measured end-to-end effect of
    # the approximation is far inside run-to-run stochasticity — 500-iter
    # same-seed paints at production scale agree at 13.9 dB (atlas) /
    # 19.2 dB (renders) while two different-seed DEFAULT runs agree at only
    # 2.6 / 7.5 dB, and loss/view-consistency match or better the exact
    # path (docs/knob_quality_r5.json). Set false for reference-exact
    # gradients.
    local_sds_grad: bool = True
    # Margin in pixels (multiple of the VAE downsample factor) around the
    # sampled tile for the local backward slice; larger = closer to the
    # exact gradient. A margin covering the whole canvas reproduces the
    # default gradient exactly (tested in tests/test_local_grad.py).
    local_sds_margin_px: int = 64


@dataclass
class LogConfig:
    """Parameters for logging and saving (reference: train_config.py:102-124)."""

    # Experiment name
    exp_name: str = "default_exp"
    # Experiment output dir
    exp_root: Path = Path("experiments/")
    # Run only test
    eval_only: bool = False
    # Number of angles to sample for eval during training
    eval_size: int = 10
    # Number of angles to sample for eval after training
    full_eval_size: int = 100
    # Export a mesh
    save_mesh: bool = True
    # Whether to show intermediate diffusion visualizations
    vis_diffusion_steps: bool = False
    # Whether to log intermediate images
    log_images: bool = True
    # TPU addition: write log images from a background thread (the loop
    # thread only starts an async device->host copy). The reference writes
    # synchronously in-loop (trainer.py:902-904), which through the remote
    # tunnel measured +130 ms/iter at its every-10-iter cadence. File
    # contents are identical; exceptions (incl. the NaN-image guard)
    # surface at the next logging call or flush instead of in-loop.
    # false = reference-style synchronous writes.
    async_image_writer: bool = True

    @property
    def exp_dir(self) -> Path:
        return Path(self.exp_root) / self.exp_name


@dataclass
class TrainConfig:
    """The main configuration for the trainer (reference: train_config.py:127-133)."""

    log: LogConfig = field(default_factory=LogConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    guide: GuideConfig = field(default_factory=GuideConfig)


# ----------------------------------------------------------------------------
# pyrallis-compatible loading
# ----------------------------------------------------------------------------

_PATH_FIELDS = {"exp_root", "concept_path", "reference_texture", "initial_texture"}


def _coerce(value: Any, ftype: Any, name: str) -> Any:
    if value is None:
        return None
    if name in _PATH_FIELDS:
        return Path(value)
    origin = getattr(ftype, "__origin__", None)
    if ftype in (int,):
        return int(value)
    if ftype in (float,):
        return float(value)
    if ftype in (bool,):
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if ftype in (str,):
        return str(value)
    if origin in (list, List):
        return list(value)
    if origin in (tuple, Tuple):
        return tuple(value)
    return value


def _build_dataclass(cls, data: dict, section: str = "",
                     unknown: Optional[list] = None):
    kwargs = {}
    names = {f.name for f in fields(cls)}
    if unknown is not None:
        unknown.extend(f"{section}.{k}" for k in data if k not in names)
    for f in fields(cls):
        if f.name in data:
            v = data[f.name]
            ftype = f.type
            # Optional[X] -> X
            args = getattr(ftype, "__args__", None)
            if args and type(None) in args:
                non_none = [a for a in args if a is not type(None)]
                ftype = non_none[0] if non_none else Any
            kwargs[f.name] = _coerce(v, ftype, f.name)
    return cls(**kwargs)


def config_from_dict(data: dict, strict: bool = False) -> TrainConfig:
    """Build a TrainConfig. Unknown keys are warned-and-ignored by default
    (strict=True raises) — the reference's pyrallis hard-rejects them, which
    makes its own shipped mickey.yaml/beachball.yaml unrunnable (stale
    guidance_scale_crossattn/concat/control keys, SURVEY.md §5 gotcha); the
    warning keeps those mirrors runnable while still surfacing typos."""
    import logging

    sections = {
        "log": LogConfig,
        "render": RenderConfig,
        "optim": OptimConfig,
        "guide": GuideConfig,
    }
    unknown: list = [k for k in data if k not in sections]
    built = {}
    for key, cls in sections.items():
        built[key] = _build_dataclass(cls, data.get(key, {}) or {},
                                      section=key, unknown=unknown)
    if unknown:
        msg = (f"unknown config keys ignored: {', '.join(unknown)} "
               "(the reference's pyrallis would reject these)")
        if strict:
            raise ValueError(msg)
        logging.getLogger("contexture_nerf_tpu").warning(msg)
    return TrainConfig(**built)


def config_to_dict(cfg: TrainConfig) -> dict:
    def enc(obj):
        if is_dataclass(obj):
            return {f.name: enc(getattr(obj, f.name)) for f in fields(obj)}
        if isinstance(obj, Path):
            return str(obj)
        if isinstance(obj, tuple):
            return list(obj)
        if isinstance(obj, list):
            return [enc(x) for x in obj]
        return obj

    return enc(cfg)


def dump_config(cfg: TrainConfig, path: Path) -> None:
    Path(path).write_text(yaml.safe_dump(config_to_dict(cfg), sort_keys=False))


def _parse_cli_value(raw: str) -> Any:
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def load_config(argv: Optional[List[str]] = None) -> TrainConfig:
    """pyrallis-style entry: --config_path=... plus --section.key overrides."""
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--config_path", type=str, default=None)
    known, rest = parser.parse_known_args(argv)

    data: dict = {}
    if known.config_path:
        data = yaml.safe_load(Path(known.config_path).read_text()) or {}

    # CLI overrides: --log.exp_name value  |  --log.exp_name=value
    i = 0
    while i < len(rest):
        tok = rest[i]
        if not tok.startswith("--"):
            i += 1
            continue
        tok = tok[2:]
        if "=" in tok:
            key, val = tok.split("=", 1)
            i += 1
        else:
            key = tok
            val = rest[i + 1] if i + 1 < len(rest) else "true"
            i += 2
        parts = key.split(".")
        node = data
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_cli_value(val)

    return config_from_dict(data)
