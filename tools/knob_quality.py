"""Knob-quality artifact (VERDICT r4 next-round item #1).

Runs TWO identical production-scale paints on the chip — reference-parity
defaults vs the fast knobs (`optim.local_sds_grad` +
`optim.precompute_uv_embedding`) — with the same seed, then measures how far
the knobbed run's outputs drift from the default run's:

- PSNR between the final texture atlases (results/eval_texture_atlas.png)
- per-frame PSNR over the eval turntable renders (results/eval_video_*.gif)
- final-iterations SDS-loss agreement from metrics.json

`precompute_uv_embedding` is proven bit-identical (tests/test_round3.py), so
any divergence measured here is attributable to `local_sds_grad`'s gradient
approximation (receptive-field truncation + dropped encoder mid-attention
global term, core/config.py:187-196; reference loss geometry
/root/reference/src/training/trainer.py:840-854).

Writes docs/knob_quality_r5.json. Usage (on chip, warm cache recommended):

    python tools/knob_quality.py --iters 500
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _run_paint(exp_name: str, iters: int, seed: int, knobs: bool,
               log_path: Path, extra=None) -> float:
    cmd = [
        sys.executable, "-m", "scripts.run_contexture",
        "--config_path=configs/text_guided/spot_quick_test.yaml",
        f"--log.exp_name={exp_name}",
        f"--optim.sds_iterations={iters}",
        f"--optim.seed={seed}",
        # production render/texture scale — where the knob timings were
        # measured and where the VAE-receptive-field truncation actually
        # operates on 320^2 tiles of the 960x640 grid
        "--render.train_grid_size=1200",
        "--render.eval_grid_size=1024",
        "--guide.texture_resolution=1024",
        "--log.full_eval_size=8",
        f"--optim.checkpoint_interval={iters}",
    ]
    if knobs:
        cmd += ["--optim.local_sds_grad=true",
                "--optim.precompute_uv_embedding=true"]
    if extra:
        cmd += list(extra)
    t0 = time.time()
    with open(log_path, "w") as fh:
        subprocess.run(cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT,
                       check=True)
    return time.time() - t0


def _load_png(path: Path) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0


def _load_gif_frames(path: Path) -> list[np.ndarray]:
    from PIL import Image, ImageSequence
    im = Image.open(path)
    return [np.asarray(f.convert("RGB"), dtype=np.float32) / 255.0
            for f in ImageSequence.Iterator(im)]


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return float("inf") if mse == 0 else float(-10.0 * np.log10(mse))


def compare(exp_a: Path, exp_b: Path) -> dict:
    out: dict = {}
    atlas_a = exp_a / "results" / "eval_texture_atlas.png"
    atlas_b = exp_b / "results" / "eval_texture_atlas.png"
    out["texture_atlas_psnr_db"] = round(_psnr(_load_png(atlas_a),
                                               _load_png(atlas_b)), 2)
    albedo_a, albedo_b = exp_a / "mesh" / "albedo.png", exp_b / "mesh" / "albedo.png"
    if albedo_a.exists() and albedo_b.exists():
        out["albedo_psnr_db"] = round(_psnr(_load_png(albedo_a),
                                            _load_png(albedo_b)), 2)

    gifs_a = sorted((exp_a / "results").glob("eval_video_*.gif"))
    gifs_b = sorted((exp_b / "results").glob("eval_video_*.gif"))
    if gifs_a and gifs_b:
        fa, fb = _load_gif_frames(gifs_a[0]), _load_gif_frames(gifs_b[0])
        per_frame = [round(_psnr(x, y), 2) for x, y in zip(fa, fb)]
        out["eval_render_psnr_db"] = {
            "per_frame": per_frame,
            "mean": round(float(np.mean([p for p in per_frame
                                         if np.isfinite(p)] or [float("inf")])), 2)
            if any(np.isfinite(p) for p in per_frame) else float("inf"),
            "min": min(per_frame),
        }

    losses = {}
    for tag, exp in (("default", exp_a), ("knobs", exp_b)):
        m = json.loads((exp / "metrics.json").read_text())  # list of dicts
        sds = [r["sds_loss"] for r in m if "sds_loss" in r]
        vc = [r["view_consistency"] for r in m if "view_consistency" in r]
        losses[tag] = {
            "final_10_mean": round(float(np.mean(sds[-10:])), 6)
            if sds else None,
            "final_view_consistency": round(vc[-1], 6) if vc else None,
            "records": len(m),
        }
    out["sds_loss"] = losses
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=str(REPO / "docs" / "knob_quality_r5.json"))
    ap.add_argument("--compare-only", action="store_true",
                    help="skip the paints, just re-compare existing exps")
    ap.add_argument("--skip", default="",
                    help="comma-separated run tags to skip painting")
    args = ap.parse_args(argv)

    # run matrix: the knob comparison itself plus the two controls that make
    # raw PSNR interpretable. 500 iters of SDS on random-weight teachers is
    # chaotic — what matters is whether the knobbed trajectory diverges from
    # the default trajectory MORE than an equally-valid run (different seed)
    # does, and that precompute_uv_embedding alone really is bit-identical.
    runs = {
        "knobq_default": dict(seed=args.seed, knobs=False),
        "knobq_knobs": dict(seed=args.seed, knobs=True),
        "knobq_emb_only": dict(seed=args.seed, knobs=False,
                               extra=["--optim.precompute_uv_embedding=true"]),
        "knobq_seed1": dict(seed=args.seed + 1, knobs=False),
    }
    skip = set(filter(None, args.skip.split(",")))
    wall = {}
    if not args.compare_only:
        for name, spec in runs.items():
            if name in skip or (REPO / "experiments" / name / "mesh"
                                / "albedo.png").exists():
                continue
            wall[name + "_s"] = round(_run_paint(
                name, args.iters, spec["seed"], spec["knobs"],
                Path(f"/tmp/{name}.log"), extra=spec.get("extra")), 1)

    exp = {k: REPO / "experiments" / k for k in runs}
    result = {
        "what": "default vs (local_sds_grad + precompute_uv_embedding) at "
                "production render scale, with bit-identity and chaos-floor "
                "controls",
        "iters": args.iters,
        "seed": args.seed,
        "wall_clock": wall,
        "default_vs_knobs": compare(exp["knobq_default"], exp["knobq_knobs"]),
        "default_vs_emb_only_bit_identity_control": compare(
            exp["knobq_default"], exp["knobq_emb_only"]),
        "default_vs_seed1_chaos_floor": compare(
            exp["knobq_default"], exp["knobq_seed1"]),
    }
    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
