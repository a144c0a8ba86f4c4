"""Multi-chip communication projection from compiled SPMD modules
(VERDICT r4 next-round item #7).

Real multi-chip hardware is unavailable here, but the per-step communication
volume of the PRODUCTION SDS step on an n-chip mesh is a compile-time fact:
XLA's SPMD partitioner emits the collectives, and their operand/result sizes
are printed in the optimized HLO. This tool compiles the real training step
(full-size towers, production 1200-px render grid, 1024 texture) over
virtual CPU meshes of 1/2/4/8 devices (DP over the `views` axis, plus the
8-device (4,2) views x tp Megatron variant), tallies bytes per collective
kind, and projects iter time on a v5e-8 slice with an explicit ICI model.

Bandwidth model (auditable inputs, "How to Scale Your Model" v5e numbers):
  - ICI one-way link bandwidth: 4.5e10 B/s; v5e has a 2-D torus with 4
    links/chip -> ring all-reduce effective per-chip throughput
    ~ 2 links x 4.5e10 = 9.0e10 B/s for a 1-D ring embedding.
  - all-reduce moves 2*(n-1)/n x bytes per chip; all-gather and
    reduce-scatter move (n-1)/n x bytes.
  - projected comm time = sum over collectives of moved_bytes / 9.0e10.
  - projected iter time = per-device compute (measured single-chip iter
    x per-device FLOP fraction from compiled.cost_analysis) + comm, both
    with and without perfect overlap.

Writes docs/comm_projection_r5.json; a summary table is appended to
docs/SHARDING.md by hand. Runs entirely on CPU (~minutes per compile on the
1-core host).

Usage: python tools/comm_projection.py [--grid 1200] [--texture 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

ICI_EFFECTIVE_BPS = 9.0e10  # 2 links x 4.5e10 B/s one-way (see module doc)

_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "u8": 1,
          "pred": 1, "s8": 1, "f64": 8, "s64": 8}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def collective_bytes(txt: str) -> dict:
    """Per-kind result-buffer byte totals of every collective instruction
    in optimized HLO text (tuple results summed)."""
    out = {k: {"count": 0, "bytes": 0} for k in _COLLECTIVES}
    inst_re = re.compile(
        r"=\s*(\(?[a-z0-9]+\[[0-9,]*\][^)]*\)?)\s+(" +
        "|".join(_COLLECTIVES) + r")(?:-start|-done)?\(")
    shape_re = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    seen_done = set()
    for line in txt.splitlines():
        m = inst_re.search(line)
        if not m:
            continue
        kind = m.group(2)
        # async pairs print the buffer twice (start+done); count starts only
        if f"{kind}-done" in line:
            continue
        total = 0
        for sm in shape_re.finditer(m.group(1)):
            n = 1
            for d in sm.group(2).split(","):
                if d:
                    n *= int(d)
            total += n * _BYTES.get(sm.group(1), 4)
        out[kind]["count"] += 1
        out[kind]["bytes"] += total
    return {k: v for k, v in out.items() if v["count"]}


def _child(n_devices: int, tp: int, grid: int, texture: int) -> dict:
    """Runs in the subprocess: compile the production step on the virtual
    mesh and report collective + FLOP + memory stats."""
    import jax
    import jax.numpy as jnp

    from contexture_nerf_tpu.core.config import config_from_dict
    from contexture_nerf_tpu.training.trainer import ConTEXTure
    from tools.make_shapes import uv_sphere, write_obj

    import tempfile
    tmp = Path(tempfile.mkdtemp())
    sphere = tmp / "sphere.obj"
    write_obj(sphere, *uv_sphere(32, 48))

    cfg = config_from_dict({
        "log": {"exp_name": "commproj", "exp_root": str(tmp),
                "eval_size": 1, "full_eval_size": 1, "log_images": False,
                "save_mesh": False},
        "render": {"train_grid_size": grid, "eval_grid_size": grid},
        "guide": {"text": "a test", "shape_path": str(sphere),
                  "texture_resolution": texture},
        "optim": {"seed": 0, "sds_iterations": 1,
                  "data_parallel": "on" if n_devices > 1 else "off",
                  "tensor_parallel": tp},
    })
    tr = ConTEXTure(cfg, tiny_models=False, backend="xla")
    mesh = tr._make_mesh()
    setup = tr.prepare_sds(skip_bootstrap=True)
    step, optimizer, hot = tr._build_sds_step(setup, mesh)
    params = tr.texture_params
    opt_state = optimizer.init(params)
    t = jnp.asarray([500], jnp.int32)
    key = jax.random.PRNGKey(0)
    compiled = step.lower(params, opt_state, t, key, hot).compile()
    txt = compiled.as_text()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = None
    mem = compiled.memory_analysis()
    return {
        "n_devices": n_devices,
        "tp": tp,
        "collectives": collective_bytes(txt),
        "per_device_flops": flops,
        "per_device_temp_bytes": int(mem.temp_size_in_bytes),
    }


def run_child(n: int, tp: int, grid: int, texture: int,
              timeout_s: int = 3600) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        CTN_FAST_TINY_INIT="1",  # full-size towers, random weights: fill
                                 # via eval_shape, values irrelevant to HLO
        XLA_FLAGS=(f"--xla_force_host_platform_device_count={n} "
                   "--xla_backend_optimization_level=0"),
    )
    code = (
        "import json, sys; sys.path.insert(0, '.');"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from tools.comm_projection import _child;"
        f"print('CHILD_JSON:' + json.dumps(_child({n}, {tp}, {grid}, "
        f"{texture})))"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout_s)
    for line in r.stdout.splitlines():
        if line.startswith("CHILD_JSON:"):
            return json.loads(line[len("CHILD_JSON:"):])
    raise RuntimeError(
        f"child ({n} dev, tp={tp}) rc={r.returncode}: "
        f"{r.stderr[-2000:]}\n{r.stdout[-500:]}")


def project(row: dict, single: dict, measured_iter_ms: float) -> dict:
    n = row["n_devices"]
    moved = 0.0
    for kind, v in row["collectives"].items():
        factor = 2 * (n - 1) / n if kind == "all-reduce" else (n - 1) / n
        moved += v["bytes"] * factor
    comm_ms = 1e3 * moved / ICI_EFFECTIVE_BPS
    if row["per_device_flops"] and single["per_device_flops"]:
        frac = row["per_device_flops"] / single["per_device_flops"]
    else:
        frac = 1.0 / n
    compute_ms = measured_iter_ms * frac
    return {
        "moved_bytes_per_chip": int(moved),
        "comm_ms": round(comm_ms, 2),
        "compute_ms": round(compute_ms, 1),
        "iter_ms_no_overlap": round(compute_ms + comm_ms, 1),
        "iter_ms_full_overlap": round(max(compute_ms, comm_ms), 1),
        "compute_fraction_of_single": round(frac, 4),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=1200)
    ap.add_argument("--texture", type=int, default=1024)
    ap.add_argument("--measured-iter-ms", type=float, default=288.7,
                    help="measured single-chip full SDS iter (BENCH_r04)")
    ap.add_argument("--out",
                    default=str(REPO / "docs" / "comm_projection_r5.json"))
    args = ap.parse_args(argv)

    shapes = [(1, 1), (2, 1), (4, 1), (8, 1), (8, 2)]
    rows = []
    for n, tp in shapes:
        print(f"compiling {n}-device mesh (tp={tp}) ...", flush=True)
        rows.append(run_child(n, tp, args.grid, args.texture))
        print(f"  collectives: {rows[-1]['collectives']}", flush=True)

    single = rows[0]
    result = {
        "what": "per-step communication volume of the production SDS step "
                "per mesh shape, from XLA SPMD-partitioned HLO, with a v5e "
                "ICI projection",
        "render_grid": args.grid,
        "texture_resolution": args.texture,
        "measured_single_chip_iter_ms": args.measured_iter_ms,
        "ici_model": {
            "effective_per_chip_Bps": ICI_EFFECTIVE_BPS,
            "basis": "v5e 2-D torus, 4.5e10 B/s one-way per link, 2 links "
                     "usable for a ring embedding; all-reduce moves "
                     "2(n-1)/n x bytes, gather/scatter (n-1)/n x",
        },
        "rows": [
            {**row, "projection": project(row, single,
                                          args.measured_iter_ms)}
            if row["n_devices"] > 1 else row
            for row in rows
        ],
    }
    Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({"wrote": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
