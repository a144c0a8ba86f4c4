"""MFU attribution for the Zero123++ teacher step (VERDICT r3 #3).

The open question: teacher MFU is ~25% and docs/PERF.md claims the residual
is conv SHAPE (deep UNet blocks run 3x3 convs on 15x10..30x20 spatial grids
whose GEMM M-dim cannot fill the MXU) — but that claim had no artifact. This
tool produces one, bottom-up:

  1. compile the production `_cfg_v_pred` graph (the bench's exact function)
     and parse its optimized HLO for every `convolution` and `dot` op:
     result/operand shapes, counts, per-op FLOPs;
  2. microbench each DISTINCT conv/dot shape standalone (same dtype, jit,
     median of repeated windows) -> achieved TFLOP/s and MXU utilization
     per shape;
  3. sum count x standalone-time into a bottom-up time model and compare
     against the measured wall clock of the full graph. The gap between
     bottom-up and wall is scheduling/HBM/elementwise/attention (the Pallas
     flash kernel is a custom-call, benched separately).

Round 5 (VERDICT r4 missing #1): attention joins the accounting. Every
attention() call of the traced graph is recorded at trace time
(ops/attention.py:record_attention_calls); the Pallas-path calls' FLOPs
(4*B*H*Sq*(Skv+Se)*d — invisible to compiled.cost_analysis()) are added to
the MFU denominator, each distinct shape is standalone-benched like the
convs, and the output carries a category table (conv/dot + flash-attention +
residual) against the wall clock.

Writes docs/mfu_r5.json and prints a summary table.

Usage:  python tools/mfu_attribution.py [--tiny]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "axon,tpu,cpu")

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from contexture_nerf_tpu.core.timing import median_iqr_ms, timed_windows

PEAK_BF16 = 197e12  # v5e


def _shape_of(s):
    """'bf16[2,120,80,320]{3,2,1,0}' -> ('bf16', (2,120,80,320))."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", s)
    dims = tuple(int(d) for d in m.group(2).split(",") if d)
    return m.group(1), dims


def parse_hlo_ops(txt):
    """Extract conv and dot ops from optimized HLO text.

    Returns list of dicts {kind, out, lhs, rhs, window, dnums, flops}.
    Shapes are read from the instruction's printed operand types; fusion
    bodies print their inner instructions too, so convs inside fusions are
    still seen (each fusion body instruction appears once per fusion DEF,
    matching its execution count per graph invocation).
    """
    # operands are printed by NAME only — build name -> shape first, from
    # both instruction defs (%name = ty[...]) and computation parameters
    # (name: ty[...])
    shapes = {}
    def_re = re.compile(r"%([\w.\-]+)\s*=\s*([a-z0-9]+\[[0-9,]*\])")
    par_re = re.compile(r"([\w.\-]+):\s*([a-z0-9]+\[[0-9,]*\])")
    for line in txt.splitlines():
        m = def_re.search(line)
        if m:
            shapes[m.group(1)] = m.group(2)
        for m in par_re.finditer(line):
            shapes.setdefault(m.group(1), m.group(2))

    ops = []
    conv_re = re.compile(
        r"=\s*([a-z0-9]+\[[0-9,]*\][^ ]*)\s+convolution\("
        r"\s*%([\w.\-]+),\s*%([\w.\-]+)\s*\)(.*)$")
    dot_re = re.compile(
        r"=\s*([a-z0-9]+\[[0-9,]*\][^ ]*)\s+dot\("
        r"\s*%([\w.\-]+),\s*%([\w.\-]+)\s*\)(.*)$")
    for line in txt.splitlines():
        m = conv_re.search(line)
        if m:
            if m.group(2) not in shapes or m.group(3) not in shapes:
                continue
            out_t, out_s = _shape_of(m.group(1))
            _, lhs_s = _shape_of(shapes[m.group(2)])
            _, rhs_s = _shape_of(shapes[m.group(3)])
            dl = re.search(r"dim_labels=(\S+)", m.group(4))
            dim_labels = dl.group(1).rstrip(",") if dl else ""
            # FLOPs: 2 * out_elems * (contracted input features x kernel
            # spatial). Read Cin and kernel spatial from the rhs via
            # dim_labels (e.g. b01f_01io->b01f: rhs is (kh,kw,Cin,Cout)).
            out_elems = 1
            for d in out_s:
                out_elems *= d
            rhs_part = dim_labels.split("_")[1].split("-")[0] if dim_labels \
                else ""
            k_spatial, cin = 1, 1
            for ch, dim in zip(rhs_part, rhs_s):
                if ch.isdigit():
                    k_spatial *= dim
                elif ch == "i":
                    cin = dim
            flops = 2 * out_elems * k_spatial * cin
            ops.append({"kind": "conv", "dtype": out_t, "out": out_s,
                        "lhs": lhs_s, "rhs": rhs_s,
                        "dim_labels": dim_labels, "flops": flops})
            continue
        m = dot_re.search(line)
        if m:
            if m.group(2) not in shapes or m.group(3) not in shapes:
                continue
            out_t, out_s = _shape_of(m.group(1))
            _, lhs_s = _shape_of(shapes[m.group(2)])
            _, rhs_s = _shape_of(shapes[m.group(3)])
            def dims(name):
                mm = re.search(name + r"=\{([0-9,]*)\}", m.group(4))
                return tuple(int(x) for x in mm.group(1).split(",")
                             if x) if mm else ()

            lhs_b, lhs_c = dims("lhs_batch_dims"), dims("lhs_contracting_dims")
            rhs_b, rhs_c = dims("rhs_batch_dims"), dims("rhs_contracting_dims")
            out_elems = 1
            for d in out_s:
                out_elems *= d
            k = 1
            for i in rhs_c:
                k *= rhs_s[i]
            flops = 2 * out_elems * k
            ops.append({"kind": "dot", "dtype": out_t, "out": out_s,
                        "lhs": lhs_s, "rhs": rhs_s,
                        "lhs_batch": lhs_b, "lhs_contracting": lhs_c,
                        "rhs_batch": rhs_b, "rhs_contracting": rhs_c,
                        "flops": flops})
    return ops


def group_ops(ops):
    groups = defaultdict(lambda: {"count": 0, "flops": 0})
    for op in ops:
        sig = (op["kind"], op["dtype"], op["lhs"], op["rhs"], op["out"],
               op.get("dim_labels", ""),
               op.get("lhs_contracting", ()), op.get("rhs_contracting", ()),
               op.get("lhs_batch", ()), op.get("rhs_batch", ()))
        g = groups[sig]
        g["count"] += 1
        g["flops"] += op["flops"]
        g["op"] = op
    return groups


def bench_shape(op, reps=3, iters=2, scan_len=64):
    """Standalone jit microbench of one conv/dot shape.

    The op is repeated `scan_len` times inside ONE jitted lax.scan with a
    carry-scalar data dependency (each iteration's input is scaled by a
    scalar read from the previous output) — one device launch per
    measurement, so the axon tunnel's per-dispatch overhead (~1.5 ms/call,
    which dominated a naive per-call bench and made the bottom-up sum 14x
    the wall clock) amortizes to noise and CSE cannot collapse the
    repeats."""
    dt = {"bf16": jnp.bfloat16, "f32": jnp.float32}[op["dtype"]]
    lhs = jnp.zeros(op["lhs"], dt)
    rhs = jnp.zeros(op["rhs"], dt)
    if op["kind"] == "conv":
        dl = op["dim_labels"]
        lhs_l, rest = dl.split("_")
        rhs_l, out_l = rest.split("->")
        # reconstruct padding/stride so the output shape matches: solve per
        # spatial dim assuming stride in {1,2}, SAME-ish padding
        lhs_sp = [op["lhs"][lhs_l.index(c)] for c in "01" if c in lhs_l]
        out_sp = [op["out"][out_l.index(c)] for c in "01" if c in out_l]
        k_sp = [op["rhs"][rhs_l.index(c)] for c in "01" if c in rhs_l]
        strides, pads = [], []
        for i_sp, o_sp, k in zip(lhs_sp, out_sp, k_sp):
            s = 2 if o_sp * 2 <= i_sp + 1 else 1
            pad_total = max(0, (o_sp - 1) * s + k - i_sp)
            pads.append((pad_total // 2, pad_total - pad_total // 2))
            strides.append(s)
        # HLO dim_labels (b01f_01io->b01f) -> jax spec letters (NHWC...)
        tr_act = {"b": "N", "f": "C", "0": "H", "1": "W"}
        tr_ker = {"i": "I", "o": "O", "0": "H", "1": "W"}
        dn = jax.lax.conv_dimension_numbers(
            op["lhs"], op["rhs"],
            ("".join(tr_act[c] for c in lhs_l),
             "".join(tr_ker[c] for c in rhs_l),
             "".join(tr_act[c] for c in out_l)))

        def f(a, b):
            return jax.lax.conv_general_dilated(
                a, b, window_strides=strides, padding=pads,
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)
    else:
        dnums = ((op["lhs_contracting"], op["rhs_contracting"]),
                 (op["lhs_batch"], op["rhs_batch"]))

        def f(a, b):
            return jax.lax.dot_general(a, b, dnums,
                                       preferred_element_type=jnp.float32)

    def repeated(a, b):
        def body(c, _):
            # single-element dynamic-update dependency: forces each
            # iteration to run after the previous one without copying the
            # whole input (a*carry added a full HBM read+write per iter)
            a2 = a.at[tuple(0 for _ in a.shape)].add(c.astype(a.dtype))
            out = f(a2, b)
            return (out.reshape(-1)[0] * 1e-20).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=scan_len)
        return c

    jf = jax.jit(repeated)
    try:
        jax.block_until_ready(jf(lhs, rhs))
    except Exception as e:
        return None, f"{type(e).__name__}: {str(e)[:120]}"
    samples = timed_windows(lambda: jf(lhs, rhs), jax.block_until_ready,
                            iters, reps)
    med_ms, _ = median_iqr_ms(samples)
    return med_ms / scan_len, None


def attn_flops(call, padded: bool = False):
    """FLOPs of one attention() call: 4*B*H*Sq*(Skv+Se)*d (QK^T + PV, factor
    2 each). With padded=True, uses the shapes the Pallas kernel actually
    feeds the MXU: d lane-aligned to 128, Sq/Skv/Se padded to their block
    multiples (ops/attention.py:_pick_blocks / _pad_to)."""
    B, H, sq, skv, se, d = (call["B"], call["H"], call["Sq"], call["Skv"],
                            call["Se"], call["d"])
    if padded:
        from contexture_nerf_tpu.ops.attention import _pick_blocks
        q_blk, kv_blk = _pick_blocks(sq, max(skv, se))
        d = d + ((-d) % 128)
        sq = sq + ((-sq) % q_blk)
        skv = skv + ((-skv) % kv_blk)
        se = se + ((-se) % kv_blk) if se else 0
    return 4 * B * H * sq * (skv + se) * d


def bench_attention_shape(call, reps=3, iters=2, scan_len=16,
                          force_xla=False):
    """Standalone scan-harness bench of flash_attention_pallas — or, with
    force_xla, the einsum+softmax fallback — at one recorded call shape
    (same chained-dependency trick as bench_shape)."""
    from contexture_nerf_tpu.ops.attention import (_xla_attention,
                                                   flash_attention_pallas)

    dt = jnp.bfloat16 if "bfloat16" in call["dtype"] else jnp.float32
    B, H, d = call["B"], call["H"], call["d"]
    key = jax.random.PRNGKey(0)
    mk = lambda s, k: jax.random.normal(k, (B, H, s, d), dt)
    ks = jax.random.split(key, 5)
    q = mk(call["Sq"], ks[0])
    k = mk(call["Skv"], ks[1])
    v = mk(call["Skv"], ks[2])
    has_extra = call["Se"] > 0
    ek = mk(call["Se"], ks[3]) if has_extra else None
    ev = mk(call["Se"], ks[4]) if has_extra else None

    def attend(q2, k, v, ek, ev):
        if force_xla:
            kk = k if ek is None else jnp.concatenate([k, ek], axis=2)
            vv = v if ev is None else jnp.concatenate([v, ev], axis=2)
            return _xla_attention(q2, kk, vv)
        return flash_attention_pallas(q2, k, v, ek, ev)

    def repeated(q, k, v, ek=None, ev=None):
        def body(c, _):
            q2 = q.at[(0, 0, 0, 0)].add(c.astype(q.dtype))
            out = attend(q2, k, v, ek, ev)
            return (out[0, 0, 0, 0].astype(jnp.float32) * 1e-20), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=scan_len)
        return c

    args = (q, k, v, ek, ev) if has_extra else (q, k, v)
    jf = jax.jit(repeated)
    try:
        jax.block_until_ready(jf(*args))
    except Exception as e:
        return None, f"{type(e).__name__}: {str(e)[:120]}"
    samples = timed_windows(lambda: jf(*args), jax.block_until_ready,
                            iters, reps)
    med_ms, _ = median_iqr_ms(samples)
    return med_ms / scan_len, None


def bench_floor():
    """Per-iteration cost of the scan harness itself (a minimal dot),
    reported so floor-limited measurements are identifiable."""
    op = {"kind": "dot", "dtype": "bf16", "lhs": (8, 8), "rhs": (8, 8),
          "out": (8, 8), "lhs_batch": (), "rhs_batch": (),
          "lhs_contracting": (1,), "rhs_contracting": (0,)}
    ms, err = bench_shape(op)
    return ms if err is None else None


def main():
    tiny = "--tiny" in sys.argv
    cache_dir = os.environ.get("CTN_JAX_CACHE",
                               os.path.expanduser("~/.cache/ctnerf_jax"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from contexture_nerf_tpu.diffusion.zero123plus import Zero123PlusPipeline

    pipe = Zero123PlusPipeline(tiny=tiny, dtype=jnp.bfloat16, seed=0)
    h, w = (24, 16) if tiny else (120, 80)
    latents = jnp.zeros((1, 4, h, w), jnp.float32)
    cond_hw = 8 if tiny else 40
    cond_lat_pair = jnp.zeros((2, 4, cond_hw, cond_hw), jnp.float32)
    ehs = jnp.zeros((2, 77, pipe.text_config.hidden_size), jnp.float32)
    depth = jnp.zeros((1, 3, h * 8, w * 8), jnp.float32)
    t = jnp.asarray([500], jnp.int32)
    key = jax.random.PRNGKey(0)
    emb = pipe.embed_control_cond(pipe.params, depth, (h, w))

    def f(params, latents, t, cond_lat_pair, ehs, depth, emb):
        return pipe._cfg_v_pred(params, latents, t, cond_lat_pair, ehs,
                                depth, 10.0, key, scale_input=lambda x: x,
                                cn_cond_emb=emb)

    args = (pipe.params, latents, t, cond_lat_pair, ehs, depth, emb)
    print("compiling _cfg_v_pred ...", flush=True)
    from contexture_nerf_tpu.ops.attention import record_attention_calls

    attn_calls: list = []
    with record_attention_calls(attn_calls):
        lowered = jax.jit(f).lower(*args)
    compiled = lowered.compile()
    try:
        total_flops = compiled.cost_analysis()["flops"]
    except Exception:
        total_flops = 0.0
    txt = compiled.as_text()
    jax.block_until_ready(compiled(*args))
    n_iters, reps = (3, 2) if tiny else (15, 5)
    samples = timed_windows(lambda: compiled(*args), jax.block_until_ready,
                            n_iters, reps)
    wall_ms, wall_iqr = median_iqr_ms(samples)

    # Attention workload (VERDICT r4 missing #1): Pallas custom-call FLOPs
    # are invisible to compiled.cost_analysis(), so the true denominator is
    # XLA's count PLUS the flash-attention calls recorded at trace time.
    # XLA-path attention (Sq < 256, e.g. the CLIP towers) lowers to dots and
    # is already inside total_flops — only pallas=True calls are added.
    pallas_calls = [c for c in attn_calls if c["pallas"]]
    attn_useful = sum(attn_flops(c) for c in pallas_calls)
    attn_padded = sum(attn_flops(c, padded=True) for c in pallas_calls)
    true_flops = total_flops + attn_useful
    mfu_xla_only = 100.0 * total_flops / (wall_ms / 1e3) / PEAK_BF16
    mfu = 100.0 * true_flops / (wall_ms / 1e3) / PEAK_BF16
    print(f"wall {wall_ms:.1f} ms  (IQR {wall_iqr:.2f})  "
          f"XLA flops {total_flops/1e9:.1f} G + attention "
          f"{attn_useful/1e9:.1f} G useful ({attn_padded/1e9:.1f} G as-fed, "
          f"d pad 64->128)  MFU {mfu:.1f}% (was {mfu_xla_only:.1f}% "
          f"XLA-only)", flush=True)
    print(f"{len(attn_calls)} attention calls traced, "
          f"{len(pallas_calls)} on the Pallas path", flush=True)

    ops = parse_hlo_ops(txt)
    groups = group_ops(ops)
    print(f"{len(ops)} conv/dot instances, {len(groups)} distinct shapes",
          flush=True)

    # component decomposition: the teacher = reference-write UNet pass
    # (CFG batch 2 at the 40x40 cond latent) + depth ControlNet + main UNet
    # pass with doubled self-attn KV. Each is compiled standalone — coarse
    # but overhead-free attribution of the wall clock.
    comp = {}

    def _bench_fn(fn, *a):
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(*a))
        s = timed_windows(lambda: jfn(*a), jax.block_until_ready,
                          n_iters, reps)
        return round(median_iqr_ms(s)[0], 2)

    noisy_cond = jnp.zeros((2, 4, cond_hw, cond_hw), jnp.bfloat16)
    ehs2 = jnp.repeat(ehs, 1, axis=0)
    lat2 = jnp.zeros((2, 4, h, w), jnp.float32)

    def write_pass(params, noisy_cond, ehs):
        ref = []
        pipe.unet.apply(params["unet"], noisy_cond, t, ehs, ref_out=ref)
        return ref

    comp["write_pass_ms"] = _bench_fn(
        lambda p, nc, e: write_pass(p, nc, e), pipe.params, noisy_cond, ehs2)

    def cn_pass(params, lat, ehs, emb):
        emb_all = jnp.concatenate([emb] * 2)
        return pipe.controlnet.apply(
            params["controlnet"], lat, t, ehs, depth,
            pipe.conditioning_scale, cond_embedding=emb_all)

    comp["controlnet_ms"] = _bench_fn(cn_pass, pipe.params, lat2, ehs2, emb)

    ref_static = jax.jit(write_pass)(pipe.params, noisy_cond, ehs2)
    ref_static = [jax.lax.stop_gradient(r) for r in ref_static]

    def main_pass(params, lat, ehs, downs, mid, ref):
        return pipe.unet.apply(params["unet"], lat, t, ehs,
                               down_residuals=downs, mid_residual=mid,
                               ref_kv_list=list(ref))

    downs_mid = jax.jit(cn_pass)(pipe.params, lat2, ehs2, emb)
    comp["main_pass_ms"] = _bench_fn(
        main_pass, pipe.params, lat2, ehs2, downs_mid[0], downs_mid[1],
        ref_static)
    comp["sum_components_ms"] = round(sum(
        v for k, v in comp.items() if k.endswith("_ms")), 2)
    print(f"components: {comp}", flush=True)

    floor_ms = bench_floor()
    print(f"scan-harness floor: {floor_ms:.4f} ms/iter" if floor_ms
          else "scan-harness floor: unmeasured", flush=True)

    rows = []
    for sig, g in sorted(groups.items(), key=lambda kv: -kv[1]["flops"]):
        op = g["op"]
        ms, err = bench_shape(op)
        flops_one = op["flops"]
        # floor-adjusted: subtract the harness's per-iteration cost; floors
        # at 10% of the raw reading so adjustment cannot go negative
        ms_adj = (max(ms - floor_ms, 0.1 * ms)
                  if ms is not None and floor_ms else ms)
        util = (100.0 * flops_one / (ms_adj / 1e3) / PEAK_BF16
                if ms_adj else None)
        if util is not None and util > 100.0:
            # reading below the dispatch floor: the true per-op cost is
            # unmeasurable standalone — clamp to the physically possible
            # bound instead of reporting a nonsense utilization
            ms_adj = flops_one / PEAK_BF16 * 1e3
            util = None
        rows.append({
            "kind": op["kind"], "dtype": op["dtype"],
            "lhs": list(op["lhs"]), "rhs": list(op["rhs"]),
            "out": list(op["out"]), "count": g["count"],
            "gflops_each": round(flops_one / 1e9, 3),
            "flops_pct_of_total": round(100 * g["flops"]
                                        / max(total_flops, 1), 2),
            "standalone_ms": None if ms is None else round(ms, 4),
            "floor_limited": (bool(ms < 3 * floor_ms)
                              if ms is not None and floor_ms else None),
            "mxu_util_pct": None if util is None else round(util, 1),
            "projected_total_ms": None if ms_adj is None
            else round(ms_adj * g["count"], 2),
            "error": err,
        })

    # distinct Pallas attention shapes, standalone-benched like the convs
    attn_groups = defaultdict(lambda: {"count": 0})
    for c in pallas_calls:
        sig = (c["B"], c["H"], c["Sq"], c["Skv"], c["Se"], c["d"],
               c["dtype"])
        attn_groups[sig]["count"] += 1
        attn_groups[sig]["call"] = c
    attn_rows = []
    for sig, g in sorted(attn_groups.items(),
                         key=lambda kv: -attn_flops(kv[1]["call"])):
        c = g["call"]
        ms, err = bench_attention_shape(c)
        useful = attn_flops(c)
        padded = attn_flops(c, padded=True)
        attn_rows.append({
            "B": c["B"], "H": c["H"], "Sq": c["Sq"], "Skv": c["Skv"],
            "Se": c["Se"], "d": c["d"], "count": g["count"],
            "gflops_useful_each": round(useful / 1e9, 3),
            "gflops_as_fed_each": round(padded / 1e9, 3),
            "standalone_ms": None if ms is None else round(ms, 4),
            "mxu_util_useful_pct": None if not ms else round(
                100.0 * useful / (ms / 1e3) / PEAK_BF16, 1),
            "mxu_util_as_fed_pct": None if not ms else round(
                100.0 * padded / (ms / 1e3) / PEAK_BF16, 1),
            "projected_total_ms": None if ms is None
            else round(ms * g["count"], 2),
            "error": err,
        })

    bottom_up_ms = sum(r["projected_total_ms"] or 0.0 for r in rows)
    attn_bottom_up_ms = sum(r["projected_total_ms"] or 0.0
                            for r in attn_rows)
    matmul_flops = sum(g["flops"] for g in groups.values())
    residual = wall_ms - bottom_up_ms - attn_bottom_up_ms
    out = {
        "wall_ms": round(wall_ms, 2),
        "wall_iqr_ms": round(wall_iqr, 2),
        "scan_harness_floor_ms": None if floor_ms is None
        else round(floor_ms, 4),
        "components": comp,
        "xla_total_flops": total_flops,
        "attention_flops_useful": attn_useful,
        "attention_flops_as_fed": attn_padded,
        "true_total_flops": true_flops,
        "mfu_pct": round(mfu, 2),
        "mfu_pct_xla_denominator_only": round(mfu_xla_only, 2),
        "conv_dot_flops": matmul_flops,
        "conv_dot_flops_pct_of_xla": round(100 * matmul_flops
                                           / max(total_flops, 1), 1),
        "category_ms": {
            "conv_dot_bottom_up": round(bottom_up_ms, 1),
            "flash_attention_bottom_up": round(attn_bottom_up_ms, 1),
            "residual_fusions_hbm_sched": round(residual, 1),
            "wall": round(wall_ms, 2),
        },
        "residual_note": "bottom-up standalone benches overlap nothing AND "
                         "carry per-call dispatch/scan overhead the fused "
                         "graph amortizes, so per-shape sums bracket rather "
                         "than partition the wall (small shapes can make "
                         "the sum EXCEED it); sub-floor conv rows are "
                         "clamped to their speed-of-light bound with util "
                         "reported as unmeasurable. Authoritative deltas "
                         "come from full-graph A/B walls "
                         "(tools/teacher_bisect.py artifacts).",
        "device": str(jax.devices()[0]),
        "rows": rows,
        "attention_rows": attn_rows,
        "attention_calls_traced": len(attn_calls),
        "attention_calls_pallas": len(pallas_calls),
    }
    dst = Path(__file__).resolve().parent.parent / "docs" / "mfu_r5.json"
    dst.write_text(json.dumps(out, indent=1))
    print(f"wrote {dst}", flush=True)
    print(f"bottom-up conv+dot {bottom_up_ms:.1f} + attention "
          f"{attn_bottom_up_ms:.1f} ms of {wall_ms:.1f} wall; residual "
          f"{residual:.1f} ms", flush=True)
    for r in attn_rows:
        print(f"  attn B={r['B']} H={r['H']} Sq={r['Sq']} Skv={r['Skv']} "
              f"Se={r['Se']} d={r['d']} x{r['count']}: {r['standalone_ms']} "
              f"ms, util useful {r['mxu_util_useful_pct']}% / as-fed "
              f"{r['mxu_util_as_fed_pct']}%", flush=True)
    worst = [r for r in rows if r["mxu_util_pct"] is not None
             and r["flops_pct_of_total"] > 2]
    worst.sort(key=lambda r: r["mxu_util_pct"])
    print("lowest-utilization shapes holding >2% of FLOPs:")
    for r in worst[:8]:
        print(f"  {r['kind']} lhs={r['lhs']} rhs={r['rhs']} x{r['count']}: "
              f"{r['standalone_ms']} ms, util {r['mxu_util_pct']}%, "
              f"{r['flops_pct_of_total']}% of FLOPs")


if __name__ == "__main__":
    main()
