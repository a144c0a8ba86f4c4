"""Dynamic int8 quantization primitives for the MXU (W8A8, symmetric).

The v5e MXU runs int8 matmuls at 2x its bf16 rate (394 vs 197 TOPS peak),
and the depth ControlNet — ~1/4 of the Zero123++ teacher's FLOPs, executed
every one of the 5000 SDS iterations (reference applies it per denoise step,
/root/reference/src/zero123plus.py:283-290) — is a residual-hint network
whose output feeds the UNet through zero-init projections, making it the
most quantization-tolerant quarter of the step. These primitives slot into
flax's injection points (nn.Dense(dot_general=...),
nn.Conv(conv_general_dilated=...)) so the param tree, converter, and
checkpoints are untouched: weights stay bf16/f32 masters and are quantized
on the fly at trace time (one extra elementwise pass over W, negligible
beside the matmul).

Scheme: symmetric round-to-nearest int8, int32 accumulation.
  - dot: per-row scales for the activations (amax over the contracting
    dim), per-column scales for the weights — the standard accuracy-
    preserving factorization (out = (qa @ qw) * sa_row ⊗ sw_col).
  - conv: per-tensor activation scale (a 3x3 window mixes neighboring
    pixels, so a per-pixel scale cannot be factored out of the sum),
    per-output-channel weight scales.

Gradients: custom VJP through the EXACT f32 op (quantization is a
forward-only inference optimization; the SDS teacher sits under
stop_gradient in the trainer, but a silent zero-gradient from round() would
be a trap for any other caller).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def quantize_int8(x: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization with shared scales over `axes`.
    Returns (q int8, scale f32 with keepdims shape); x ~= q * scale."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_dot_fwd_impl(lhs, rhs):
    # flax Dense pattern: lhs (..., K) x rhs (K, N), contracting (-1, 0)
    ql, sl = quantize_int8(lhs, axes=-1)            # sl (..., 1)
    qr, sr = quantize_int8(rhs, axes=0)             # sr (1, N)
    out = jax.lax.dot_general(ql, qr, (((lhs.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * sl * sr).astype(lhs.dtype)


@jax.custom_vjp
def _int8_dot(lhs, rhs):
    return _int8_dot_fwd_impl(lhs, rhs)


def _int8_dot_vjp_fwd(lhs, rhs):
    return _int8_dot_fwd_impl(lhs, rhs), (lhs, rhs)


def _int8_dot_vjp_bwd(res, g):
    lhs, rhs = res
    _, vjp = jax.vjp(
        lambda a, b: jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ()))), lhs, rhs)
    return vjp(g)


_int8_dot.defvjp(_int8_dot_vjp_fwd, _int8_dot_vjp_bwd)


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """Drop-in for lax.dot_general at flax nn.Dense's call pattern
    ((lhs.ndim-1,), (0,)) with no batch dims; falls back to the exact op
    for any other contraction."""
    ((lc, rc), (lb, rb)) = dimension_numbers
    if (tuple(lc), tuple(rc)) == ((lhs.ndim - 1,), (0,)) and not lb and not rb:
        return _int8_dot(lhs, rhs)
    return jax.lax.dot_general(lhs, rhs, dimension_numbers,
                               precision=precision,
                               preferred_element_type=preferred_element_type)


def _conv_kwargs(window_strides, padding, lhs_dilation, rhs_dilation,
                 dimension_numbers, feature_group_count):
    return dict(window_strides=window_strides, padding=padding,
                lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
                dimension_numbers=dimension_numbers,
                feature_group_count=feature_group_count)


def _int8_conv_fwd_impl(lhs, rhs, kw):
    ql, sl = quantize_int8(lhs, axes=tuple(range(lhs.ndim)))  # per-tensor
    qr, sr = quantize_int8(rhs, axes=(0, 1, 2))               # per out-chan
    out = jax.lax.conv_general_dilated(
        ql, qr, preferred_element_type=jnp.int32, **kw)
    # NHWC output: broadcast the (1,1,1,Cout) weight scale over channels
    return (out.astype(jnp.float32) * sl * sr.reshape(1, 1, 1, -1)
            ).astype(lhs.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _int8_conv(lhs, rhs, kw_items):
    return _int8_conv_fwd_impl(lhs, rhs, dict(kw_items))


def _int8_conv_vjp_fwd(lhs, rhs, kw_items):
    return _int8_conv_fwd_impl(lhs, rhs, dict(kw_items)), (lhs, rhs)


def _int8_conv_vjp_bwd(kw_items, res, g):
    lhs, rhs = res
    kw = dict(kw_items)
    _, vjp = jax.vjp(
        lambda a, b: jax.lax.conv_general_dilated(a, b, **kw), lhs, rhs)
    return vjp(g)


_int8_conv.defvjp(_int8_conv_vjp_fwd, _int8_conv_vjp_bwd)


def _hashable(kw):
    def h(v):
        if hasattr(v, "_fields"):  # namedtuple (ConvDimensionNumbers)
            return v
        if isinstance(v, (list, tuple)):
            return tuple(h(x) for x in v)
        return v
    return tuple(sorted((k, h(v)) for k, v in kw.items()))


def int8_conv_general_dilated(lhs, rhs, window_strides, padding,
                              lhs_dilation=None, rhs_dilation=None,
                              dimension_numbers=None, feature_group_count=1,
                              precision=None, preferred_element_type=None):
    """Drop-in for lax.conv_general_dilated at flax nn.Conv's NHWC/HWIO
    call pattern; falls back to the exact op otherwise."""
    dn = jax.lax.conv_dimension_numbers(lhs.shape, rhs.shape,
                                        dimension_numbers)
    nhwc = (lhs.ndim == 4 and dn.lhs_spec == (0, 3, 1, 2)
            and dn.rhs_spec == (3, 2, 0, 1) and dn.out_spec == (0, 3, 1, 2))
    if nhwc and feature_group_count == 1:
        kw = _conv_kwargs(window_strides, padding, lhs_dilation,
                          rhs_dilation, dn, feature_group_count)
        return _int8_conv(lhs, rhs, _hashable(kw))
    return jax.lax.conv_general_dilated(
        lhs, rhs, window_strides, padding, lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count, precision=precision,
        preferred_element_type=preferred_element_type)
