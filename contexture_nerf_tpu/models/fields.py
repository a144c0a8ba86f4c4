"""2-D NeRF texture field: Fourier UV embedding + skip-MLP (flax).

Replaces the reference's torch Embedder/NeRF2D (src/run_nerf_helpers.py:15-135,
instantiated trainer.py:129-133: multires=10 -> 42-dim embedding, D=8, W=256,
skip at layer 4, 3 output channels, kaiming-normal fan_in init).

The texture atlas is synthesized by evaluating the MLP on a res^2 UV lattice
(reference textured_mesh.py:266-301) — a 1M-point batched matmul stack that XLA
tiles straight onto the MXU (bf16 params supported via the `dtype` argument).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def fourier_embed(x: jnp.ndarray, multires: int = 10,
                  include_input: bool = True) -> jnp.ndarray:
    """Positional encoding (reference run_nerf_helpers.py:15-65).

    x: (..., d). Returns (..., d * (include_input + 2*multires)).
    Frequencies 2**linspace(0, multires-1, multires) (log sampling); per
    frequency [sin, cos], concatenated in reference order:
    [x, sin(1x), cos(1x), sin(2x), cos(2x), ...]."""
    outs = [x] if include_input else []
    freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def embedder_out_dim(multires: int = 10, input_dims: int = 2,
                     include_input: bool = True) -> int:
    return input_dims * (int(include_input) + 2 * multires)


def _kaiming_normal_fan_in():
    # torch nn.init.kaiming_normal_(mode='fan_in', nonlinearity='relu')
    return jax.nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _torch_linear_bias_init(key, shape, dtype, fan_in):
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class NeRF2D(nn.Module):
    """8x256 ReLU MLP with input skip at layer 4 (run_nerf_helpers.py:68-135)."""

    D: int = 8
    W: int = 256
    input_ch: int = 42
    output_ch: int = 3
    skips: Sequence[int] = (4,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        inp = h
        for i in range(self.D):
            fan_in = h.shape[-1]
            h = nn.Dense(
                self.W,
                kernel_init=_kaiming_normal_fan_in(),
                bias_init=lambda k, s, d=self.dtype, f=fan_in:
                    _torch_linear_bias_init(k, s, d, f),
                dtype=self.dtype, name=f"pts_linear_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([inp, h], axis=-1)
        fan_in = h.shape[-1]
        out = nn.Dense(
            self.output_ch,
            kernel_init=_kaiming_normal_fan_in(),
            bias_init=lambda k, s, d=self.dtype, f=fan_in:
                _torch_linear_bias_init(k, s, d, f),
            dtype=self.dtype, name="output_linear")(h)
        return out


def uv_lattice(res: int) -> jnp.ndarray:
    """res^2 UV query lattice (reference textured_mesh.py:269-272):
    pixel (row i, col j) -> (u = j/(res-1), v = i/(res-1)). Returns (res*res, 2)."""
    lin = jnp.linspace(0.0, 1.0, res)
    uu, vv = jnp.meshgrid(lin, lin, indexing="xy")
    return jnp.stack([uu, vv], axis=-1).reshape(-1, 2)


def texture_from_mlp(mlp: NeRF2D, params, res: int, multires: int = 10,
                     use_fused: bool = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query the MLP on the UV lattice -> ((1,3,res,res) texture in [0,1],
    raw mlp_output (res*res, 3)). Reference textured_mesh.py:266-301:
    colors = (tanh(mlp) + 1) / 2.

    TPU path: the fused Pallas embed+MLP kernel (ops/mlp_kernel.py) keeps all
    per-point activations in VMEM — unfused, each of ~9 (res^2, 256) f32
    layer activations is a 1 GB HBM tensor at res=1024. Elsewhere: chunked
    lax.map with the same peak-memory benefit (compiler-scheduled)."""
    uv = uv_lattice(res)
    if use_fused is None:
        use_fused = (jax.default_backend() == "tpu"
                     and mlp.D == 8 and mlp.W == 256 and tuple(mlp.skips) == (4,))
    if use_fused:
        from contexture_nerf_tpu.ops.mlp_kernel import fused_nerf2d

        mlp_output = fused_nerf2d(params, uv, multires)
    else:
        chunk = 65536
        n = uv.shape[0]
        if n % chunk == 0 and n > chunk:
            uv_c = uv.reshape(n // chunk, chunk, 2)
            # checkpoint: backward recomputes per chunk, so residuals never
            # exceed one chunk's activations
            f = jax.checkpoint(
                lambda u: mlp.apply(params, fourier_embed(u, multires)))
            mlp_output = jax.lax.map(f, uv_c).reshape(n, -1)
        else:
            mlp_output = mlp.apply(params, fourier_embed(uv, multires))
    colors = (jnp.tanh(mlp_output) + 1.0) / 2.0
    tex = colors.reshape(1, res, res, 3).transpose(0, 3, 1, 2)
    return tex, mlp_output
