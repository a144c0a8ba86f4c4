"""Fused embed+MLP Pallas kernel vs the flax NeRF2D reference (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np

from contexture_nerf_tpu.models.fields import (NeRF2D, embedder_out_dim,
                                               fourier_embed)
from contexture_nerf_tpu.ops.mlp_kernel import fused_nerf2d


def test_fused_forward_and_grad_match_reference():
    mlp = NeRF2D(input_ch=embedder_out_dim(10))
    params = jax.jit(mlp.init)(jax.random.PRNGKey(0), jnp.zeros((1, 42)))
    uv = jax.random.uniform(jax.random.PRNGKey(1), (512, 2))

    ref = mlp.apply(params, fourier_embed(uv, 10))
    out = fused_nerf2d(params, uv, 10, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_ref(p):
        return jnp.sum(jnp.tanh(mlp.apply(p, fourier_embed(uv, 10))) ** 2)

    def loss_fused(p):
        return jnp.sum(jnp.tanh(fused_nerf2d(p, uv, 10, True)) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_f = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_f)):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4 * scale + 1e-5)


def test_fused_handles_nonmultiple_block():
    mlp = NeRF2D(input_ch=embedder_out_dim(10))
    params = jax.jit(mlp.init)(jax.random.PRNGKey(0), jnp.zeros((1, 42)))
    uv = jax.random.uniform(jax.random.PRNGKey(2), (300, 2))  # pads to 512
    ref = mlp.apply(params, fourier_embed(uv, 10))
    out = fused_nerf2d(params, uv, 10, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_bf16_compute_close_to_f32():
    """bf16 compute_dtype (the SDS hot-path mode) stays within bf16 rounding
    of the f32 reference, forward and backward."""
    mlp = NeRF2D(input_ch=embedder_out_dim(10))
    params = jax.jit(mlp.init)(jax.random.PRNGKey(0), jnp.zeros((1, 42)))
    uv = jax.random.uniform(jax.random.PRNGKey(1), (512, 2))

    ref = mlp.apply(params, fourier_embed(uv, 10))
    out = fused_nerf2d(params, uv, 10, True, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.05, rtol=0.05)

    def loss_ref(p):
        return jnp.sum(jnp.tanh(mlp.apply(p, fourier_embed(uv, 10))) ** 2)

    def loss_bf16(p):
        return jnp.sum(jnp.tanh(fused_nerf2d(p, uv, 10, True,
                                             jnp.bfloat16)) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_b = jax.grad(loss_bf16)(params)
    # gradients correlate strongly (cosine > 0.99) even at bf16 precision
    va = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree.leaves(g_ref)])
    vb = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree.leaves(g_b)])
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))
    assert cos > 0.99, cos


def test_fused_emb_variant_matches_uv_variant():
    """fused_nerf2d_emb on a precomputed padded embedding equals fused_nerf2d
    on raw UVs, forward and backward (the SDS hot path uses the emb form)."""
    from contexture_nerf_tpu.ops.mlp_kernel import (fused_nerf2d_emb,
                                                    pad_embedding)

    mlp = NeRF2D(input_ch=embedder_out_dim(10))
    params = jax.jit(mlp.init)(jax.random.PRNGKey(0), jnp.zeros((1, 42)))
    uv = jax.random.uniform(jax.random.PRNGKey(1), (300, 2))
    emb = pad_embedding(uv, 10)
    assert emb.shape == (300, 128)
    np.testing.assert_allclose(np.asarray(emb[:, :42]),
                               np.asarray(fourier_embed(uv, 10)), atol=1e-6)

    ref = fused_nerf2d(params, uv, 10, True)
    out = fused_nerf2d_emb(params, emb, 10, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g_ref = jax.grad(lambda p: jnp.sum(
        jnp.tanh(fused_nerf2d(p, uv, 10, True)) ** 2))(params)
    g_emb = jax.grad(lambda p: jnp.sum(
        jnp.tanh(fused_nerf2d_emb(p, emb, 10, True)) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_emb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_bf16_embedding_storage_bit_identical_under_bf16_compute():
    """pad_embedding(dtype=bf16) + bf16 compute is BIT-identical to f32
    storage + bf16 compute (the kernel casts the embedding to compute_dtype
    at every MXU use, so pre-rounding to bf16 loses nothing) — this is the
    lossless half-HBM mode the trainer uses for optim.precompute_uv_embedding
    with the full-size bf16 stacks."""
    from contexture_nerf_tpu.ops.mlp_kernel import (fused_nerf2d_emb,
                                                    pad_embedding)

    mlp = NeRF2D(input_ch=embedder_out_dim(10))
    params = jax.jit(mlp.init)(jax.random.PRNGKey(0), jnp.zeros((1, 42)))
    uv = jax.random.uniform(jax.random.PRNGKey(3), (300, 2))
    emb32 = pad_embedding(uv, 10)
    emb16 = pad_embedding(uv, 10, dtype=jnp.bfloat16)
    assert emb16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(emb32.astype(jnp.bfloat16), dtype=np.float32),
        np.asarray(emb16, dtype=np.float32))

    out32 = fused_nerf2d_emb(params, emb32, 10, True, jnp.bfloat16)
    out16 = fused_nerf2d_emb(params, emb16, 10, True, jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out32), np.asarray(out16))

    g32 = jax.grad(lambda p: jnp.sum(jnp.tanh(
        fused_nerf2d_emb(p, emb32, 10, True, jnp.bfloat16)) ** 2))(params)
    g16 = jax.grad(lambda p: jnp.sum(jnp.tanh(
        fused_nerf2d_emb(p, emb16, 10, True, jnp.bfloat16)) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
