"""Tiled Pallas TPU kernel for triangle visibility rasterization.

Replaces the DIB-R CUDA rasterizer (kaolin kal.render.mesh.rasterize; reference
src/models/render.py:85-92,115-120) with a TPU-native design:

  * grid = (batch, H/8, W/128): each program owns an 8x128 pixel tile (one f32
    register tile) and sweeps all faces in chunks of 128 (the lane width).
  * layout: pixels on sublanes, faces on lanes — the three edge functions are
    rank-2 broadcasts (1024 px, 128 faces) on the VPU; the running z-buffer
    winner (z / face idx / barycentrics) is carried in registers.
  * tile-level culling: per-face NDC bboxes are precomputed in XLA; a chunk is
    skipped via lax.cond unless some face bbox intersects the tile, so the
    inner loop cost scales with faces-near-tile, not total faces.
  * face setup coefficients live fully in VMEM (~1 MB at 16k faces).

The visibility pass is not differentiated (texture gradients flow through
attribute sampling at fixed UVs, see rasterize.py docstring), so this kernel is
forward-only by construction. Same pixel/NDC conventions as rasterize.py
(golden-validated against shapes/spot_depth_side.pt).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contexture_nerf_tpu.raster.rasterize import face_edge_setup

_FACE_CHUNK = 128  # lane width
_TILE_H = 8
_TILE_W = 128
_PX = _TILE_H * _TILE_W
_NEG_INF = -3.0e38
_BIG_I32 = 2**30


def _raster_kernel(dims_ref, ca_ref, cb_ref, cc_ref, inv_den_ref, zz_ref,
                   valid_ref, bbox_ref, idx_ref, bary_ref,
                   zbuf, ibuf, bbuf):
    """One program: an 8x128 pixel tile vs all faces (chunk-culled).

    dims_ref (SMEM): [H, W].
    ca/cb/cc/zz: (1, 3, Fp); inv_den/valid: (1, 1, Fp);
    bbox: (1, 4, Fp) = [xmin, xmax, ymin, ymax] per face (NDC).
    Outputs: idx (1, 8, 128) int32, bary (1, 3, 8, 128) f32.
    Scratch: zbuf (PX,1) f32, ibuf (PX,1) i32, bbuf (PX,3) f32 — the z-buffer
    carry lives in VMEM so chunk evaluation can sit under @pl.when (a real
    branch in Mosaic, unlike lax.cond which predicates both sides).
    """
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    height = dims_ref[0]
    width = dims_ref[1]
    hf = height.astype(jnp.float32)
    wf = width.astype(jnp.float32)

    r0 = ty * _TILE_H
    c0 = tx * _TILE_W

    # pixel NDC coords, flattened tile (PX, 1); row-major within the tile
    p_lin = jax.lax.broadcasted_iota(jnp.int32, (_PX, 1), 0)
    row = p_lin // _TILE_W
    col = p_lin - row * _TILE_W
    px = ((c0 + col).astype(jnp.float32) + 0.5) / wf * 2.0 - 1.0
    py = 1.0 - ((r0 + row).astype(jnp.float32) + 0.5) / hf * 2.0

    # tile NDC bounds (y decreases with row index)
    tile_x0 = (c0.astype(jnp.float32) + 0.5) / wf * 2.0 - 1.0
    tile_x1 = (c0.astype(jnp.float32) + _TILE_W - 0.5) / wf * 2.0 - 1.0
    tile_y1 = 1.0 - (r0.astype(jnp.float32) + 0.5) / hf * 2.0
    tile_y0 = 1.0 - (r0.astype(jnp.float32) + _TILE_H - 0.5) / hf * 2.0

    num_chunks = ca_ref.shape[2] // _FACE_CHUNK
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (_PX, _FACE_CHUNK), 1)

    zbuf[...] = jnp.full((_PX, 1), _NEG_INF, jnp.float32)
    ibuf[...] = jnp.full((_PX, 1), -1, jnp.int32)
    bbuf[...] = jnp.zeros((_PX, 3), jnp.float32)

    def body(c, _):
        sl = pl.ds(c * _FACE_CHUNK, _FACE_CHUNK)
        vld = valid_ref[0, :, sl] > 0.5  # (1, C)
        bb = bbox_ref[0, :, sl]  # (4, C)
        overlap = ((bb[0:1] <= tile_x1) & (bb[1:2] >= tile_x0)
                   & (bb[2:3] <= tile_y1) & (bb[3:4] >= tile_y0) & vld)

        @pl.when(jnp.any(overlap))
        def eval_chunk():
            ca = ca_ref[0, :, sl]  # (3, C)
            cb = cb_ref[0, :, sl]
            cc = cc_ref[0, :, sl]
            inv_den = inv_den_ref[0, :, sl]  # (1, C)
            zz = zz_ref[0, :, sl]  # (3, C)

            w0 = (px * ca[0:1] + py * cb[0:1] + cc[0:1]) * inv_den
            w1 = (px * ca[1:2] + py * cb[1:2] + cc[1:2]) * inv_den
            w2 = (px * ca[2:3] + py * cb[2:3] + cc[2:3]) * inv_den
            inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & vld
            z = w0 * zz[0:1] + w1 * zz[1:2] + w2 * zz[2:3]
            z = jnp.where(inside, z, _NEG_INF)

            # first-occurrence argmax over lanes (matches jnp.argmax)
            cand_z = jnp.max(z, axis=1, keepdims=True)  # (PX, 1)
            at_max = (z == cand_z) & inside
            arg = jnp.min(jnp.where(at_max, lane_ids, _BIG_I32), axis=1,
                          keepdims=True)
            onehot = lane_ids == arg
            cand_b0 = jnp.sum(jnp.where(onehot, w0, 0.0), axis=1, keepdims=True)
            cand_b1 = jnp.sum(jnp.where(onehot, w1, 0.0), axis=1, keepdims=True)
            cand_b2 = jnp.sum(jnp.where(onehot, w2, 0.0), axis=1, keepdims=True)
            cand_idx = c * _FACE_CHUNK + arg

            best_z = zbuf[...]
            better = cand_z > best_z
            zbuf[...] = jnp.where(better, cand_z, best_z)
            ibuf[...] = jnp.where(better, cand_idx, ibuf[...])
            bbuf[...] = jnp.where(
                better, jnp.concatenate([cand_b0, cand_b1, cand_b2], axis=1),
                bbuf[...])

        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)

    hit = zbuf[...] > _NEG_INF
    idx_ref[0] = jnp.where(hit, ibuf[...], -1).reshape(_TILE_H, _TILE_W)
    b = bbuf[...]
    bary_ref[0, 0] = b[:, 0:1].reshape(_TILE_H, _TILE_W)
    bary_ref[0, 1] = b[:, 1:2].reshape(_TILE_H, _TILE_W)
    bary_ref[0, 2] = b[:, 2:3].reshape(_TILE_H, _TILE_W)


@partial(jax.jit, static_argnames=("height", "width", "interpret"))
def rasterize_geometry_pallas(face_vertices_z: jnp.ndarray,
                              face_vertices_image: jnp.ndarray,
                              height: int, width: int,
                              interpret: bool = False):
    """Pallas visibility pass. Same contract as rasterize.rasterize_geometry:
    returns (face_idx (B,H,W) int32 with -1 background, bary (B,H,W,3))."""
    B, F = face_vertices_z.shape[:2]

    # Morton-sort faces by projected bbox center so each 128-face chunk is
    # spatially coherent and the per-chunk tile culling actually skips chunks
    # on occupied tiles (not just background). face_idx is un-permuted at the
    # end; z-ties may resolve to a different (coincident) face than the XLA
    # reference path — cosmetically identical.
    fx = face_vertices_image[..., 0]
    fy = face_vertices_image[..., 1]
    cx = (fx.min(-1) + fx.max(-1)) * 0.5
    cy = (fy.min(-1) + fy.max(-1)) * 0.5
    qx = jnp.clip(((cx + 1.0) * 0.5 * 1023).astype(jnp.int32), 0, 1023)
    qy = jnp.clip(((cy + 1.0) * 0.5 * 1023).astype(jnp.int32), 0, 1023)

    def _interleave(v):
        v = v.astype(jnp.int64)
        out = jnp.zeros_like(v)
        for bit in range(10):
            out = out | (((v >> bit) & 1) << (2 * bit))
        return out

    morton = _interleave(qx) | (_interleave(qy) << 1)
    perm = jnp.argsort(morton, axis=1)  # (B, F)

    def permute(x):  # (B, F, ...) by per-batch perm
        return jnp.take_along_axis(
            x, perm.reshape(perm.shape + (1,) * (x.ndim - 2)), axis=1)

    face_vertices_z = permute(face_vertices_z)
    face_vertices_image = permute(face_vertices_image)

    coef_a, coef_b, coef_c, den = face_edge_setup(face_vertices_image)
    valid = (jnp.abs(den) > 1e-12).astype(jnp.float32)
    inv_den = jnp.where(valid > 0, 1.0 / jnp.where(den == 0, 1.0, den), 0.0)

    # per-face NDC bbox for tile culling: (B, 4, F)
    fx = face_vertices_image[..., 0]
    fy = face_vertices_image[..., 1]
    bbox = jnp.stack([fx.min(-1), fx.max(-1), fy.min(-1), fy.max(-1)], axis=1)

    fpad = (-F) % _FACE_CHUNK
    Fp = F + fpad

    def prep(x):  # (B, F, k) -> (B, k, Fp)
        x = jnp.pad(x, ((0, 0), (0, fpad), (0, 0)))
        return jnp.transpose(x, (0, 2, 1))

    ca_t, cb_t, cc_t = prep(coef_a), prep(coef_b), prep(coef_c)
    zz_t = prep(face_vertices_z)
    invden_t = prep(inv_den[..., None])
    valid_t = prep(valid[..., None])
    bbox_t = jnp.pad(bbox, ((0, 0), (0, 0), (0, fpad)))

    tiles_y = pl.cdiv(height, _TILE_H)
    tiles_x = pl.cdiv(width, _TILE_W)
    Hp, Wp = tiles_y * _TILE_H, tiles_x * _TILE_W

    dims = jnp.asarray([height, width], jnp.int32)

    def face_spec(nrow):
        return pl.BlockSpec((1, nrow, Fp), lambda b, ty, tx: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    idx_out, bary_out = pl.pallas_call(
        _raster_kernel,
        grid=(B, tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dims
            face_spec(3), face_spec(3), face_spec(3),
            face_spec(1), face_spec(3), face_spec(1), face_spec(4),
        ],
        out_specs=[
            pl.BlockSpec((1, _TILE_H, _TILE_W),
                         lambda b, ty, tx: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, _TILE_H, _TILE_W),
                         lambda b, ty, tx: (b, 0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hp, Wp), jnp.int32),
            jax.ShapeDtypeStruct((B, 3, Hp, Wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_PX, 1), jnp.float32),
            pltpu.VMEM((_PX, 1), jnp.int32),
            pltpu.VMEM((_PX, 3), jnp.float32),
        ],
        interpret=interpret,
    )(dims, ca_t, cb_t, cc_t, invden_t, zz_t, valid_t, bbox_t)

    face_idx_sorted = idx_out[:, :height, :width]
    bary = jnp.transpose(bary_out[:, :, :height, :width], (0, 2, 3, 1))
    # un-permute: sorted chunk index -> original face index
    hit = face_idx_sorted >= 0
    flat = jnp.take_along_axis(
        perm, jnp.maximum(face_idx_sorted, 0).reshape(B, -1), axis=1
    ).reshape(face_idx_sorted.shape)
    face_idx = jnp.where(hit, flat.astype(jnp.int32), -1)
    return face_idx, bary
