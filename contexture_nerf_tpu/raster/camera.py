"""Camera math: perspective projection + look-at transforms, pure jnp.

Replaces kaolin's kal.render.camera.generate_perspective_projection /
generate_transformation_matrix and kal.render.mesh.prepare_vertices
(reference call sites: src/models/render.py:11,21-46,81-82,112-113).

Conventions (kaolin-legacy, validated against the reference's golden depth
tensors shapes/spot_depth_{front,side}.pt):
  - camera space: right-handed, camera looks down -z, y up.
  - projection vector p = [1/(ratio*tan(fovy/2)), 1/tan(fovy/2), -1];
    image coords = (v * p)[:2] / (v * p)[2]  ->  NDC in [-1, 1], y up.
  - camera_transform is a (B, 4, 3) matrix; verts_camera = [verts, 1] @ M.
"""

from __future__ import annotations

import jax.numpy as jnp


def perspective_projection(fovy: float, ratio: float = 1.0) -> jnp.ndarray:
    """fovy (radians) -> projection vector [fx, fy, -1].

    kaolin: kal.render.camera.generate_perspective_projection
    (reference render.py:11)."""
    tanfov = jnp.tan(jnp.asarray(fovy, jnp.float32) / 2.0)
    return jnp.stack([1.0 / (ratio * tanfov), 1.0 / tanfov, -jnp.ones_like(tanfov)])


def camera_transform_from_lookat(pos: jnp.ndarray, look_at: jnp.ndarray,
                                 up: jnp.ndarray) -> jnp.ndarray:
    """(B,3) pos/look_at/up -> (B,4,3) world->camera transform.

    kaolin: kal.render.camera.generate_transformation_matrix
    (reference render.py:31,45)."""
    z_axis = pos - look_at
    z_axis = z_axis / jnp.linalg.norm(z_axis, axis=-1, keepdims=True)
    x_axis = jnp.cross(up, z_axis)
    x_axis = x_axis / jnp.linalg.norm(x_axis, axis=-1, keepdims=True)
    y_axis = jnp.cross(z_axis, x_axis)
    # rows of rot are the world-frame axes as columns: v_cam = v_world @ rot
    rot = jnp.stack([x_axis, y_axis, z_axis], axis=-1)  # (B, 3, 3)
    trans = -jnp.einsum("bi,bij->bj", pos, rot)[:, None, :]  # (B, 1, 3)
    return jnp.concatenate([rot, trans], axis=1)  # (B, 4, 3)


def get_camera_from_view(elev: jnp.ndarray, azim: jnp.ndarray, r: jnp.ndarray,
                         look_at_height: float = 0.0) -> jnp.ndarray:
    """Spherical (elev=polar theta, azim=phi, radius) -> (B,4,3) camera transform.

    Mirrors Renderer.get_camera_from_view / get_camera_from_multiple_view
    (reference render.py:21-46): pos = r*(sin(e)sin(a), cos(e), sin(e)cos(a)),
    look_at = (0, look_at_height, 0), up = +y.
    """
    elev = jnp.atleast_1d(jnp.asarray(elev, jnp.float32))
    azim = jnp.atleast_1d(jnp.asarray(azim, jnp.float32))
    r = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(r, jnp.float32)), elev.shape)
    x = r * jnp.sin(elev) * jnp.sin(azim)
    y = r * jnp.cos(elev)
    z = r * jnp.sin(elev) * jnp.cos(azim)
    pos = jnp.stack([x, y, z], axis=-1)
    look_at = jnp.zeros_like(pos).at[:, 1].set(look_at_height)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), pos.shape)
    return camera_transform_from_lookat(pos, look_at, up)


def perspective_camera(points: jnp.ndarray, camera_proj: jnp.ndarray) -> jnp.ndarray:
    """Project camera-space points (B,N,3) to NDC (B,N,2).

    kaolin: kal.render.camera.perspective_camera."""
    projected = points * camera_proj.reshape(1, 1, 3)
    return projected[..., :2] / projected[..., 2:3]


def rotate_translate_points(points: jnp.ndarray, camera_transform: jnp.ndarray) -> jnp.ndarray:
    """(B|1,N,3) world points x (B,4,3) -> (B,N,3) camera-space points."""
    if points.ndim == 2:
        points = points[None]
    ones = jnp.ones((*points.shape[:-1], 1), points.dtype)
    padded = jnp.concatenate([points, ones], axis=-1)  # (B, N, 4)
    return jnp.einsum("bnk,bkj->bnj", padded, camera_transform)


def face_normals_from_verts(face_vertices: jnp.ndarray, unit: bool = True) -> jnp.ndarray:
    """(B,F,3,3) face vertices -> (B,F,3) face normals (camera space).

    kaolin: kal.ops.mesh.face_normals, called inside prepare_vertices."""
    v0, v1, v2 = face_vertices[:, :, 0], face_vertices[:, :, 1], face_vertices[:, :, 2]
    n = jnp.cross(v1 - v0, v2 - v0)
    if unit:
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n


def prepare_vertices(vertices: jnp.ndarray, faces: jnp.ndarray,
                     camera_proj: jnp.ndarray, camera_transform: jnp.ndarray):
    """world verts -> (face_vertices_camera, face_vertices_image, face_normals).

    kaolin: kal.render.mesh.prepare_vertices (reference render.py:81-82,112-113).
    vertices: (N,3) or (B,N,3); faces: (F,3); camera_transform: (B,4,3).
    Returns (B,F,3,3), (B,F,3,2), (B,F,3).
    """
    vertices_camera = rotate_translate_points(vertices, camera_transform)
    vertices_image = perspective_camera(vertices_camera, camera_proj)
    face_vertices_camera = vertices_camera[:, faces]  # (B, F, 3, 3)
    face_vertices_image = vertices_image[:, faces]  # (B, F, 3, 2)
    normals = face_normals_from_verts(face_vertices_camera, unit=True)
    return face_vertices_camera, face_vertices_image, normals
