"""Textured mesh model: mesh + renderer + NeRF2D texture field.

Replaces the reference TexturedMeshModel (src/models/textured_mesh.py:97-580)
with a functional design: geometry is static (host-loaded once), MLP params are
an explicit pytree, and `render` is pure given (params, cache) so the SDS loop
can jit it end to end.

UV source priority mirrors the reference init_texture_map
(textured_mesh.py:371-409): mesh UVs -> cache -> unwrap. The unwrap fallback is
a host-side per-face atlas packer (xatlas equivalent role; xatlas itself is a
one-shot CPU preprocessing step in the reference too, cached to disk).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from contexture_nerf_tpu.models.fields import (NeRF2D, embedder_out_dim,
                                               fourier_embed, texture_from_mlp)
from contexture_nerf_tpu.models.mesh import Mesh
from contexture_nerf_tpu.raster.render import RenderCache, Renderer


def _face_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    e1 = vertices[faces[:, 1]] - vertices[faces[:, 0]]
    e2 = vertices[faces[:, 2]] - vertices[faces[:, 0]]
    n = np.cross(e1, e2)
    return n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)


def _grow_charts(vertices: np.ndarray, faces: np.ndarray,
                 angle_thr_deg: float) -> np.ndarray:
    """BFS chart growing over the face-adjacency graph: a neighbor joins a
    chart while its normal stays within angle_thr of the chart's seed normal
    (bounds total curvature so the planar projection stays injective).
    Returns chart id per face."""
    from collections import deque

    F = faces.shape[0]
    normals = _face_normals(vertices, faces)
    edge_to_faces: Dict[Tuple[int, int], list] = {}
    for f in range(F):
        a, b, c = faces[f]
        for e in ((a, b), (b, c), (c, a)):
            edge_to_faces.setdefault(tuple(sorted(e)), []).append(f)
    neighbors = [[] for _ in range(F)]
    for fs in edge_to_faces.values():
        for i in fs:
            for j in fs:
                if i != j:
                    neighbors[i].append(j)

    cos_thr = np.cos(np.deg2rad(angle_thr_deg))
    chart = np.full(F, -1, np.int64)
    n_charts = 0
    for seed in range(F):
        if chart[seed] >= 0:
            continue
        cid = n_charts
        n_charts += 1
        chart[seed] = cid
        seed_n = normals[seed]
        q = deque([seed])
        while q:
            f = q.popleft()
            for g in neighbors[f]:
                if chart[g] < 0 and float(normals[g] @ seed_n) >= cos_thr:
                    chart[g] = cid
                    q.append(g)
    return chart


def _per_face_unwrap(faces: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Guaranteed-capacity fallback packer: every triangle gets its own
    right-triangle cell in a sqrt(F) grid (loses UV continuity; only used
    when shelf packing cannot fit the chart count)."""
    F = faces.shape[0]
    cols = int(np.ceil(np.sqrt(F)))
    rows = int(np.ceil(F / cols))
    cw, ch = 1.0 / cols, 1.0 / rows
    gut = 0.1
    vt = np.zeros((3 * F, 2), np.float32)
    ft = np.arange(3 * F, dtype=np.int64).reshape(F, 3)
    idx = np.arange(F)
    cx = (idx % cols) * cw
    cy = (idx // cols) * ch
    vt[0::3] = np.stack([cx + gut * cw, cy + gut * ch], -1)
    vt[1::3] = np.stack([cx + (1 - gut) * cw, cy + gut * ch], -1)
    vt[2::3] = np.stack([cx + gut * cw, cy + (1 - gut) * ch], -1)
    return vt, ft


def _coverage_count(uv: np.ndarray, ft: np.ndarray, G: int = 128
                    ) -> np.ndarray:
    """Rasterized coverage count of triangles `ft` over `uv`, on a G^2 grid
    spanning the bbox of the vertices `ft` actually uses (NOT the whole
    atlas — a small chart rasterized against the global bbox would span a
    handful of texels and real self-overlaps would go undetected). Texel
    centers strictly inside a triangle count; shared edges therefore do not
    double-count."""
    used = uv[np.unique(ft)]
    lo = used.min(axis=0)
    span = np.maximum(used.max(axis=0) - lo, 1e-12)
    uvn = (uv - lo) / span * G
    cover = np.zeros((G, G), np.int32)
    for tri in ft:
        p = uvn[tri]  # (3,2)
        x0, y0 = np.floor(p.min(axis=0)).astype(int)
        x1, y1 = np.ceil(p.max(axis=0)).astype(int)
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, G), min(y1, G)
        if x1 <= x0 or y1 <= y0:
            continue
        xs = np.arange(x0, x1) + 0.5
        ys = np.arange(y0, y1) + 0.5
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        d = np.stack([gx - p[0, 0], gy - p[0, 1]], axis=-1)
        e1 = p[1] - p[0]
        e2 = p[2] - p[0]
        det = e1[0] * e2[1] - e1[1] * e2[0]
        if abs(det) < 1e-12:
            continue
        a = (d[..., 0] * e2[1] - d[..., 1] * e2[0]) / det
        b = (e1[0] * d[..., 1] - e1[1] * d[..., 0]) / det
        eps = 1e-6
        inside = (a > eps) & (b > eps) & (a + b < 1 - eps)
        cover[y0:y1, x0:x1] += inside.astype(np.int32)
    return cover


def _overlap_frac(uv: np.ndarray, ft: np.ndarray, G: int = 128) -> float:
    cover = _coverage_count(uv, ft, G)
    covered = int((cover > 0).sum())
    return float((cover > 1).sum()) / max(covered, 1)


def _charts_from_ft(ft: np.ndarray) -> np.ndarray:
    """Chart label per face, via union-find over shared vt indices (welded
    charts share uv vertices; distinct charts never do)."""
    n = int(ft.max()) + 1
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for tri in ft:
        r = find(tri[0])
        for b in tri[1:]:
            rb = find(b)
            if rb != r:
                parent[rb] = r
    roots = np.array([find(v) for v in ft[:, 0]])
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def _chart_overlaps(vt: np.ndarray, ft: np.ndarray,
                    thr: float = 0.05) -> bool:
    """True if any welded multi-face chart self-overlaps in UV space (the
    failure mode a seed-normal cone cannot rule out: ramps/spirals whose
    normals stay inside the cone but whose planar projections collide)."""
    labels = _charts_from_ft(ft)
    for cid in range(labels.max() + 1):
        fids = np.nonzero(labels == cid)[0]
        if len(fids) < 2:
            continue
        if _overlap_frac(vt, ft[fids]) > thr:
            return True
    return False


def atlas_unwrap(vertices: np.ndarray, faces: np.ndarray,
                 angle_thr_deg: float = 75.0,
                 gutter: float = 4.0 / 1024.0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Connected-chart UV unwrap (the xatlas role in the reference,
    textured_mesh.py:390-404; host-side one-shot, disk-cached like the
    reference's vt.pth/ft.pth).

    Charts are BFS-grown over face adjacency with a normal-angle threshold,
    each chart is parameterized by orthographic projection onto its seed
    tangent plane (vertices welded per chart, so adjacent faces in a chart
    share UV edges — preserving the UV-neighborhood continuity the texture
    MLP's smoothness prior depends on), and chart boxes are shelf-packed at
    uniform texel density into the unit square. Returns (vt [n,2], ft [F,3]).

    A C++ implementation of the same algorithm is preferred when available
    (native/objio.cpp::objio_chart_unwrap, ~17x faster — one-shot but on the
    experiment-startup path); numpy fallback otherwise."""
    from contexture_nerf_tpu.native.objio import chart_unwrap_native

    native = chart_unwrap_native(vertices, faces, angle_thr_deg, gutter)
    if native is not None and not _chart_overlaps(*native):
        return native
    # native result with a self-overlapping chart (seed-normal cones admit
    # ramps/spirals that collide in the seed plane and would silently map
    # distinct surface regions to the same texels) falls through to the
    # numpy path, which demotes offending charts to per-face singletons.

    F = faces.shape[0]
    chart = _grow_charts(vertices, faces, angle_thr_deg)
    n_charts = int(chart.max()) + 1
    normals = _face_normals(vertices, faces)

    def project_chart(fids, seed_n):
        """(welded uvs (k,2), ft_local (m,3)) by orthographic projection
        onto the plane with normal seed_n."""
        up = np.array([0.0, 1.0, 0.0])
        if abs(float(seed_n @ up)) > 0.9:
            up = np.array([1.0, 0.0, 0.0])
        u = np.cross(up, seed_n)
        u /= max(np.linalg.norm(u), 1e-12)
        v = np.cross(seed_n, u)
        verts_used = np.unique(faces[fids].reshape(-1))
        local = {int(g): i for i, g in enumerate(verts_used)}
        p = vertices[verts_used]
        uv = np.stack([p @ u, p @ v], axis=-1)
        uv -= uv.min(axis=0)
        ft_local = np.vectorize(local.get)(faces[fids])
        return uv.astype(np.float64), ft_local

    charts = []  # per chart: (face ids, welded uvs (k,2), ft_local (m,3))
    for cid in range(n_charts):
        fids = np.nonzero(chart == cid)[0]
        uv, ft_local = project_chart(fids, normals[fids[0]])
        if len(fids) > 1 and _overlap_frac(uv, ft_local) > 0.05:
            # self-overlapping projection: demote to per-face singleton
            # charts, each on its own face plane (always injective)
            for f in fids:
                fi = np.asarray([f])
                charts.append((fi, *project_chart(fi, normals[f])))
        else:
            charts.append((fids, uv, ft_local))
    n_charts = len(charts)

    # shelf packing at uniform density: binary-search the global scale
    sizes = np.array([c[1].max(axis=0) if len(c[1]) else (0, 0)
                      for c in charts])  # (n_charts, 2) chart w/h
    # tallest first; stable so equal heights keep chart order (matches the
    # C++ std::stable_sort in objio_chart_unwrap)
    order = np.argsort(-sizes[:, 1], kind="stable")

    def pack(scale):
        """Place chart bboxes in shelves; returns None if overflow, else
        offsets (n_charts, 2)."""
        offsets = np.zeros((n_charts, 2))
        x = y = shelf_h = 0.0
        for ci in order:
            w, h = sizes[ci] * scale
            if w > 1.0 - 2 * gutter or h > 1.0 - 2 * gutter:
                return None
            if x + w + 2 * gutter > 1.0:
                y += shelf_h
                x = shelf_h = 0.0
            if y + h + 2 * gutter > 1.0:
                return None
            offsets[ci] = (x + gutter, y + gutter)
            x += w + 2 * gutter
            shelf_h = max(shelf_h, h + 2 * gutter)
        return offsets

    total_area = float(np.prod(sizes + 1e-9, axis=1).sum())
    scale = np.sqrt(0.5 / max(total_area, 1e-12))
    offsets = None
    for _ in range(40):
        offsets = pack(scale)
        if offsets is not None:
            break
        scale *= 0.85
    if offsets is None:
        # the fixed gutter caps shelf capacity at ~(1/2g)^2 charts; meshes
        # that weld nothing (triangle-soup exports -> one chart per face)
        # can exceed it. Fall back to the guaranteed per-face grid packer.
        return _per_face_unwrap(faces)

    vt_parts, ft = [], np.zeros((F, 3), np.int64)
    base = 0
    for ci, (fids, uv, ft_local) in enumerate(charts):
        vt_parts.append(uv * scale + offsets[ci])
        ft[fids] = ft_local + base
        base += uv.shape[0]
    vt = np.concatenate(vt_parts, axis=0).astype(np.float32)
    return np.clip(vt, 0.0, 1.0), ft


class TexturedMeshModel:
    """Owns mesh geometry + renderer + the texture MLP definition.

    Parameters (the MLP weights) are external pytrees: `init_params(key)`
    creates them, every render takes them explicitly."""

    def __init__(self, opt, render_grid_size: int = 1024,
                 texture_resolution: int = 1024,
                 cache_path: Optional[Path] = None,
                 multires: int = 10,
                 fovyangle: float = np.pi / 3,
                 env_sphere_path: str = "shapes/env_sphere.obj",
                 backend: Optional[str] = None,
                 param_dtype: jnp.dtype = jnp.float32):
        self.opt = opt
        self.dy = opt.dy
        self.mesh_scale = opt.shape_scale
        self.texture_resolution = texture_resolution
        self.cache_path = Path(cache_path) if cache_path is not None else None
        self.multires = multires
        self.default_color = [0.8, 0.1, 0.8]  # magenta (textured_mesh.py:131)
        self.dim = (render_grid_size, render_grid_size)

        self.renderer = Renderer(
            dim=self.dim,
            interpolation_mode=opt.texture_interpolation_mode,
            fovyangle=fovyangle, backend=backend)

        mesh = Mesh.load(opt.shape_path)
        mesh.normalize_mesh(inplace=True, target_scale=self.mesh_scale,
                            dy=self.dy)
        self.mesh = mesh
        self.env_sphere = (Mesh.load(env_sphere_path)
                           if os.path.exists(env_sphere_path) else None)

        vt, ft = self._init_texture_map()
        self.vt, self.ft = vt, ft
        # (1, F, 3, 2) face UV attributes (textured_mesh.py:149-151)
        self.face_attributes = jnp.asarray(vt[ft], jnp.float32)[None]
        self.verts = jnp.asarray(mesh.vertices, jnp.float32)
        self.faces = jnp.asarray(mesh.faces, jnp.int32)

        self.texture_mlp = NeRF2D(
            D=8, W=256, input_ch=embedder_out_dim(multires), output_ch=3,
            dtype=param_dtype)

    # -- setup ----------------------------------------------------------------

    def _init_texture_map(self) -> Tuple[np.ndarray, np.ndarray]:
        """UV source priority: mesh UVs -> disk cache -> unwrap (reference
        init_texture_map, textured_mesh.py:371-409). Cache filenames carry a
        geometry hash so a re-generated mesh under the same name never reuses
        a stale unwrap."""
        import hashlib

        cache = self.cache_path
        vt_cache = ft_cache = None
        if cache is not None:
            h = hashlib.sha1()
            h.update(np.ascontiguousarray(self.mesh.vertices).tobytes())
            h.update(np.ascontiguousarray(self.mesh.faces).tobytes())
            tag = h.hexdigest()[:10]
            vt_cache = cache / f"vt_{tag}.npy"
            ft_cache = cache / f"ft_{tag}.npy"
        if (self.mesh.vt is not None and self.mesh.ft is not None
                and self.mesh.vt.shape[0] > 0 and self.mesh.ft.min() > -1):
            return (self.mesh.vt.astype(np.float32),
                    self.mesh.ft.astype(np.int64))
        if vt_cache is not None and vt_cache.exists() and ft_cache.exists():
            return np.load(vt_cache), np.load(ft_cache)
        vt, ft = atlas_unwrap(self.mesh.vertices, self.mesh.faces)
        if cache is not None:
            cache.mkdir(parents=True, exist_ok=True)
            np.save(vt_cache, vt)
            np.save(ft_cache, ft)
        return vt, ft

    def init_params(self, key: jax.Array):
        dummy = jnp.zeros((1, embedder_out_dim(self.multires)))
        # jitted init: one compile instead of one tiny compile per parameter
        return jax.jit(self.texture_mlp.init)(key, dummy)

    # -- texture synthesis ----------------------------------------------------

    def get_texture_map(self, params) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(1,3,res,res) texture in [0,1] + raw mlp_output
        (reference textured_mesh.py:266-301)."""
        return texture_from_mlp(self.texture_mlp, params,
                                self.texture_resolution,
                                multires=self.multires)

    def query_texture_at_uv(self, params, uv: jnp.ndarray,
                            allow_fused: bool = True,
                            compute_dtype=jnp.float32) -> jnp.ndarray:
        """Direct MLP query at arbitrary UVs (N,2) -> (N,3) colors in [0,1]
        (bypasses the lattice) — the TPU-preferred render path. Uses the
        fused Pallas kernel on TPU (VMEM-resident activations);
        allow_fused=False forces the plain flax path (needed under GSPMD
        sharding, where XLA partitions dense matmuls but treats a Pallas
        call as an opaque replicated custom call)."""
        use_fused = (allow_fused
                     and jax.default_backend() == "tpu"
                     and self.texture_mlp.D == 8 and self.texture_mlp.W == 256
                     and tuple(self.texture_mlp.skips) == (4,))
        if use_fused:
            from contexture_nerf_tpu.ops.mlp_kernel import fused_nerf2d

            out = fused_nerf2d(params, uv, self.multires,
                               compute_dtype=compute_dtype)
        else:
            out = self.texture_mlp.apply(
                params, fourier_embed(uv, multires=self.multires))
        return (jnp.tanh(out) + 1.0) / 2.0

    def get_texture_map_only_valid_areas(self, params) -> jnp.ndarray:
        """Texture map with only UV-chart-covered texels painted (reference
        get_texture_map_only_valid_areas, textured_mesh.py:303-347):
        rasterize the UV charts into the atlas grid, query the MLP at the
        interpolated UVs, unscale_image the raw outputs, zero elsewhere."""
        from contexture_nerf_tpu.raster.rasterize import (
            interpolate_attributes, rasterize_geometry)

        res = self.texture_resolution
        uv_attr = self.face_attributes  # (1, F, 3, 2)
        fvi = uv_attr * 2.0 - 1.0
        fvz = jnp.ones(fvi.shape[:-1])
        face_idx, bary = rasterize_geometry(fvz, fvi, res, res,
                                            face_chunk=64)
        uvs = interpolate_attributes(face_idx, bary, uv_attr)  # (1,res,res,2)
        emb = fourier_embed(uvs[0], multires=self.multires)
        mlp_out = self.texture_mlp.apply(params, emb)  # (res,res,3)
        colors = mlp_out / 0.5 * 0.8  # unscale_image (textured_mesh.py:337-339)
        mask = (face_idx[0] >= 0)[..., None]
        img = jnp.where(mask, colors, 0.0)
        # align rows with the lattice orientation of get_texture_map
        img = img[::-1]
        return jnp.transpose(img, (2, 0, 1))[None]

    # -- augmentations (reference textured_mesh.py:19-94,197-251; dormant in
    # the reference pipeline: augmentations=False at trainer.py:265) ---------

    def cotan_laplacian(self):
        """Cotangent-weight mesh Laplacian (reference
        build_cotan_laplacian_torch, textured_mesh.py:19-41). Host scipy."""
        from scipy import sparse

        pts = self.mesh.vertices.T  # (3, N)
        tris = self.mesh.faces
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        A = pts[:, a]
        Bv = pts[:, b]
        C = pts[:, c]
        eab, ebc, eca = Bv - A, C - Bv, A - C
        eab = eab / np.linalg.norm(eab, axis=0)
        ebc = ebc / np.linalg.norm(ebc, axis=0)
        eca = eca / np.linalg.norm(eca, axis=0)
        alpha = np.arccos(-np.sum(eca * eab, axis=0))
        beta = np.arccos(-np.sum(eab * ebc, axis=0))
        gamma = np.arccos(-np.sum(ebc * eca, axis=0))
        wab, wbc, wca = 1 / np.tan(gamma), 1 / np.tan(alpha), 1 / np.tan(beta)
        rows = np.concatenate((a, b, a, b, b, c, b, c, c, a, c, a))
        cols = np.concatenate((a, b, b, a, b, c, c, b, c, a, a, c))
        vals = np.concatenate((wab, wab, -wab, -wab, wbc, wbc, -wbc, -wbc,
                               wca, wca, -wca, -wca))
        n = pts.shape[1]
        return sparse.coo_matrix((vals, (rows, cols)),
                                 shape=(n, n), dtype=float).tocsc()

    def eigens(self, k: int = 20, e: float = 0.0):
        """k smallest non-trivial Laplacian eigenpairs (reference
        eigen_problem, textured_mesh.py:70-80)."""
        import scipy.sparse as sparse
        from scipy.sparse.linalg import eigsh

        L = self.cotan_laplacian()
        shift = 1e-4
        vals, vecs = eigsh(L + shift * sparse.eye(L.shape[0]), k=k + 1,
                           which="LM", sigma=e, tol=1e-3)
        vals = vals + shift  # (reference adds the shift back, :75)
        return vals[1:], vecs[:, 1:].T

    @staticmethod
    def normalize_vertices(vertices: np.ndarray, mesh_scale: float = 1.0,
                           dy: float = 0.0) -> np.ndarray:
        v = vertices - vertices.mean(axis=0)[None]
        v = v / np.linalg.norm(v, axis=1).max() * mesh_scale
        v[:, 1] += dy
        return v

    def spectral_augmentations(self, vertices: np.ndarray,
                               rng: np.random.Generator) -> np.ndarray:
        """Random low-frequency spectral deformation (reference
        textured_mesh.py:219-232)."""
        _, basis = self.eigens(20, 0.0)
        rng_span = basis.max(axis=-1) - basis.min(axis=-1)
        basis = basis / rng_span[:, None]
        k = 2
        interval = basis.shape[0] // k
        chosen = [int(rng.integers(0, min(interval, basis.shape[0] - i)))
                  + i for i in range(0, basis.shape[0], interval)]
        coeffs = np.zeros(basis.shape[0])
        coeffs[chosen] = (rng.random(len(chosen)) > 0.5) * 2.0 - 1.0
        recon = coeffs @ basis
        dirs = vertices / np.linalg.norm(vertices, axis=1)[:, None]
        deformed = vertices + 0.25 * recon[:, None] * dirs
        return self.normalize_vertices(deformed, self.mesh_scale, self.dy)

    def axis_augmentations(self, vertices: np.ndarray,
                           rng: np.random.Generator,
                           stretch_factor: float = 1.6,
                           squish_factor: float = 0.7) -> np.ndarray:
        """Random axis stretch/squish (reference textured_mesh.py:234-243)."""
        axes = rng.permutation(3)
        v = vertices.copy()
        v[:, axes[0]] *= stretch_factor
        v[:, axes[1]] *= squish_factor
        return self.normalize_vertices(v, self.mesh_scale, self.dy)

    def augment_vertices(self, rng: np.random.Generator) -> np.ndarray:
        """(reference textured_mesh.py:245-251)"""
        v = self.mesh.vertices.copy()
        if rng.random() < 0.5:
            v = self.spectral_augmentations(v, rng)
        if rng.random() < 0.5:
            v = self.axis_augmentations(v, rng)
        return v

    def apply_median_fill(self, texture: jnp.ndarray) -> jnp.ndarray:
        """Replace near-default-color texels with the per-channel median of
        painted texels (reference change_default_to_median,
        textured_mesh.py:362-369). Median of the masked subset via sort:
        unpainted texels are pushed to +inf so they land past the painted
        count; torch.median's lower-middle convention is matched."""
        default = jnp.asarray(self.default_color).reshape(1, 3, 1, 1)
        diff = jnp.abs(texture - default).sum(axis=1, keepdims=True)
        default_mask = (diff < 0.1).astype(texture.dtype)
        painted = 1.0 - default_mask
        n_painted = painted.sum().astype(jnp.int32)
        vals = jnp.where(painted > 0, texture, jnp.inf)  # (1,3,H,W)
        svals = jnp.sort(vals.reshape(texture.shape[1], -1), axis=1)
        mid = jnp.maximum(n_painted - 1, 0) // 2  # torch lower median
        median = jnp.take_along_axis(svals, jnp.full((svals.shape[0], 1),
                                                     mid), axis=1)[:, 0]
        median = jnp.where(n_painted > 0, median, 0.0)
        return texture * painted + median.reshape(1, 3, 1, 1) * default_mask

    def fit_texture_to_image(self, params, image: jnp.ndarray,
                             key: jax.Array, steps: int = 300,
                             lr: float = 1e-3, batch: int = 4096):
        """Seed the texture field from an image (guide.initial_texture /
        guide.reference_texture). The reference initializes its texture_img
        tensor from the file directly (src/models/textured_mesh.py:119-122);
        the MLP-field equivalent is a short regression: minimize
        MSE(MLP(uv), sample(image, uv)) over random UV batches so renders of
        the field match renders of the image-as-texture. image: (3,R,R) in
        [0,1]. Returns fitted params."""
        import optax

        from contexture_nerf_tpu.ops.texture import sample_texture

        img = jnp.asarray(image)[None]  # (1,3,R,R)
        opt = optax.adam(lr)
        mlp = self.texture_mlp
        multires = self.multires

        def loss_fn(p, uv):
            pred = (jnp.tanh(mlp.apply(
                p, fourier_embed(uv, multires=multires))) + 1) / 2
            tgt = sample_texture(uv[None, None], img)[0, 0]  # (N,3)
            return jnp.mean((pred - tgt) ** 2)

        def step(carry, k):
            p, s = carry
            uv = jax.random.uniform(k, (batch, 2))
            loss, g = jax.value_and_grad(loss_fn)(p, uv)
            up, s = opt.update(g, s, p)
            return (optax.apply_updates(p, up), s), loss

        @jax.jit
        def fit(params, keys):
            (p, _), losses = jax.lax.scan(step, (params, opt.init(params)),
                                          keys)
            return p, losses

        params, losses = fit(params, jax.random.split(key, steps))
        return params

    # -- rendering ------------------------------------------------------------

    def render_geometry(self, theta=None, phi=None, radius=None,
                        dims: Optional[Tuple[int, int]] = None) -> RenderCache:
        theta = jnp.atleast_1d(jnp.asarray(theta, jnp.float32))
        phi = jnp.atleast_1d(jnp.asarray(phi, jnp.float32))
        radius = jnp.atleast_1d(jnp.asarray(radius, jnp.float32))
        B = theta.shape[0]
        uv_attr = jnp.broadcast_to(
            self.face_attributes, (B,) + self.face_attributes.shape[1:])
        return self.renderer.render_geometry(
            self.verts, self.faces, uv_attr, theta, phi, radius,
            look_at_height=self.dy, dims=dims)

    def render(self, params, theta=None, phi=None, radius=None,
               background=None, use_meta_texture: bool = False,
               render_cache: Optional[RenderCache] = None,
               use_median: bool = False,
               dims: Optional[Tuple[int, int]] = None) -> Dict[str, jnp.ndarray]:
        """Full render dict (reference textured_mesh.py:476-580).

        `background`: None | (3,) color array | (B,3,H,W) image | str
        ('white'/'random'/'none')."""
        if render_cache is None:
            render_cache = self.render_geometry(theta, phi, radius, dims=dims)

        texture_img, mlp_output = self.get_texture_map(params)
        if use_median:
            texture_img = self.apply_median_fill(texture_img)

        background_type = "none"
        use_render_back = False
        if background is not None and isinstance(background, str):
            background_type = background
            use_render_back = True

        pred_features, mask, depth, normals = (
            self.renderer.render_texture_with_cache(
                render_cache, texture_img, background_type))

        if use_render_back:
            pred_map = pred_features
            pred_back = pred_features
        else:
            if background is None:
                background = jnp.zeros((3,), pred_features.dtype)
            background = jnp.asarray(background, pred_features.dtype)
            if background.ndim == 1:
                pred_back = jnp.ones_like(pred_features) * background.reshape(
                    1, 3, 1, 1)
            else:
                pred_back = background
            pred_map = pred_back * (1 - mask) + pred_features * mask

        if not use_meta_texture:
            pred_map = jnp.clip(pred_map, 0.0, 1.0)
            pred_features = jnp.clip(pred_features, 0.0, 1.0)

        return {"image": pred_map, "mask": mask, "background": pred_back,
                "foreground": pred_features, "depth": depth,
                "normals": normals, "render_cache": render_cache,
                "texture_map": texture_img, "mlp_output": mlp_output}

    def render_face_normals_face_idx(self, theta, phi, radius,
                                     dims=None):
        """Geometry-only multiview render for view-weight computation
        (reference textured_mesh.py:158-194). Returns
        (mask (B,1,H,W), depth (B,1,H,W), normals_image (B,3,H,W),
        face_normals (B,3,F), face_idx (B,1,H,W))."""
        cache = self.render_geometry(theta, phi, radius, dims=dims)
        B2, H2, W2 = cache.face_idx.shape
        safe_idx = jnp.maximum(cache.face_idx, 0).reshape(B2, -1)
        normals_image = jnp.stack(
            [jnp.take_along_axis(cache.face_normals[..., c], safe_idx, axis=1)
             for c in range(3)], axis=-1).reshape(B2, H2, W2, 3)
        normals_image = normals_image * jnp.transpose(cache.mask, (0, 2, 3, 1))
        return (cache.mask, cache.depth_map,
                jnp.transpose(normals_image, (0, 3, 1, 2)),
                jnp.transpose(cache.face_normals, (0, 2, 1)),
                cache.face_idx[:, None])

    # -- export ---------------------------------------------------------------

    def export_mesh(self, path, params) -> None:
        """OBJ + MTL + albedo.png export (reference textured_mesh.py:417-474)."""
        from PIL import Image

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        texture_img, _ = self.get_texture_map(params)
        colors = np.asarray(
            jnp.clip(texture_img, 0, 1).transpose(0, 2, 3, 1))[0]
        Image.fromarray((colors * 255).astype(np.uint8)).save(
            path / "albedo.png")

        v_np = np.asarray(self.mesh.vertices)
        f_np = np.asarray(self.mesh.faces)
        vt_np = np.asarray(self.vt)
        ft_np = np.asarray(self.ft)

        with open(path / "mesh.obj", "w") as fp:
            fp.write("mtllib mesh.mtl \n")
            for v in v_np:
                fp.write(f"v {v[0]} {v[1]} {v[2]} \n")
            for v in vt_np:
                fp.write(f"vt {v[0]} {v[1]} \n")
            fp.write("usemtl mat0 \n")
            for i in range(len(f_np)):
                fp.write(
                    f"f {f_np[i, 0] + 1}/{ft_np[i, 0] + 1} "
                    f"{f_np[i, 1] + 1}/{ft_np[i, 1] + 1} "
                    f"{f_np[i, 2] + 1}/{ft_np[i, 2] + 1} \n")
        with open(path / "mesh.mtl", "w") as fp:
            fp.write("newmtl mat0 \n")
            fp.write("Ka 1.000000 1.000000 1.000000 \n")
            fp.write("Kd 1.000000 1.000000 1.000000 \n")
            fp.write("Ks 0.000000 0.000000 0.000000 \n")
            fp.write("Tr 1.000000 \n")
            fp.write("illum 1 \n")
            fp.write("Ns 0.000000 \n")
            fp.write("map_Kd albedo.png \n")
