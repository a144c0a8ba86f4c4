"""TPU-gated golden regression: Pallas rasterizer vs the reference's saved
depth tensors. Run with RUN_TPU_TESTS=1 on a TPU host (skipped on CPU CI —
the 1200^2 raster is a TPU workload).

Golden provenance: shapes/spot_depth_{front,side}.pt are square crops of
1200^2 renders of spot_triangulated.obj at (theta=60deg, phi={0,90}deg,
r=1.5, look_at_height=0.25, fovy=pi/3), normalized with the old-TEXTure
min_val=0.5 depth normalization (see SURVEY.md §4; calibration notes in
raster/rasterize.py docstring)."""

import os
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/shapes")

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS") or not REF.exists(),
    reason="TPU-gated golden test (set RUN_TPU_TESTS=1 on a TPU host)")


@pytest.mark.parametrize("golden_name,phi_deg", [
    ("spot_depth_side.pt", 90.0),
    ("spot_depth_front.pt", 0.0),  # camera-path coverage (VERDICT r2 #6)
])
def test_spot_depth_golden(golden_name, phi_deg):
    import jax
    import jax.numpy as jnp
    import torch

    from contexture_nerf_tpu.models.mesh import Mesh
    from contexture_nerf_tpu.raster import camera as cam
    from contexture_nerf_tpu.raster.pallas_raster import (
        rasterize_geometry_pallas)
    from contexture_nerf_tpu.raster.rasterize import interpolate_attributes

    assert jax.default_backend() != "cpu"

    golden = torch.load(REF / golden_name,
                        map_location="cpu")[0, 0].numpy()
    mesh = Mesh.load(str(REF / "spot_triangulated.obj")).normalize_mesh(
        True, 0.6, 0.25)

    proj = cam.perspective_projection(np.pi / 3)
    ct = cam.get_camera_from_view(jnp.asarray([np.deg2rad(60.0)]),
                                  jnp.asarray([np.deg2rad(phi_deg)]),
                                  jnp.asarray([1.5]), 0.25)
    fvc, fvi, _ = cam.prepare_vertices(jnp.asarray(mesh.vertices),
                                       jnp.asarray(mesh.faces), proj, ct)
    face_idx, bary = rasterize_geometry_pallas(fvc[..., 2], fvi, 1200, 1200)
    z = np.asarray(interpolate_attributes(face_idx, bary,
                                          fvc[..., 2:3])[0, ..., 0])
    m = np.asarray(face_idx[0]) >= 0
    mn, mx = z[m].min(), z[m].max()
    depth = np.where(m, 0.5 * (z - mn) / (mx - mn) + 0.5, 0.0)

    # align the golden-size crop (bbox rounding can differ by a pixel)
    size = golden.shape[0]
    nz = np.nonzero(depth != 0)
    mh, Mh = nz[0].min(), nz[0].max()
    mw, Mw = nz[1].min(), nz[1].max()
    bh = int(mh - (size - (Mh - mh + 1)) / 2)
    bw = int(mw - (size - (Mw - mw + 1)) / 2)
    best = 1e9
    for dh in range(-2, 3):
        for dw in range(-2, 3):
            h0, w0 = bh + dh, bw + dw
            if h0 < 0 or w0 < 0 or h0 + size > 1200 or w0 + size > 1200:
                continue
            crop = depth[h0:h0 + size, w0:w0 + size]
            best = min(best, float(np.abs(crop - golden).mean()))
    assert best < 0.005, f"{golden_name} MAE {best}"
