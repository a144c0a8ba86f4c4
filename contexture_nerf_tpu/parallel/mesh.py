"""Device mesh + sharding specs — the framework's communication layer.

The reference's only multi-device code is a vestigial nn.DataParallel of the
texture MLP (trainer.py:134-135, SURVEY.md §2.3). Here multi-chip scaling is
first-class SPMD: one mesh, NamedShardings, XLA-emitted ICI collectives.

Axes (SURVEY.md §2.3 table):
  views  — the natural data axis of this workload: the 7-view raster batch,
           the 6-view back-projection, eval turntable frames.
  batch  — CFG uncond/cond pair and any outer batching of experiments.
Tensor-parallel sharding of UNet heads/channels is planned (the specs below
carry a 'tp' axis name) but the shipped step functions use views/batch DP.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axis_sizes: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = ("views",),
                devices=None) -> Mesh:
    """Build a device mesh. Defaults to a 1-D 'views' mesh over all devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,)
    assert int(np.prod(axis_sizes)) == n, (axis_sizes, n)
    dev_array = mesh_utils.create_device_mesh(axis_sizes, devices=devices)
    return Mesh(dev_array, axis_names)


def views_sharding(mesh: Mesh, axis: str = "views") -> NamedSharding:
    """Shard the leading (view/batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree, mesh: Mesh, axis: str = "views"):
    """Place every array in the pytree with its leading dim sharded over
    `axis` (arrays whose leading dim does not divide are replicated)."""
    n = mesh.shape[axis]
    sh_views = views_sharding(mesh, axis)
    sh_rep = replicated(mesh)

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, sh_views)
        return jax.device_put(x, sh_rep)

    return jax.tree.map(place, tree)
