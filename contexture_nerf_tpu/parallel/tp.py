"""Tensor-parallel sharding rules for the diffusion towers.

Megatron-style parameter layout expressed as GSPMD shardings (SURVEY.md §2.3
"Tensor parallel" row): attention QKV and MLP up-projections shard their
OUTPUT features over the `tp` axis, the subsequent out/down-projections shard
their INPUT features, convolutions shard output channels. XLA then emits the
reduce-scatter/all-gather pairs over ICI; correctness is unchanged (GSPMD
shardings are layout hints, not a different program).

Usage:
    specs = tp_param_specs(params, mesh, axis="tp")
    params = jax.device_put(params, specs)         # or pass as in_shardings

The rules are name-based over the flax param tree produced by
diffusion/{unet,vae,controlnet,clip}.py (layers.py module names).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# dense kernels (in, out): shard OUT features
_COL_PARALLEL = ("to_q", "to_k", "to_v", "geglu_proj", "linear_1")
# dense kernels: shard IN features (they consume col-parallel outputs)
_ROW_PARALLEL = ("to_out", "out_proj", "linear_2")


def _spec_for(path, leaf, axis: str):
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    if leaf.ndim == 0:
        return P()
    module = names[-2] if len(names) >= 2 else ""
    kind = names[-1]
    if kind == "kernel" and leaf.ndim == 2:
        if module in _COL_PARALLEL:
            return P(None, axis)
        if module in _ROW_PARALLEL:
            return P(axis, None)
        return P()
    if kind == "kernel" and leaf.ndim == 4:  # conv HWIO: shard O
        return P(None, None, None, axis)
    if kind == "bias":
        if module in _COL_PARALLEL:
            return P(axis)
        return P()
    return P()


def tp_param_specs(params: Any, mesh: Mesh, axis: str = "tp"):
    """NamedSharding pytree for a flax param tree: TP rules where divisible,
    replicated otherwise."""
    n = mesh.shape[axis]

    def place(path, leaf):
        spec = _spec_for(path, leaf, axis)
        # replicate anything the mesh size does not divide
        for dim, name in enumerate(spec):
            if name == axis and leaf.shape[dim] % n != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(place, params)


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "tp"):
    """device_put the param tree with TP shardings."""
    return jax.device_put(params, tp_param_specs(params, mesh, axis))
