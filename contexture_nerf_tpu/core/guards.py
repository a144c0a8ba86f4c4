"""Numerical-sanity guards (the reference's NaN/Inf checks, systematized).

Reference equivalents: utils.py:46-51 and trainer.py:1169-1174 raise on
NaN/Inf images; trainer.py:835 / stable_diffusion_depth.py:922 nan_to_num the
SDS gradient; a commented torch.autograd.set_detect_anomaly
(run_nerf_helpers.py:2). Here:

  - check_finite(tree, name): host-side assertion for pytrees (tests/debug);
  - finite_or_zero: in-graph nan_to_num with a debug counter;
  - enable_debug_nans(): flips jax_debug_nans (the JAX anomaly mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(tree, name: str = "tensor") -> None:
    for i, leaf in enumerate(jax.tree.leaves(tree)):
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            raise ValueError(
                f"{name}[leaf {i}] contains NaNs or infinite values")


def finite_or_zero(x: jnp.ndarray) -> jnp.ndarray:
    """In-graph guard: replace non-finite values with 0 (reference
    torch.nan_to_num on the SDS grad, trainer.py:835)."""
    return jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)


def enable_debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
