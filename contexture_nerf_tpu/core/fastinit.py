"""Fast random init for tiny test towers.

A jitted flax `.init` of even a tiny UNet costs ~10 s of XLA compile on the
1-core CI host, and the test suite builds dozens of random-weight tiny
towers whose init DISTRIBUTION is irrelevant (parity tests randomize
weights themselves; behavioural tests only need finite params). With
`CTN_FAST_TINY_INIT=1` (set by tests/conftest.py), `maybe_jit_init`
replaces compile+run with `jax.eval_shape` (~0.4 s, no compile) and a
seeded per-leaf numpy normal fill.

Production never sets the env var: real runs either convert checkpoints or
genuinely jit-init once (and the flagship texture MLP keeps its exact
torch-matching init unconditionally — models/textured_mesh.py:375 does not
route through here).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _seed_of(key) -> int:
    try:
        data = jax.random.key_data(key)
    except TypeError:
        data = key
    return int(np.asarray(data).astype(np.uint64).sum() % (2 ** 32))


def maybe_jit_init(init_fn, key, *args):
    """`jax.jit(init_fn)(key, *args)`, or the eval_shape fast path when
    CTN_FAST_TINY_INIT=1."""
    if not os.environ.get("CTN_FAST_TINY_INIT"):
        return jax.jit(init_fn)(key, *args)
    shapes = jax.eval_shape(init_fn, key, *args)
    paths, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    rng = np.random.default_rng(_seed_of(key))
    filled = []
    for path, leaf in paths:
        name = str(path[-1]).lower() if path else ""
        if not np.issubdtype(leaf.dtype, np.floating):
            filled.append(jnp.zeros(leaf.shape, leaf.dtype))
        elif "scale" in name:
            # norm scales must stay ~1 or activations collapse and the
            # random towers stop responding to their inputs (the semantic
            # smokes depend on signal propagation, not just finiteness)
            filled.append(jnp.ones(leaf.shape, leaf.dtype))
        elif "bias" in name:
            filled.append(jnp.zeros(leaf.shape, leaf.dtype))
        else:
            # fan-in-ish scaling keeps deep-tower activations O(1)
            fan_in = leaf.shape[-2] if len(leaf.shape) >= 2 else \
                max(1, leaf.shape[-1] if leaf.shape else 1)
            if len(leaf.shape) == 4:  # HWIO conv kernel
                fan_in = leaf.shape[0] * leaf.shape[1] * leaf.shape[2]
            std = float(np.sqrt(1.0 / max(1, fan_in)))
            filled.append(jnp.asarray(
                rng.normal(0.0, std, leaf.shape).astype(leaf.dtype)))
    return jax.tree_util.tree_unflatten(
        treedef, [x for x in filled])
