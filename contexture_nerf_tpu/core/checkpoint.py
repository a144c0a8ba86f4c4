"""Checkpoint / resume via orbax.

The reference creates an (always-empty) checkpoints/ directory and restarts
whole experiments from scratch on failure (SURVEY.md §5: no torch.save
anywhere; generate_survey_textures.py retries from zero). This module gives
the framework real fault tolerance: MLP params + optimizer state + iteration
+ RNG key, atomically saved and restorable mid-run.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def save(path: Path, params: Any, opt_state: Any = None,
         iteration: int = 0, rng_key: Optional[jax.Array] = None) -> None:
    import orbax.checkpoint as ocp

    payload: Dict[str, Any] = {"params": params, "iteration": iteration}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if rng_key is not None:
        payload["rng_key"] = np.asarray(rng_key)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), payload, force=True)
    ckptr.wait_until_finished()


def restore(path: Path, target: Any = None) -> Dict[str, Any]:
    """Restore a checkpoint. `target` is an optional pytree of real values or
    jax.ShapeDtypeStructs giving the expected structure — required to get
    typed containers (e.g. optax NamedTuple states) back instead of raw
    dicts. With target=None, returns whatever structure was saved (older
    checkpoints without opt_state/rng_key restore fine this way)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target)


def latest_iteration(ckpt_dir: Path) -> Optional[int]:
    """Find the newest iter_XXXXXX checkpoint in a directory."""
    candidates = sorted(Path(ckpt_dir).glob("iter_*"))
    if not candidates:
        return None
    return int(candidates[-1].name.split("_")[1])
