"""Tracing / profiling subsystem.

The reference has only ad-hoc perf_counter prints around the SD2 img2img call
(trainer.py:1046-1061) and commented-out cuda.synchronize timers
(stable_diffusion_depth.py:884-927; SURVEY.md §5). This module provides:

  - phase(name): wall-clock context manager that also emits a
    jax.profiler.TraceAnnotation so phases show up in TPU profiler traces;
  - annotate(name): decorator form for step functions;
  - start_trace/stop_trace: one-call wrapper around the jax profiler for
    capturing a TensorBoard-viewable TPU trace of the SDS loop;
  - Timings: per-phase accumulated statistics dumped to JSON.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from functools import wraps
from pathlib import Path
from typing import Dict, Optional

import jax


class Timings:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def add(self, name: str, dt: float):
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1000 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def dump(self, path: Path):
        Path(path).write_text(json.dumps(self.summary(), indent=1))


GLOBAL_TIMINGS = Timings()


@contextlib.contextmanager
def phase(name: str, timings: Optional[Timings] = None,
          block: bool = False):
    """Wall-clock + profiler-trace phase. block=True inserts a device sync
    (only for measurement, never in production loops)."""
    t = timings or GLOBAL_TIMINGS
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if block:
        (jax.device_put(0) + 0).block_until_ready()
    t.add(name, time.perf_counter() - t0)


def annotate(name: str, timings: Optional[Timings] = None):
    def deco(fn):
        @wraps(fn)
        def wrapper(*a, **kw):
            with phase(name, timings):
                return fn(*a, **kw)
        return wrapper
    return deco


def start_trace(log_dir: str = "/tmp/ctnerf_trace"):
    jax.profiler.start_trace(log_dir)
    return log_dir


def stop_trace():
    jax.profiler.stop_trace()
