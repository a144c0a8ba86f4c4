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
    """Per-phase wall-clock stats. The FIRST call of each phase is reported
    separately — under jit it includes compilation, and folding it into the
    mean makes low-count phases read as absurd "means" (a one-compile
    sds_step once looked like a 323 s mean).

    For ASYNC phases (the production SDS loop dispatches without blocking, so
    per-call wall-clock measures host dispatch only — ~6 ms while the device
    step runs ~285 ms), callers record `note_window(name, iters, seconds)`
    between genuine device syncs; summary() then reports the device-inclusive
    `window_iter_ms` alongside the dispatch-only `steady_mean_ms`."""

    def __init__(self):
        self.first: Dict[str, float] = {}
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.win_totals: Dict[str, float] = defaultdict(float)
        self.win_iters: Dict[str, int] = defaultdict(int)
        self.win_counts: Dict[str, int] = defaultdict(int)

    def add(self, name: str, dt: float):
        if name not in self.first:
            self.first[name] = dt
        else:
            self.totals[name] += dt
            self.counts[name] += 1

    def note_window(self, name: str, iters: int, seconds: float):
        """Record a sync-to-sync window covering `iters` dispatched steps;
        the caller must have blocked on a device value at both endpoints, so
        `seconds` includes device execution (unlike add()'s dispatch time)."""
        if iters <= 0:
            return
        self.win_totals[name] += seconds
        self.win_iters[name] += iters
        self.win_counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k in set(self.first) | set(self.win_totals):
            n = self.counts[k]
            out[k] = {
                "first_call_s": round(self.first[k], 4)
                if k in self.first else None,
                "steady_count": n,
                "steady_mean_ms": round(1000 * self.totals[k] / n, 3)
                if n else None,
                "total_s": round(self.first.get(k, 0.0) + self.totals[k], 4),
            }
            if self.win_iters[k]:
                # device-inclusive rate over sync-to-sync windows; the
                # dispatch-only steady_mean_ms above stays for host-overhead
                # reads
                out[k]["window_iter_ms"] = round(
                    1000 * self.win_totals[k] / self.win_iters[k], 3)
                out[k]["windows"] = self.win_counts[k]
        return out

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
