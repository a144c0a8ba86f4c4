"""Asynchronous image logging.

The reference writes debug PNGs synchronously inside the SDS loop
(/root/reference/src/training/trainer.py:902-904,1162-1218). Through the
remote-device tunnel that stall measured ~1.3 s per logging event
(device->host fetch + PNG encode + disk write), i.e. +130 ms/iter amortized
at the reference's every-10-iter cadence — a 46% loop slowdown
(docs/PERF.md, 2026-08-19 quick-config windows: 414 vs 284 ms/iter).

This writer keeps the loop thread non-blocking: it starts an async
device->host copy (jax.Array.copy_to_host_async) and hands the array to ONE
worker thread that materializes, encodes, and writes. Ordering per file is
preserved (single worker); memory is bounded by backpressure — submit()
blocks on the oldest pending write once `max_pending` are in flight.

Failure semantics: exceptions (including the NaN/Inf image guard the
reference raises in-loop, trainer.py:1169-1174) surface at the next
submit()/flush() instead of at the exact logging iteration.
"""

from __future__ import annotations

import threading
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable, Deque

import numpy as np


class AsyncImageWriter:
    """One-worker asynchronous writer for debug/log images."""

    def __init__(self, max_pending: int = 16):
        self._pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ctn-imgwriter")
        self._pending: Deque[Future] = deque()
        self._max_pending = max_pending
        self._lock = threading.Lock()

    def submit(self, array, write_fn: Callable[[np.ndarray], None]):
        """Queue `write_fn(np.asarray(array))` on the worker thread.

        `array` may be a jax.Array (an async device->host copy is started
        here so the worker's materialization doesn't wait on the device
        queue), a numpy array, or a tuple/list of either (write_fn then
        receives a tuple of numpy arrays). Raises any exception from
        PREVIOUS writes.
        """
        is_multi = isinstance(array, (tuple, list))
        items = tuple(array) if is_multi else (array,)
        for a in items:
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()

        def task():
            mats = tuple(np.asarray(a) for a in items)
            write_fn(mats if is_multi else mats[0])

        with self._lock:
            self._reap()
            while len(self._pending) >= self._max_pending:
                self._pending.popleft().result()  # backpressure + raise
            self._pending.append(self._pool.submit(task))

    def _reap(self):
        while self._pending and self._pending[0].done():
            self._pending.popleft().result()  # raise if the write failed

    def flush(self):
        """Block until every queued write finished; re-raise the first
        failure. Call at loop/phase boundaries before reading artifacts."""
        with self._lock:
            while self._pending:
                self._pending.popleft().result()

    def close(self):
        self.flush()
        self._pool.shutdown(wait=True)


_SYNC = None


def sync_writer():
    """A degenerate writer that runs submissions inline (for
    `log.async_image_writer: false` — reference-style synchronous logging
    with in-loop exceptions)."""
    global _SYNC
    if _SYNC is None:
        class _SyncWriter:
            def submit(self, array, write_fn):
                write_fn(np.asarray(array))

            def flush(self):
                pass

            def close(self):
                pass

        _SYNC = _SyncWriter()
    return _SYNC
