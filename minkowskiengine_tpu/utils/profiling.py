"""Profiling / tracing helpers.

The reference has no integrated tracer (NVTX is vendored but unused,
SURVEY.md §5); on TPU the native story is `jax.profiler`:

    with me.utils.trace("/tmp/tb"):
        train_step(...)          # then: tensorboard --logdir /tmp/tb

or annotate phases inside jitted code with `named_scope`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotate a region inside traced code (shows up in the trace viewer)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def timer(name: str = "", sync: bool = True) -> Iterator[dict]:
    """Wall-clock a block; result in ``out['seconds']``.

    On this TPU setup an isolated dispatch+sync pays ~30 ms tunnel latency —
    prefer timing N chained steps and dividing (see bench.py).
    """
    out = {}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        out["seconds"] = time.perf_counter() - t0
        if name:
            print(f"[timer] {name}: {out['seconds'] * 1e3:.3f} ms")


class Timer:
    """Reference-style accumulating timer (src/utils.hpp:40)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.count += 1
        return dt

    @property
    def average(self) -> float:
        return self.total / max(self.count, 1)
