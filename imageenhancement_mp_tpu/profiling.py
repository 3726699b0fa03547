"""Timing helpers encoding the measurement methodology for this stack.

Observability layer (SURVEY.md §5): wall-clock device timing with warmup
and median-of-iters, plus throughput conversion.  Two rules learned the
hard way on tunneled TPU platforms (docs/DESIGN.md §9):

* never fetch results to the host before you are done timing (the first
  device→host transfer can permanently degrade dispatch latency);
* always block on the result each iteration — medians over blocked calls
  are stable, means over async dispatch are not.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

__all__ = ["time_op", "throughput_gpixs"]


def time_op(
    fn: Callable, *args, iters: int = 10, warmup: int = 3, reduce: str = "median"
) -> float:
    """Wall-clock seconds per call of ``fn(*args)`` (device-blocked).

    ``reduce``: "median" (default) or "min".  On tunneled/noisy platforms
    the min is the robust estimate of machine capability (timeit-style) —
    dispatch-latency spikes inflate the median by up to ~10× here.
    """
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.min(ts) if reduce == "min" else np.median(ts))


def throughput_gpixs(shape, secs: float) -> float:
    """Pixels/second in GPix/s for an array of ``shape`` processed in ``secs``."""
    return float(np.prod(shape)) / secs / 1e9
