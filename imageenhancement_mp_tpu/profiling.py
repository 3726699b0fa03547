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

__all__ = ["time_op", "time_op_chained", "throughput_gpixs"]


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


def _chain_program(fn: Callable, x, n: int, mode: str = "auto"):
    """Jitted program applying ``fn`` ``n`` times as a data-dependent chain.

    Each scan iteration's input depends on the previous iteration's full
    output, so XLA must execute the ``n`` applications sequentially — it
    cannot parallelise, elide, or batch them.  The program returns a wrap-
    around full reduction of the final carry, so every element of every
    intermediate result is live (no dead-code slice-through for pointwise
    ops).  See docs/DESIGN.md §9b (chain clock).

    ``mode``: "auto" chains outputs directly when ``fn`` preserves
    shape/dtype (honest HBM traffic: each output is the next carry);
    "refeed" forces the carry-bit variant — ``fn`` is applied to the
    ORIGINAL input with one data-dependent element folded in, so the data
    statistics stay realistic every iteration.  Use "refeed" for
    data-dependent ops (e.g. Canny's hysteresis fixpoint) whose timing
    would drift as the chained data degenerates.  The refeed output is
    pinned behind an ``optimization_barrier`` so XLA cannot elide the
    output write into the liveness reduction; the extra full read of the
    output makes refeed a slightly CONSERVATIVE (over-) estimate.
    """
    import jax
    import jax.numpy as jnp

    out = jax.eval_shape(fn, x)
    same = out.shape == x.shape and out.dtype == x.dtype
    floating = jnp.issubdtype(x.dtype, jnp.floating)

    if same and mode != "refeed":

        def body(c, _):
            return fn(c), None

    else:
        # Shape/dtype-changing op: fold one data-dependent bit of the FULL
        # output back into the carry.  The reduction over y keeps all of y
        # live; the single-element update keeps per-iteration overhead at
        # ~one fused reduce pass (documented in the probe artifacts).
        def body(c, _):
            # barrier: y must be materialized as the op would materialize
            # it — without this XLA fuses the reduction into the producer
            # and the op's output write is elided from the measurement
            y = jax.lax.optimization_barrier(fn(c))
            if jnp.issubdtype(y.dtype, jnp.floating):
                t = jnp.sum(y.astype(jnp.float32))
                bit = jax.lax.bitcast_convert_type(t, jnp.int32) & 1
            else:
                bit = (jnp.sum(y.astype(jnp.uint32)) & jnp.uint32(1)).astype(
                    jnp.int32
                )
            flat = c.reshape(-1)
            if floating:
                # data-dependent, hence not constant-foldable; small enough
                # (<=1e-30) to never change the op's performance profile
                upd = flat[0] + bit.astype(c.dtype) * c.dtype.type(1e-30)
            else:
                upd = flat[0] ^ bit.astype(c.dtype)
            flat = flat.at[0].set(upd)
            return flat.reshape(c.shape), None

    def run(x0):
        import jax.lax as lax

        c, _ = lax.scan(body, x0, None, length=n)
        if jnp.issubdtype(c.dtype, jnp.floating):
            return jnp.sum(c.astype(jnp.float32))
        return jnp.sum(c.astype(jnp.uint32))  # wraparound sum: all elems live

    import jax

    return jax.jit(run)


def time_op_chained(
    fn: Callable,
    x,
    *,
    n_lo: int = 2,
    n_hi: int | None = None,
    target_secs: float = 1.0,
    repeats: int = 3,
    mode: str = "auto",
    max_chain: int = 16384,
) -> float:
    """Tunnel-independent seconds per call of ``fn(x)`` (the chain clock).

    On tunneled TPU platforms ``block_until_ready`` can ACK before the
    device finishes (docs/PHYSICS_r04.json measured 40-80x over v5e spec
    with the wall clock), so wall-clock-per-blocked-call is meaningless.
    This clock instead:

    1. chains ``n`` applications of ``fn`` on-device via ``lax.scan`` with a
       hard data dependence between iterations (``_chain_program``);
    2. fences by fetching the program's scalar result to the host with
       ``np.asarray`` — the host must receive the real bytes, and the bytes
       only exist after the whole chain has executed, so the fetch cannot
       early-ack;
    3. times two chain lengths ``n_lo < n_hi`` and returns
       ``(t_hi - t_lo) / (n_hi - n_lo)``, cancelling every per-call constant
       (dispatch latency — including the post-d2h degraded mode — transfer
       time, and tunnel round trips).

    ``n_hi`` is auto-sized so the differenced device time is ~``target_secs``
    (default 1 s), which dominates dispatch jitter by orders of magnitude.
    ``repeats`` takes the min wall time per chain length: real device
    execution is the physical floor; noise only ever inflates.
    """
    def t_of(n: int) -> float:
        g = _chain_program(fn, x, n, mode)
        np.asarray(g(x))  # compile + warm (also fences)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(g(x))
            best = min(best, time.perf_counter() - t0)
        return best

    auto_size = n_hi is None
    if auto_size:
        # probe with a short chain to size the long one.  t_probe/probe_n
        # still contains dispatch overhead/probe_n, so this FIRST estimate
        # only bounds n_hi from below — the differenced re-size loop after
        # the first (t_lo, t_hi) pair removes the overhead term and grows
        # the chain until the differenced device time dominates jitter.
        probe_n = max(n_lo + 1, 4)
        t_probe = t_of(probe_n)
        per = max(t_probe / probe_n, 1e-7)
        n_hi = int(np.clip(target_secs / per, n_lo + 8, max_chain))
    t_lo = t_of(n_lo)
    t_hi = t_of(n_hi)
    if auto_size:
        for _ in range(3):
            diff = t_hi - t_lo
            if diff >= 0.25 * target_secs or n_hi >= max_chain:
                break
            if diff <= 0:  # pure noise — grow geometrically
                n_next = min(n_hi * 8, max_chain)
            else:
                per_op = max(diff / (n_hi - n_lo), 1e-9)
                n_next = int(np.clip(target_secs / per_op, n_hi + 1, max_chain))
            if n_next <= n_hi:
                break
            n_hi = n_next
            t_hi = t_of(n_hi)
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-12)
