"""Exact f32 FMA emulation (no hardware FMA, no f64) — shared by ops/kernels.

cv2's integer SIMD paths (convertScaleAbs, normalize's convertTo,
addWeighted) compute **single-rounded** f32 FMAs.  JAX f32 mul+add rounds
twice, flipping ties (±1 LSB after cvRound).  ``fma32`` reproduces the
single rounding exactly: Dekker two-product + Knuth two-sum give the exact
error terms, and adding them back yields the correctly rounded result
(0 mismatches vs the f64-reference FMA in 10M+ fuzz cases; see
docs/PARITY.md).  Plain arithmetic only — safe inside Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["two_prod", "two_sum", "fma32"]


def two_prod(x, y):
    """Dekker two-product: exact ``x·y = p + e`` in f32 (no FMA hardware)."""
    p = x * y
    c = jnp.float32(4097.0)  # 2^12 + 1: f32 Veltkamp split constant
    xx = x * c
    xh = xx - (xx - x)
    xl = x - xh
    yy = y * c
    yh = yy - (yy - y)
    yl = y - yh
    e = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
    return p, e


def two_sum(x, y):
    """Knuth two-sum: exact ``x + y = s + e`` in f32, any signs."""
    s = x + y
    yp = s - x
    e = (x - (s - yp)) + (y - yp)
    return s, e


def fma32(x, scale, shift):
    """Single-rounded f32 FMA ``RN(x·scale + shift)`` (cv2's SIMD rounding)."""
    p, pe = two_prod(x, scale)
    s, se = two_sum(p, shift)
    return s + (pe + se)
