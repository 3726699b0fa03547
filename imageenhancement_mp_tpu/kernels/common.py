"""Shared helpers for the Pallas kernels (layout math, lane shifts)."""

from __future__ import annotations

from jax.experimental.pallas import tpu as pltpu

LANES = 128


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def shift_left(arr, j: int):
    """``arr[:, c] -> arr[:, c+j]`` via lane rotate.

    pltpu.roll only accepts non-negative shifts, so a left shift by ``j`` is
    a rotate by ``size - j``; the wraparound garbage lands in the caller's
    crop margin.
    """
    if j == 0:
        return arr
    return pltpu.roll(arr, arr.shape[-1] - j, axis=1)
