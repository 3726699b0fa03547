"""Median filtering via fixed-size sorting networks.

Reference equivalent: ``cv2.medianBlur`` (SURVEY.md §2 #9; border =
replicate).  TPU-first design: no data-dependent control flow — the median
of a 3×3/5×5 window is computed by a *selection network* of elementwise
min/max pairs over the B×H×W-shaped window planes, fully vectorized on the
VPU.  The 9-input network below is the classic 19-comparator median network
(Paeth); the 25-input one is the standard extension via column-sort +
merge-exchange used in median-filter literature.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["median_blur_planes"]


def _windows(planes: jnp.ndarray, k: int) -> list[jnp.ndarray]:
    pad = k // 2
    H, W = planes.shape[-2], planes.shape[-1]
    p = jnp.pad(planes, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    return [p[:, dy : dy + H, dx : dx + W] for dy in range(k) for dx in range(k)]


def _median_sort(ws: list[jnp.ndarray]) -> jnp.ndarray:
    """Median via odd-even transposition selection on the window list.

    Exchange network expressed with jnp.minimum/maximum; O(k^4) comparators
    but fully data-parallel.  Used as the generic fallback — the k=3 path
    uses the optimal 19-comparator network.
    """
    n = len(ws)
    ws = list(ws)
    # full odd-even transposition sort (n rounds); exact and branch-free
    for r in range(n):
        start = r % 2
        for i in range(start, n - 1, 2):
            lo = jnp.minimum(ws[i], ws[i + 1])
            hi = jnp.maximum(ws[i], ws[i + 1])
            ws[i], ws[i + 1] = lo, hi
    return ws[n // 2]


def _median9(w: list[jnp.ndarray]) -> jnp.ndarray:
    """Optimal 19-comparator median-of-9 network (Paeth, Graphics Gems)."""

    def cex(i, j):
        lo = jnp.minimum(w[i], w[j])
        hi = jnp.maximum(w[i], w[j])
        w[i], w[j] = lo, hi

    for i, j in [
        (1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
        (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
        (4, 2), (6, 4), (4, 2),
    ]:
        cex(i, j)
    return w[4]


def median_blur_planes(
    planes: jnp.ndarray, ksize: int = 3, backend: str | None = None
) -> jnp.ndarray:
    """``cv2.medianBlur`` on uint8 planes — exact; border = replicate.

    On TPU dispatches to the double-buffered Pallas sorting-network kernel
    for the reference's 3×3/5×5 sizes (kernels/median.py)."""
    if ksize % 2 == 0 or ksize < 3:
        raise ValueError("ksize must be odd and >= 3")
    from imageenhancement_mp_tpu import config

    if (
        planes.dtype == jnp.uint8
        and ksize in (3, 5)
        and (backend == "pallas" or (backend is None and config.pallas_enabled()))
    ):
        from imageenhancement_mp_tpu.kernels.median import median_blur_pallas

        return median_blur_pallas(planes, ksize)
    ws = _windows(planes, ksize)
    if ksize == 3:
        return _median9(ws)
    return _median_sort(ws)
