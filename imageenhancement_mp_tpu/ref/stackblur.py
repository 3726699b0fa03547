"""``cv2.stackBlur`` oracle (u8) — pinned interior law, budgeted edges.

Pinned by round-3/4 probes (docs/PARITY.md "stackBlur"):

* separable triangle kernel ``w(d) = r+1−|d|`` per axis (divisor
  ``(r+1)²``), REPLICATE borders, each pass descaled to u8;
* descale law: Klingemann fixed-point TRUNCATION ``(S·mul[r]) >> shr[r]``
  for ``r ≤ 4``, exact half-to-even ``cvRound(S/(r+1)²)`` for ``r ≥ 5``;
* cv2's row EDGES (first/last ~2·veclen columns) run SIMD-lane-scheduled
  code with its own weight deltas — an artifact of vector scheduling, not
  a clean algorithm — so this oracle is a BUDGETED op: interior ±1,
  edges ±2 (tests/test_stackblur.py pins it).
"""

from __future__ import annotations

import numpy as np

__all__ = ["stack_blur"]

# Klingemann stackblur fixed-point tables (public-domain algorithm
# constants; index = radius)
_MUL = [
    512, 512, 456, 512, 328, 456, 335, 512, 405, 328, 271, 456, 388, 335,
    292, 512, 454, 405, 364, 328, 298, 271, 496, 456, 420, 388, 360, 335,
    312, 292, 273, 512, 482, 454, 428, 405, 383, 364, 345, 328, 312, 298,
    284, 271, 259, 496, 475, 456, 437, 420, 404, 388, 374, 360, 347, 335,
    323, 312, 302, 292, 282, 273, 265, 512,
]
_SHR = [
    9, 11, 12, 13, 13, 14, 14, 15, 15, 15, 15, 16, 16, 16, 16, 17, 17,
    17, 17, 17, 17, 17, 18, 18, 18, 18, 18, 18, 18, 18, 18, 19, 19, 19,
    19, 19, 19, 19, 19, 19, 19, 19, 19, 19, 19, 20, 20, 20, 20, 20, 20,
    20, 20, 20, 20, 20, 20, 20, 20, 20, 20, 20, 20, 21,
]


def _descale(S: np.ndarray, r: int) -> np.ndarray:
    if r <= 4:
        return (S * _MUL[r]) >> _SHR[r]
    den = (r + 1) * (r + 1)
    # half-to-even integer rounding of S/den
    q = (2 * S + den) // (2 * den)
    tie = (2 * S + den) % (2 * den) == 0
    return np.where(tie & (q % 2 == 1), q - 1, q)


def _pass_1d(x: np.ndarray, r: int, axis: int) -> np.ndarray:
    """One triangle-weighted pass (replicate border) along ``axis`` → u8."""
    if r == 0:
        return x.astype(np.uint8)
    xi = np.moveaxis(x.astype(np.int64), axis, -1)
    p = np.pad(xi, [(0, 0)] * (xi.ndim - 1) + [(r, r)], mode="edge")
    # triangle = box(r+1) ∘ box(r+1): two running sums
    c = np.cumsum(np.pad(p, [(0, 0)] * (xi.ndim - 1) + [(1, 0)]), axis=-1)
    b1 = c[..., r + 1 :] - c[..., : -(r + 1)]  # box sums length r+1
    c2 = np.cumsum(np.pad(b1, [(0, 0)] * (xi.ndim - 1) + [(1, 0)]), axis=-1)
    S = c2[..., r + 1 :] - c2[..., : -(r + 1)]
    out = np.clip(_descale(S, r), 0, 255).astype(np.uint8)
    return np.moveaxis(out, -1, axis)


def stack_blur(img: np.ndarray, ksize) -> np.ndarray:
    """``cv2.stackBlur(img, Size(kw, kh))`` — u8 gray/color."""
    if img.dtype != np.uint8:
        raise TypeError("stack_blur oracle: uint8 only (budgeted op)")
    kh, kw = (ksize, ksize) if isinstance(ksize, int) else (ksize[0], ksize[1])
    if kh < 1 or kw < 1 or kh % 2 == 0 or kw % 2 == 0:
        raise ValueError("ksize dims must be odd and >= 1")
    if kh // 2 > 63 or kw // 2 > 63:
        raise ValueError("radius > 63 not supported (fixed-point table)")
    out = _pass_1d(img, kw // 2, axis=1)
    return _pass_1d(out, kh // 2, axis=0)
