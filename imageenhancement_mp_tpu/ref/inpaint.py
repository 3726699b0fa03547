"""``cv2.inpaint`` oracle: Telea fast-marching inpainting (NumPy, exact-intent).

Structure (behavioral transcription of OpenCV 5.0's photo inpaint path,
re-derived by probing the installed binary — docs/PARITY.md "inpaint"):

* 1-px padded working grids; flag field f ∈ {KNOWN=0, BAND=1, INSIDE=2};
  T initialized to 1e6.
* initial band = cross-dilate(mask) − mask, pushed FIFO-stable into a
  float min-heap (ties broken by insertion order, row-major scan).
* Telea pre-pass: T is marched OUTWARD over the rect-(2r+1)-dilated ring
  (icvCalcFMM with negate): the resulting outside distances are negated.
* main FMM: pop band points by T, solve the quadratic Eikonal update for
  INSIDE 4-neighbors (the four axis-pair solves, min), and PAINT each
  newly-banded pixel from its (2r+1)² neighborhood with Telea's weights

      w = |dst · lev · dir|,
      dst = 1/(|r|²·|r|),  lev = 1/(1 + |T(p) − T(q)|),
      dir = max-ish(r·∇T, 1e-6 below 0.01 magnitude)

  plus the normalized gradient term  (Jx+Jy)/(√(Jx²+Jy²)+1e-20)  and a
  final  int(x + 0.5)  cast (all f32 single precision like cv2).
"""

from __future__ import annotations

import heapq

import numpy as np

__all__ = ["inpaint_telea"]

KNOWN, BAND, INSIDE = 0, 1, 2
_F32 = np.float32


def _dilate(m: np.ndarray, el: np.ndarray) -> np.ndarray:
    """Binary dilation of uint8 m by structuring element el (odd, centered)."""
    kh, kw = el.shape
    ph, pw = kh // 2, kw // 2
    p = np.pad(m, ((ph, ph), (pw, pw)))
    out = np.zeros_like(m)
    for i in range(kh):
        for j in range(kw):
            if el[i, j]:
                out = np.maximum(out, p[i : i + m.shape[0], j : j + m.shape[1]])
    return out


class _Heap:
    """cv2's CvPriorityQueueFloat: min-heap on T with FIFO tie order."""

    def __init__(self):
        self.h: list = []
        self.n = 0

    def push(self, tval: float, i: int, j: int):
        heapq.heappush(self.h, (_F32(tval), self.n, i, j))
        self.n += 1

    def pop(self):
        if not self.h:
            return None
        t, _, i, j = heapq.heappop(self.h)
        return i, j

    def add_band(self, band: np.ndarray):
        for i, j in zip(*np.nonzero(band)):
            self.push(0.0, int(i), int(j))


def _fmm_solve(i1, j1, i2, j2, f, t):
    """cv2 FMM_solve: quadratic Eikonal update from two known neighbors."""
    a11 = float(t[i1, j1])
    a22 = float(t[i2, j2])
    m12 = min(a11, a22)
    if f[i1, j1] != INSIDE:
        if f[i2, j2] != INSIDE:
            if abs(a11 - a22) >= 1.0:
                sol = 1 + m12
            else:
                sol = (a11 + a22 + np.sqrt(2 - (a11 - a22) * (a11 - a22))) * 0.5
        else:
            sol = 1 + a11
    elif f[i2, j2] != INSIDE:
        sol = 1 + a22
    else:
        sol = 1 + m12
    return _F32(sol)


_DI = (-1, 0, 1, 0)
_DJ = (0, -1, 0, 1)


def _calc_fmm(f, t, heap, negate, rows, cols):
    """March T outward over f==INSIDE; negate flips processed points."""
    processed = []
    while True:
        p = heap.pop()
        if p is None:
            break
        ii, jj = p
        f[ii, jj] = 3 if negate else KNOWN  # CHANGE=3 during the negate pass
        if negate:
            processed.append((ii, jj))
        for q in range(4):
            i, j = ii + _DI[q], jj + _DJ[q]
            if i <= 0 or j <= 0 or i > rows - 2 or j > cols - 2:
                continue
            if f[i, j] == INSIDE:
                dist = min(
                    _fmm_solve(i - 1, j, i, j - 1, f, t),
                    _fmm_solve(i + 1, j, i, j - 1, f, t),
                    _fmm_solve(i - 1, j, i, j + 1, f, t),
                    _fmm_solve(i + 1, j, i, j + 1, f, t),
                )
                t[i, j] = dist
                f[i, j] = BAND
                heap.push(float(dist), i, j)
    if negate:
        for i, j in processed:
            f[i, j] = KNOWN
            t[i, j] = -t[i, j]


def _grad_t(f, t, i, j):
    """cv2's gradT: central (×0.5) when both neighbors known, one-sided else."""
    if f[i, j + 1] != INSIDE:
        if f[i, j - 1] != INSIDE:
            gx = (t[i, j + 1] - t[i, j - 1]) * _F32(0.5)
        else:
            gx = t[i, j + 1] - t[i, j]
    else:
        if f[i, j - 1] != INSIDE:
            gx = t[i, j] - t[i, j - 1]
        else:
            gx = _F32(0.0)
    if f[i + 1, j] != INSIDE:
        if f[i - 1, j] != INSIDE:
            gy = (t[i + 1, j] - t[i - 1, j]) * _F32(0.5)
        else:
            gy = t[i + 1, j] - t[i, j]
    else:
        if f[i - 1, j] != INSIDE:
            gy = t[i, j] - t[i - 1, j]
        else:
            gy = _F32(0.0)
    return gx, gy


def _telea_paint(f, t, out, rng, heap, rows, cols):
    """Main Telea FMM: pop, relax+paint INSIDE neighbors, push."""
    while True:
        p = heap.pop()
        if p is None:
            break
        ii, jj = p
        f[ii, jj] = KNOWN
        for q in range(4):
            i, j = ii + _DI[q], jj + _DJ[q]
            if i <= 1 or j <= 1 or i > rows - 2 or j > cols - 2:
                continue
            if f[i, j] == INSIDE:
                dist = min(
                    _fmm_solve(i - 1, j, i, j - 1, f, t),
                    _fmm_solve(i + 1, j, i, j - 1, f, t),
                    _fmm_solve(i - 1, j, i, j + 1, f, t),
                    _fmm_solve(i + 1, j, i, j + 1, f, t),
                )
                t[i, j] = dist
                # ---- paint pixel (i, j) from its known neighborhood ----
                gtx, gty = _grad_t(f, t, i, j)
                ia = _F32(0.0)
                s = _F32(1.0e-20)
                jx = _F32(0.0)
                jy = _F32(0.0)
                for k in range(i - rng, i + rng + 1):
                    km = k - 1 + (k == 1)
                    kp = k - 1 - (k == rows - 2)
                    for l in range(j - rng, j + rng + 1):
                        lm = l - 1 + (l == 1)
                        lp = l - 1 - (l == cols - 2)
                        if (
                            k > 0
                            and l > 0
                            and k < rows - 1
                            and l < cols - 1
                            and f[k, l] != INSIDE
                            and (i - k) * (i - k) + (j - l) * (j - l)
                            <= rng * rng
                        ):
                            ry = _F32(i - k)
                            rx = _F32(j - l)
                            r2 = rx * rx + ry * ry
                            dst = _F32(1.0) / _F32(
                                r2 * np.sqrt(np.float64(r2), dtype=np.float64)
                            )
                            lev = _F32(1.0) / (
                                _F32(1.0) + _F32(abs(t[k, l] - t[i, j]))
                            )
                            drc = rx * gtx + ry * gty
                            if abs(drc) <= 0.01:
                                drc = _F32(1.0e-6)
                            w = _F32(abs(dst * lev * drc))
                            # gradI on the working image (one-sided/central
                            # with the boundary-shifted km/kp, lm/lp indices)
                            if f[k, l + 1] != INSIDE and f[k, l - 1] != INSIDE:
                                gix = _F32(
                                    (
                                        int(out[km, lp + 1])
                                        - int(out[km, lm - 1])
                                    )
                                ) * _F32(2.0)
                            elif f[k, l + 1] != INSIDE:
                                gix = _F32(int(out[km, lp + 1]) - int(out[km, lm]))
                            elif f[k, l - 1] != INSIDE:
                                gix = _F32(int(out[km, lp]) - int(out[km, lm - 1]))
                            else:
                                gix = _F32(0.0)
                            if f[k + 1, l] != INSIDE and f[k - 1, l] != INSIDE:
                                giy = _F32(
                                    (
                                        int(out[kp + 1, lm])
                                        - int(out[km - 1, lm])
                                    )
                                ) * _F32(2.0)
                            elif f[k + 1, l] != INSIDE:
                                giy = _F32(int(out[kp + 1, lm]) - int(out[km, lm]))
                            elif f[k - 1, l] != INSIDE:
                                giy = _F32(int(out[kp, lm]) - int(out[km - 1, lm]))
                            else:
                                giy = _F32(0.0)
                            ia = ia + w * _F32(out[km, lm])
                            jx = jx - w * gix * rx
                            jy = jy - w * giy * ry
                            s = s + w
                sat = ia / s + (jx + jy) / (
                    _F32(np.sqrt(_F32(jx * jx + jy * jy), dtype=np.float32))
                    + _F32(1.0e-20)
                ) + _F32(0.5)
                out[i - 1, j - 1] = np.uint8(np.clip(int(sat), 0, 255))
                f[i, j] = BAND
                heap.push(float(dist), i, j)


def inpaint_telea(img: np.ndarray, mask: np.ndarray, radius: float = 3.0):
    """``cv2.inpaint(img, mask, radius, INPAINT_TELEA)`` — grayscale u8."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise TypeError("inpaint oracle: 2-D uint8 only (extend for color)")
    rng = max(1, min(100, int(round(radius))))
    rows, cols = img.shape[0] + 2, img.shape[1] + 2

    m = np.zeros((rows, cols), np.uint8)
    m[1:-1, 1:-1] = (np.asarray(mask) != 0).astype(np.uint8) * INSIDE
    f = m.copy()
    t = np.full((rows, cols), 1.0e6, np.float32)

    cross = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.uint8)
    band = _dilate(m, cross)
    band = np.where(band > m, band - m, 0).astype(np.uint8)  # cvSub saturates
    band[0, :] = band[-1, :] = 0
    band[:, 0] = band[:, -1] = 0
    f[band > 0] = BAND
    t[band > 0] = 0.0  # the T array must agree with the heap's T=0 entries

    heap = _Heap()
    heap.add_band(band)

    rect = np.ones((2 * rng + 1, 2 * rng + 1), np.uint8)
    ring = _dilate(m, rect)
    ring = np.where(ring > m, ring - m, 0).astype(np.uint8)
    fout = np.where(ring > 0, np.uint8(INSIDE), np.uint8(KNOWN))
    # band points live inside the ring; march outward then negate
    _calc_fmm(fout, t, heap, True, rows, cols)

    heap = _Heap()
    heap.add_band(band)
    out = img.copy()
    _telea_paint(f, t, out, rng, heap, rows, cols)
    return out
