"""cv2.phaseCorrelate parity (docs/PARITY.md): pinned composition —
optimal-DFT-size zero pad, normalized cross-power spectrum, fftshift,
clamped 5x5 weighted centroid; sqrt-Hann window."""

import numpy as np

from detseed import seed
import pytest

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def test_hanning_window_vs_cv2():
    for hw in [(64, 80), (33, 47), (5, 8)]:
        want = cv2.createHanningWindow((hw[1], hw[0]), cv2.CV_64F)
        got = ref.create_hanning_window(hw)
        assert float(np.abs(got - want).max()) < 1e-14


def test_phase_correlate_vs_cv2():
    rng = np.random.default_rng(seed("phasecorr"))
    checked = 0
    for t in range(8):
        H, W = int(rng.integers(90, 200)), int(rng.integers(90, 200))
        big = cv2.GaussianBlur(
            rng.normal(120, 40, (H + 40, W + 40)).astype(np.float32),
            (0, 0), float(rng.uniform(1.0, 2.5)))
        dy, dx = int(rng.integers(0, 7)), int(rng.integers(0, 7))
        a = big[20:20 + H, 20:20 + W].astype(np.float64)
        b = big[20 + dy:20 + H + dy, 20 + dx:20 + W + dx].astype(np.float64)
        win = ref.create_hanning_window((H, W)) if t % 2 else None
        if win is None:
            (wx, wy), wr = cv2.phaseCorrelate(a, b)
        else:
            (wx, wy), wr = cv2.phaseCorrelate(a, b, win)
        (gx, gy), gr = ref.phase_correlate(a, b, win)
        if wr < 0.05:
            continue  # degenerate correlation: both results are noise
        checked += 1
        assert abs(wx - gx) < 2e-3 and abs(wy - gy) < 2e-3, (t, wx, gx, wy, gy)
        assert abs(wr - gr) < 1e-3
        # device path (f32 spectra): ~1e-2 px of the f64 oracle
        (dx2, dy2), r2 = ie.phase_correlate(a.astype(np.float32),
                                            b.astype(np.float32), win)
        assert abs(dx2 - gx) < 5e-2 and abs(dy2 - gy) < 5e-2, (t, dx2, gx)
    assert checked >= 3
