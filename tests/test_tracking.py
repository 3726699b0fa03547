"""cv2.meanShift / CamShift / kernel-builder parity
(docs/PARITY.md "Tracking windows")."""

import numpy as np

from detseed import seed
import pytest

import imageenhancement_mp_tpu as ie

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _prob(rng):
    H, W = int(rng.integers(30, 100)), int(rng.integers(30, 100))
    cx, cy = int(rng.integers(5, W - 5)), int(rng.integers(5, H - 5))
    yy, xx = np.mgrid[0:H, 0:W]
    p = np.clip(255 * np.exp(-(((xx - cx) / rng.uniform(3, 10)) ** 2
                               + ((yy - cy) / rng.uniform(3, 10)) ** 2)),
                0, 255).astype(np.uint8)
    if rng.random() < 0.3:
        p = rng.integers(0, 256, (H, W), np.uint8)
    win = (int(rng.integers(0, W - 10)), int(rng.integers(0, H - 10)),
           int(rng.integers(5, 15)), int(rng.integers(5, 15)))
    crit = (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS,
            int(rng.integers(1, 20)), float(rng.choice([0.5, 1.0, 2.0])))
    return p, win, crit


def test_mean_shift_bitwise():
    rng = np.random.default_rng(seed("track-ms"))
    for _ in range(80):
        p, win, crit = _prob(rng)
        wi, wwin = cv2.meanShift(p, win, crit)
        gi, gwin = ie.mean_shift(p, win, crit[1], crit[2])
        assert (wi, tuple(wwin)) == (gi, gwin)


def test_cam_shift_box_exact_window_budget():
    rng = np.random.default_rng(seed("track-cs"))
    nwin = ntot = 0
    for _ in range(80):
        p, win, crit = _prob(rng)
        wbox, wwin = cv2.CamShift(p, win, crit)
        gbox, gwin = ie.cam_shift(p, win, crit[1], crit[2])
        # size and angle: f32 exact always
        assert abs(wbox[1][0] - gbox[1][0]) <= 1e-4
        assert abs(wbox[1][1] - gbox[1][1]) <= 1e-4
        assert abs(((wbox[2] - gbox[2]) + 90) % 180 - 90) <= 1e-4
        ntot += 1
        if tuple(wwin) == gwin:
            nwin += 1
            # center = updated-window center: exact when windows match
            assert abs(wbox[0][0] - gbox[0][0]) <= 1e-4
            assert abs(wbox[0][1] - gbox[0][1]) <= 1e-4
        else:  # documented window-extent budget
            assert abs(wwin[2] - gwin[2]) <= 8 and abs(wwin[3] - gwin[3]) <= 8
            assert abs(wbox[0][0] - gbox[0][0]) <= 4
            assert abs(wbox[0][1] - gbox[0][1]) <= 4
    assert nwin / ntot > 0.8, (nwin, ntot)


def test_kernel_builders_bitwise():
    for k in (1, 3, 5, 7, 9, 15, 31):
        for s in (0.0, 0.8, 1.5, 3.0):
            w = cv2.getGaussianKernel(k, s)
            g = ie.get_gaussian_kernel(k, s)
            if s <= 0 and k <= 9:
                assert np.array_equal(g, w)  # fixed tables: bit-exact
            else:  # cv2's softdouble exp/normalize: <=2 ulp per tap
                assert np.abs(g - w).max() <= 2 * np.spacing(w).max()
    for ks in (-1, 1, 3, 5, 7, 9, 31):
        for dx in range(4):
            for dy in range(4):
                for nm in (False, True):
                    try:
                        wx, wy = cv2.getDerivKernels(dx, dy, ks,
                                                     normalize=nm)
                    except cv2.error:
                        continue
                    try:
                        gx, gy = ie.get_deriv_kernels(dx, dy, ks, nm)
                    except ValueError:
                        continue
                    assert np.array_equal(wx.astype(np.float32), gx)
                    assert np.array_equal(wy.astype(np.float32), gy)


def test_back_project_to_mean_shift_chain():
    # histogram back-projection (device op) feeding meanShift
    rng = np.random.default_rng(seed("track-chain"))
    img = rng.integers(0, 256, (80, 100), np.uint8)
    roi = img[30:50, 40:70]
    hist = cv2.calcHist([roi], [0], None, [32], [0, 256])
    want_bp = cv2.calcBackProject([img], [0], hist, [0, 256], 1)
    got_bp = np.asarray(ie.calc_back_project(img, hist.reshape(-1)))
    assert np.array_equal(got_bp, want_bp)
    crit = (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 10, 1.0)
    wi, wwin = cv2.meanShift(want_bp, (10, 10, 30, 25), crit)
    gi, gwin = ie.mean_shift(got_bp, (10, 10, 30, 25), 10, 1.0)
    assert (wi, tuple(wwin)) == (gi, gwin)
