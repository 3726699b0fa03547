"""HoughLines — ref vs cv2 bitwise, device vs cv2 bitwise."""

import numpy as np
import pytest
from detseed import seed

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")


def _gen(rng):
    H, W = int(rng.integers(20, 90)), int(rng.integers(20, 90))
    img = np.zeros((H, W), np.uint8)
    for _ in range(int(rng.integers(1, 5))):
        cv2.line(img, (int(rng.integers(0, W)), int(rng.integers(0, H))),
                 (int(rng.integers(0, W)), int(rng.integers(0, H))), 255, 1)
    img[rng.random((H, W)) < 0.03] = 255
    rho = float(rng.choice([1.0, 2.0, 0.5]))
    th = float(rng.choice([np.pi / 180, np.pi / 90, np.pi / 360]))
    thr = int(rng.integers(10, 40))
    mint = float(rng.choice([0.0, 0.3]))
    maxt = float(rng.choice([np.pi, 2.0]))
    return img, rho, th, thr, mint, maxt


def _cv(img, rho, th, thr, mint, maxt):
    w = cv2.HoughLines(img, rho, th, thr, min_theta=mint, max_theta=maxt)
    return np.zeros((0, 2), np.float32) if w is None else w.reshape(-1, 2)


def test_ref_vs_cv2():
    rng = np.random.default_rng(seed("hough_ref"))
    for t in range(60):
        img, rho, th, thr, mint, maxt = _gen(rng)
        w = _cv(img, rho, th, thr, mint, maxt)
        g = ref.hough_lines(img, rho, th, thr, mint, maxt)
        assert g.shape == w.shape, t
        assert np.array_equal(g.view(np.int32), w.view(np.int32)), t


def test_device_vs_cv2():
    rng = np.random.default_rng(seed("hough_dev"))
    for t in range(10):
        img, rho, th, thr, mint, maxt = _gen(rng)
        w = _cv(img, rho, th, thr, mint, maxt)
        g = ie.hough_lines(img, rho, th, thr, mint, maxt)
        assert g.shape == w.shape, t
        assert np.array_equal(g.view(np.int32), w.view(np.int32)), t


def test_empty_and_simple():
    img = np.zeros((30, 30), np.uint8)
    assert ie.hough_lines(img, 1.0, np.pi / 180, 10).shape == (0, 2)
    img[5, 2:20] = 255
    g = ie.hough_lines(img, 1.0, np.pi / 180, 10)
    w = _cv(img, 1.0, np.pi / 180, 10, 0.0, np.pi)
    assert np.array_equal(g.view(np.int32), w.view(np.int32))
