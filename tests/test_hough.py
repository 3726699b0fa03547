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


class TestHoughLinesP:
    def test_vs_cv2_bitwise(self):
        rng = np.random.default_rng(seed("houghp"))
        for trial in range(60):
            H, W = int(rng.integers(20, 110)), int(rng.integers(20, 110))
            img = np.zeros((H, W), np.uint8)
            for _ in range(int(rng.integers(0, 6))):
                p1 = (int(rng.integers(0, W)), int(rng.integers(0, H)))
                p2 = (int(rng.integers(0, W)), int(rng.integers(0, H)))
                cv2.line(img, p1, p2, 255, int(rng.integers(1, 3)))
            img[rng.random((H, W)) < float(rng.choice([0.0, 0.02]))] = 255
            rho = float(rng.choice([0.5, 1.0, 2.0]))
            theta = float(rng.choice([np.pi / 180, np.pi / 90]))
            th = int(rng.integers(3, 50))
            ll = int(rng.integers(0, 40))
            lg = int(rng.integers(0, 15))
            want = cv2.HoughLinesP(img, rho, theta, th,
                                   minLineLength=ll, maxLineGap=lg)
            want = (want.reshape(-1, 4) if want is not None
                    else np.zeros((0, 4), np.int32))
            got = ie.hough_lines_p(img, rho, theta, th, ll, lg)
            assert np.array_equal(got, want), (H, W, rho, theta, th, ll, lg)

    def test_finds_drawn_segment(self):
        img = np.zeros((80, 80), np.uint8)
        cv2.line(img, (10, 20), (70, 60), 255, 1)
        got = ie.hough_lines_p(img, 1, np.pi / 180, 30,
                               min_line_length=30, max_line_gap=2)
        assert len(got) >= 1
        x1, y1, x2, y2 = got[0]
        assert abs((y2 - y1) * 60 - (x2 - x1) * 40) <= 60 * 4  # same slope
