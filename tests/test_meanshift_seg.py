"""cv2.pyrMeanShiftFiltering parity
(docs/PARITY.md "Mean-shift segmentation")."""

import numpy as np

from detseed import seed
import pytest

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _img(rng, lo=6, hi=70):
    H, W = int(rng.integers(lo, hi)), int(rng.integers(lo, hi))
    img = rng.integers(0, 256, (H, W, 3), np.uint8)
    r = rng.random()
    if r < 0.4:
        img = cv2.GaussianBlur(img, (5, 5), 0)
    elif r < 0.6:
        q = int(rng.integers(2, 64))
        img = (img // q * q).astype(np.uint8)
    return img


def _params(rng):
    sp = float(rng.uniform(0.5, 12))
    sr = float(rng.uniform(0.2, 80))
    ml = int(rng.integers(0, 4))
    mc = int(rng.choice([1, 3, 5, 8, 20]))
    eps = float(rng.uniform(0, 5))
    return sp, sr, ml, mc, eps


def test_ref_vs_cv2_bitwise():
    rng = np.random.default_rng(seed("pms-ref"))
    for _ in range(60):
        img = _img(rng)
        sp, sr, ml, mc, eps = _params(rng)
        tc = (cv2.TERM_CRITERIA_MAX_ITER + cv2.TERM_CRITERIA_EPS, mc, eps)
        want = cv2.pyrMeanShiftFiltering(img, sp, sr, maxLevel=ml, termcrit=tc)
        got = ref.pyr_mean_shift_filtering(img, sp, sr, ml, mc, eps)
        assert np.array_equal(got, want), (img.shape, sp, sr, ml, mc, eps)


def test_ref_defaults_and_edges():
    rng = np.random.default_rng(seed("pms-edge"))
    # cv2 default termcrit = (COUNT+EPS, 5, 1.0); tiny images; sr ties
    for H, W in [(6, 6), (7, 9), (8, 31), (33, 8)]:
        img = rng.integers(0, 256, (H, W, 3), np.uint8)
        for sp, sr, ml in [(2.0, 10.0, 1), (1.0, 4.0, 2), (5.0, 0.3, 1),
                           (3.5, 2.0, 0), (2.5, 16.0, 1)]:
            want = cv2.pyrMeanShiftFiltering(img, sp, sr, maxLevel=ml)
            got = ref.pyr_mean_shift_filtering(img, sp, sr, ml)
            assert np.array_equal(got, want), (H, W, sp, sr, ml)
    # constant image: everything converges instantly, still bitwise
    img = np.full((24, 20, 3), 77, np.uint8)
    want = cv2.pyrMeanShiftFiltering(img, 3.0, 10.0, maxLevel=2)
    got = ref.pyr_mean_shift_filtering(img, 3.0, 10.0, 2)
    assert np.array_equal(got, want)


def test_ref_rejects_bad_input():
    with pytest.raises(ValueError):
        ref.pyr_mean_shift_filtering(np.zeros((8, 8), np.uint8), 2, 10)
    with pytest.raises(ValueError):
        ref.pyr_mean_shift_filtering(np.zeros((8, 8, 3), np.float32), 2, 10)
    with pytest.raises(ValueError):
        ref.pyr_mean_shift_filtering(np.zeros((8, 8, 3), np.uint8), 2, 10,
                                     max_level=9)


def test_device_vs_oracle_bitwise():
    rng = np.random.default_rng(seed("pms-dev"))
    for _ in range(6):
        img = _img(rng, lo=10, hi=44)
        sp, sr, ml, mc, eps = _params(rng)
        want = ref.pyr_mean_shift_filtering(img, sp, sr, ml, mc, eps)
        got = np.asarray(ie.pyr_mean_shift_filtering(img, sp, sr, ml,
                                                     mc, eps))
        assert np.array_equal(got, want), (img.shape, sp, sr, ml, mc, eps)


def test_device_batch_and_razor_ties():
    rng = np.random.default_rng(seed("pms-batch"))
    # quantized images force equal-count windows → exercises the exact
    # cvRound(sum·(1./count)) tie path on device
    imgs = np.stack([(rng.integers(0, 256, (26, 30, 3), np.uint8)
                      // 32 * 32).astype(np.uint8) for _ in range(3)])
    got = np.asarray(ie.pyr_mean_shift_filtering(imgs, 2.0, 24.0, 1))
    for i in range(3):
        want = cv2.pyrMeanShiftFiltering(imgs[i], 2.0, 24.0, maxLevel=1)
        assert np.array_equal(got[i], want), i


def test_device_rejects_bad_input():
    with pytest.raises(ValueError):
        ie.pyr_mean_shift_filtering(np.zeros((8, 8, 4), np.uint8), 2, 10)
    with pytest.raises(TypeError):
        ie.pyr_mean_shift_filtering(np.zeros((8, 8, 3), np.int16), 2, 10)
