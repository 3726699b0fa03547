"""seamlessClone: mathematically-defined contract (cv2's own output is racy)."""

import numpy as np
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu.ref.seamless import _poisson_dirichlet, seamless_clone
from detseed import seed

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def test_poisson_solver_exact():
    rng = np.random.default_rng(seed("seamless", "poisson"))
    f = rng.standard_normal((18, 25))
    lap = np.zeros_like(f)
    lap[1:-1, 1:-1] = (f[2:, 1:-1] + f[:-2, 1:-1] + f[1:-1, 2:]
                       + f[1:-1, :-2] - 4 * f[1:-1, 1:-1])
    assert np.abs(_poisson_dirichlet(lap, f) - f).max() < 1e-10


def test_identity_clone():
    rng = np.random.default_rng(seed("seamless", "id"))
    img = rng.integers(0, 256, (40, 50, 3), np.uint8)
    mask = np.zeros((40, 50), np.uint8)
    mask[10:25, 12:30] = 255
    out = seamless_clone(img, img, mask, (21, 17))
    assert np.array_equal(out, img)
    dev = np.asarray(ie.seamless_clone(img, img, mask, (21, 17)))
    assert np.abs(dev.astype(int) - img.astype(int)).max() <= 1


def test_device_tracks_oracle_and_cv2_spread():
    rng = np.random.default_rng(seed("seamless", "dev"))
    src = cv2.GaussianBlur(rng.integers(0, 256, (40, 50, 3), np.uint8), (5, 5), 0)
    dst = cv2.GaussianBlur(rng.integers(0, 256, (60, 70, 3), np.uint8), (7, 7), 0)
    mask = np.zeros((40, 50), np.uint8)
    mask[8:30, 10:40] = 255
    p = (35, 30)
    want = seamless_clone(src, dst, mask, p)
    got = np.asarray(ie.seamless_clone(src, dst, mask, p))
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 2 and d.mean() < 0.05, (d.max(), d.mean())
    # untouched outside the ROI
    m2 = np.zeros(dst.shape[:2], bool)
    m2[30 - 11:30 + 11, 35 - 15:35 + 15] = True
    assert np.array_equal(got[~m2], dst[~m2])
    # cv2 budget: our output sits within cv2's own run-to-run spread class
    w1 = cv2.seamlessClone(src, dst, mask, p, cv2.NORMAL_CLONE)
    d = np.abs(got.astype(int) - w1.astype(int))
    assert d.mean() <= 6.0, d.mean()


def test_rejects_and_empty():
    img = np.zeros((20, 20), np.uint8)
    out = np.asarray(ie.seamless_clone(img, img, np.zeros((20, 20), np.uint8), (10, 10)))
    assert np.array_equal(out, img)
    with pytest.raises(ValueError):
        ie.seamless_clone(img, img, np.full((20, 20), 255, np.uint8), (1, 1))
    with pytest.raises(ValueError):
        ie.seamless_clone(img, img, np.full((20, 20), 255, np.uint8), (10, 10), flags="mixed")
