"""cv2.undistort / initUndistortRectifyMap parity (docs/PARITY.md):
bit-exact for every dtype via cv2's quantized-map path (u8 int tab,
u16/i16/f32 float tab with sequential f32 accumulation); maps
bit-exact f32."""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _cam(rng, H, W):
    K = np.array([[W * 1.2, 0, W / 2 + rng.uniform(-3, 3)],
                  [0, W * 1.15, H / 2 + rng.uniform(-3, 3)], [0, 0, 1]])
    D = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.1, 0.1),
                  rng.uniform(-0.005, 0.005), rng.uniform(-0.005, 0.005),
                  rng.uniform(-0.03, 0.03)])
    return K, D


def test_maps_bitexact():
    rng = np.random.default_rng(0)
    for t in range(12):
        H, W = int(rng.integers(30, 90)), int(rng.integers(30, 90))
        K, D = _cam(rng, H, W)
        wx, wy = cv2.initUndistortRectifyMap(K, D, None, K, (W, H), cv2.CV_32FC1)
        gx, gy = ref.init_undistort_rectify_map(K, D, (H, W))
        assert np.array_equal(gx, wx) and np.array_equal(gy, wy), (H, W)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_undistort_ref_vs_cv2(dt):
    rng = np.random.default_rng(seed("und", dt.__name__))
    for t in range(12):
        H, W = int(rng.integers(40, 90)), int(rng.integers(40, 90))
        K, D = _cam(rng, H, W)
        if dt is np.float32:
            img = (rng.random((H, W)) * 400 - 100).astype(np.float32)
        else:
            lo, hi = (0, 256) if dt is np.uint8 else (
                (0, 65536) if dt is np.uint16 else (-32768, 32768))
            img = rng.integers(lo, hi, (H, W)).astype(dt)
        want = cv2.undistort(img, K, D)
        got = ref.undistort(img, K, D)
        assert np.array_equal(got, want), (H, W, dt)


def test_device_batch_rgb_bitexact():
    rng = np.random.default_rng(3)
    H, W = 48, 60
    K, D = _cam(rng, H, W)
    img = rng.integers(0, 256, (2, H, W, 3), np.uint8)
    got = np.asarray(ie.undistort(jnp.asarray(img), K, D))
    for b in range(2):
        assert np.array_equal(got[b], cv2.undistort(img[b], K, D))


def test_maps_feed_remap():
    """The map helper composes with ie.remap (the float path — higher
    precision than cv2.undistort's quantized internal)."""
    rng = np.random.default_rng(4)
    H, W = 40, 50
    K, D = _cam(rng, H, W)
    img = rng.integers(0, 256, (H, W), np.uint8)
    mx, my = ie.init_undistort_rectify_map(K, D, (H, W))
    got = np.asarray(ie.remap(jnp.asarray(img), mx, my))
    want = cv2.remap(img, mx, my, cv2.INTER_LINEAR)
    assert np.array_equal(got, want)
