"""cv2.Canny parity — bit-exact (docs/PARITY.md): replicate-border
Sobel, ap-7 1/16 scaling, fixed-point NMS, 8-connected hysteresis."""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.ops.canny import canny_planes

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


@pytest.mark.parametrize("ap", [3, 5, 7])
@pytest.mark.parametrize("l2", [False, True])
def test_ref_vs_cv2(ap, l2):
    rng = np.random.default_rng(seed("canny", ap, l2))
    for t in range(25):
        H, W = int(rng.integers(8, 70)), int(rng.integers(8, 70))
        img = rng.integers(0, 256, (H, W), np.uint8)
        t1, t2 = sorted(rng.uniform(5, 300, 2))
        want = cv2.Canny(img, t1, t2, apertureSize=ap, L2gradient=l2)
        got = ref.canny(img, t1, t2, ap, l2)
        assert np.array_equal(got, want), (H, W, t1, t2)


def test_extreme_contrast_ap7():
    rng = np.random.default_rng(9)
    for t in range(10):
        H, W = int(rng.integers(16, 50)), int(rng.integers(16, 50))
        img = (rng.integers(0, 2, (H // 4 + 1, W // 4 + 1)) * 255).astype(np.uint8)
        img = np.kron(img, np.ones((4, 4), np.uint8))[:H, :W]
        t1, t2 = sorted(rng.uniform(5, 300, 2))
        want = cv2.Canny(img, t1, t2, apertureSize=7, L2gradient=bool(t % 2))
        got = ref.canny(img, t1, t2, 7, bool(t % 2))
        assert np.array_equal(got, want)


@pytest.mark.parametrize("ap", [3, 5, 7])
def test_device_vs_cv2(ap):
    rng = np.random.default_rng(31 + ap)
    for t in range(4):
        H, W = int(rng.integers(12, 60)), int(rng.integers(12, 60))
        img = rng.integers(0, 256, (H, W), np.uint8)
        t1, t2 = sorted(rng.uniform(10, 250, 2))
        want = cv2.Canny(img, t1, t2, apertureSize=ap, L2gradient=bool(t % 2))
        got = np.asarray(canny_planes(jnp.asarray(img)[None], t1, t2, ap, bool(t % 2)))[0]
        assert np.array_equal(got, want), (H, W, ap)


def test_api_batch_and_rejects():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (2, 30, 40), np.uint8)
    out = np.asarray(ie.canny(jnp.asarray(img), 60, 160))
    for b in range(2):
        assert np.array_equal(out[b], cv2.Canny(img[b], 60, 160))
    with pytest.raises(TypeError):
        ie.canny(jnp.zeros((4, 4), jnp.uint16), 50, 150)
    with pytest.raises(ValueError):
        ie.canny(jnp.zeros((4, 4), jnp.uint8), 50, 150, aperture_size=4)


def test_hysteresis_connects_weak_chain():
    # weak ridge connected to one strong pixel must fully light up
    img = np.zeros((9, 30), np.uint8)
    img[4, :] = 120
    img[4, 25] = 250
    got = ref.canny(img, 100, 400)
    want = cv2.Canny(img, 100, 400)
    assert np.array_equal(got, want)
