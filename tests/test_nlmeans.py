"""cv2.fastNlMeansDenoising parity — BIT-EXACT (docs/PARITY.md pins
the weight LUT: round(FPM*exp(-SSD*scale/h^2)), denominator h^2)."""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _noisy(rng, H, W, sigma):
    yy, xx = np.mgrid[0:H, 0:W]
    base = 128 + 60 * np.sin(yy / rng.uniform(3, 8)) + 50 * np.cos(xx / rng.uniform(4, 9))
    return np.clip(base + rng.normal(0, sigma, (H, W)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("t,s", [(3, 9), (5, 15), (7, 21)])
def test_ref_vs_cv2(t, s):
    rng = np.random.default_rng(seed("nlm", t, s))
    for trial in range(8):
        H, W = int(rng.integers(14, 44)), int(rng.integers(14, 44))
        img = _noisy(rng, H, W, rng.uniform(3, 25))
        h = float(rng.uniform(3, 25))
        want = cv2.fastNlMeansDenoising(img, None, h, t, s)
        got = ref.fast_nl_means_denoising(img, h, t, s)
        assert np.array_equal(got, want), (H, W, h)


def test_pure_noise_and_constant():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 26), np.uint8)   # pure noise: near-identity
    assert np.array_equal(ref.fast_nl_means_denoising(img, 10.0),
                          cv2.fastNlMeansDenoising(img, None, 10, 7, 21))
    c = np.full((20, 20), 255, np.uint8)             # overflow edge case
    assert np.array_equal(ref.fast_nl_means_denoising(c, 10.0),
                          cv2.fastNlMeansDenoising(c, None, 10, 7, 21))
    got = np.asarray(ie.fast_nl_means_denoising(jnp.asarray(c), 10.0))
    assert (got == 255).all()


def test_device_vs_cv2():
    rng = np.random.default_rng(3)
    for trial in range(4):
        H, W = int(rng.integers(16, 40)), int(rng.integers(16, 40))
        img = _noisy(rng, H, W, 12)
        h = float(rng.uniform(4, 20))
        t, s = [(3, 9), (5, 15), (7, 21), (7, 9)][trial]
        want = cv2.fastNlMeansDenoising(img, None, h, t, s)
        got = np.asarray(ie.fast_nl_means_denoising(jnp.asarray(img), h, t, s))
        assert np.array_equal(got, want), (H, W, h, t, s)


def test_rejects():
    with pytest.raises(TypeError):
        ie.fast_nl_means_denoising(jnp.zeros((8, 8), jnp.uint16))
    with pytest.raises(ValueError):
        ie.fast_nl_means_denoising(jnp.zeros((8, 8), jnp.uint8), 10.0, 4, 21)
