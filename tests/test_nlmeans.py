"""cv2.fastNlMeansDenoising(+Colored) parity — BIT-EXACT
(docs/PARITY.md pins the weight LUT: round(FPM*exp(-SSD*scale/(h^2*cn)))
with FPM = INT_MAX//(s^2*255), cn-independent; Colored = linear-RGB Lab
split, L with h, (a,b) as one 2-channel vector image with h_color)."""

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
    # u16 is now supported, but only with cv2's NORM_L1 constraint
    with pytest.raises(ValueError):
        ie.fast_nl_means_denoising(jnp.zeros((8, 8), jnp.uint16))  # l2 default
    with pytest.raises(TypeError):
        ie.fast_nl_means_denoising(jnp.zeros((8, 8), jnp.int16), norm_type="l1")
    with pytest.raises(ValueError):
        ie.fast_nl_means_denoising(jnp.zeros((8, 8), jnp.uint8), 10.0, 4, 21)
    with pytest.raises(TypeError):
        ie.fast_nl_means_denoising_colored(jnp.zeros((8, 8, 3), jnp.uint16))
    with pytest.raises(ValueError):
        ie.fast_nl_means_denoising_colored(jnp.zeros((8, 8, 4), jnp.uint8))


def _noisy_c(rng, H, W, cn, sigma):
    return np.dstack([_noisy(rng, H, W, sigma) for _ in range(cn)])


@pytest.mark.parametrize("cn", [2, 3, 4])
def test_ref_multichannel_vs_cv2(cn):
    """Vector-pixel semantics: joint SSD, shared weight, FPM sans cn."""
    rng = np.random.default_rng(seed("nlmc", cn))
    for trial in range(6):
        t, s = [(3, 9), (5, 15), (7, 21), (7, 9), (3, 21), (5, 9)][trial]
        H, W = int(rng.integers(14, 40)), int(rng.integers(14, 40))
        img = _noisy_c(rng, H, W, cn, rng.uniform(3, 30))
        h = float(rng.uniform(3, 45))
        want = cv2.fastNlMeansDenoising(img, None, h, t, s)
        if want.ndim == 2:
            want = want[..., None]
        got = ref.fast_nl_means_denoising(img, h, t, s)
        assert np.array_equal(got, want), (H, W, h, t, s, cn)


def test_device_multichannel_vs_cv2():
    rng = np.random.default_rng(seed("nlmcdev"))
    for trial, cn in enumerate((2, 3, 4)):
        t, s = [(3, 9), (5, 15), (7, 9)][trial]
        img = _noisy_c(rng, 30, 34, cn, 15)
        h = float(rng.uniform(4, 30))
        want = cv2.fastNlMeansDenoising(img, None, h, t, s)
        got = np.asarray(ie.fast_nl_means_denoising(jnp.asarray(img), h, t, s))
        assert np.array_equal(got, want), (h, t, s, cn)


@pytest.mark.parametrize("t,s", [(3, 9), (7, 21)])
def test_ref_colored_vs_cv2(t, s):
    rng = np.random.default_rng(seed("nlmcol", t, s))
    for trial in range(4):
        H, W = int(rng.integers(16, 40)), int(rng.integers(16, 40))
        img = _noisy_c(rng, H, W, 3, rng.uniform(5, 25))
        h, hc = float(rng.uniform(3, 25)), float(rng.uniform(3, 25))
        want = cv2.fastNlMeansDenoisingColored(img, None, h, hc, t, s)
        got = ref.fast_nl_means_denoising_colored(img, h, hc, t, s, order="bgr")
        assert np.array_equal(got, want), (H, W, h, hc)


@pytest.mark.parametrize("cn", [1, 3])
def test_ref_multi_vs_cv2(cn):
    """Temporal NLMeans: search set = T*s^2, FPM = INT_MAX//(T*s^2*255)."""
    rng = np.random.default_rng(seed("nlmmulti", cn))
    for trial in range(4):
        t, s = [(3, 9), (7, 21), (5, 15), (5, 9)][trial]
        idx, tw = [(1, 3), (2, 5), (3, 3), (2, 3)][trial]
        H, W = int(rng.integers(14, 36)), int(rng.integers(14, 36))
        frames = [_noisy_c(rng, H, W, cn, 15) if cn > 1 else _noisy(rng, H, W, 15)
                  for _ in range(6)]
        frames = [np.ascontiguousarray(f) for f in frames]
        h = float(rng.uniform(3, 40))
        want = cv2.fastNlMeansDenoisingMulti(frames, idx, tw, None, h, t, s)
        got = ref.fast_nl_means_denoising_multi(frames, idx, tw, h, t, s)
        assert np.array_equal(got, want), (H, W, h, t, s, idx, tw, cn)


def test_device_multi_vs_cv2():
    rng = np.random.default_rng(seed("nlmmultidev"))
    frames = [_noisy(rng, 26, 30, 14) for _ in range(5)]
    want = cv2.fastNlMeansDenoisingMulti(frames, 2, 3, None, 12.0, 5, 9)
    got = np.asarray(ie.fast_nl_means_denoising_multi(
        jnp.stack(frames), 2, 3, 12.0, 5, 9))
    assert np.array_equal(got, want)
    # multichannel temporal window + list-of-frames input
    cf = [_noisy_c(rng, 22, 26, 3, 12) for _ in range(5)]
    want = cv2.fastNlMeansDenoisingMulti(cf, 1, 3, None, 20.0, 3, 9)
    got = np.asarray(ie.fast_nl_means_denoising_multi(cf, 1, 3, 20.0, 3, 9))
    assert np.array_equal(got, want)


def test_device_colored_multi_vs_cv2():
    rng = np.random.default_rng(seed("nlmcmdev"))
    cf = [_noisy_c(rng, 24, 28, 3, 16) for _ in range(5)]
    want = cv2.fastNlMeansDenoisingColoredMulti(cf, 2, 5, None, 8.0, 12.0, 5, 9)
    got = np.asarray(ie.fast_nl_means_denoising_colored_multi(
        jnp.stack(cf), 2, 5, 8.0, 12.0, 5, 9, order="bgr"))
    assert np.array_equal(got, want)


def test_multi_rejects():
    frames = jnp.zeros((5, 12, 12), jnp.uint8)
    with pytest.raises(ValueError):   # even temporal window
        ie.fast_nl_means_denoising_multi(frames, 2, 2, 10.0)
    with pytest.raises(ValueError):   # window exceeds the list
        ie.fast_nl_means_denoising_multi(frames, 0, 3, 10.0)
    with pytest.raises(TypeError):
        ie.fast_nl_means_denoising_multi(frames.astype(jnp.uint16), 2, 3)


def test_device_colored_vs_cv2():
    rng = np.random.default_rng(seed("nlmcoldev"))
    img = _noisy_c(rng, 32, 36, 3, 18)
    want = cv2.fastNlMeansDenoisingColored(img, None, 10.0, 10.0, 7, 21)
    got = np.asarray(ie.fast_nl_means_denoising_colored(
        jnp.asarray(img), 10.0, 10.0, 7, 21, order="bgr"))
    assert np.array_equal(got, want)
    # batched path: both images must match their single-image results
    two = np.stack([img, img[::-1].copy()])
    ref_each = np.stack([
        cv2.fastNlMeansDenoisingColored(two[i], None, 5.0, 14.0, 3, 9)
        for i in range(2)])
    got2 = np.asarray(ie.fast_nl_means_denoising_colored(
        jnp.asarray(two), 5.0, 14.0, 3, 9, order="bgr"))
    assert np.array_equal(got2, ref_each)


@pytest.mark.parametrize("cn", [1, 3])
def test_l1_norm_vs_cv2(cn):
    """NORM_L1: SAD distance, weight exp(-SAD^2/(h^2*cn)) — pinned."""
    rng = np.random.default_rng(seed("nlml1", cn))
    for trial in range(5):
        t, s = [(3, 9), (5, 15), (7, 21), (7, 9), (5, 9)][trial]
        h = float(rng.uniform(3, 50))
        img = _noisy_c(rng, 30, 34, cn, 18) if cn > 1 else _noisy(rng, 30, 34, 18)
        want = cv2.fastNlMeansDenoising(img, np.array([h], np.float32), None,
                                        t, s, cv2.NORM_L1)
        if want.ndim == 2:
            want = want[..., None]
        got = ref.fast_nl_means_denoising(img, h, t, s, norm_type="l1")
        if got.ndim == 2:
            got = got[..., None]
        assert np.array_equal(got, want), (cn, h, t, s)
    # device path
    got_dev = np.asarray(ie.fast_nl_means_denoising(
        jnp.asarray(img), h, t, s, norm_type="l1"))
    if got_dev.ndim == 2:
        got_dev = got_dev[..., None]
    assert np.array_equal(got_dev, want)
    with pytest.raises(ValueError):
        ie.fast_nl_means_denoising(jnp.zeros((8, 8), jnp.uint8), 10.0,
                                   norm_type="l3")


def test_u16_l1_vs_cv2():
    """16-bit NLMeans (cv2 supports u16 only with NORM_L1): FPM caps at
    INT_MAX (int64 accumulators) — bit-exact up to rare quotient ties
    (±1; LUT entries at INT_MAX scale can differ by one unit)."""
    rng = np.random.default_rng(seed("nlmu16"))
    worst = 0
    for trial in range(6):
        cn = [1, 2, 3][trial % 3]
        img = np.clip(rng.normal(rng.uniform(8000, 55000),
                                 rng.uniform(2000, 15000),
                                 (26, 28, cn)).squeeze(), 0, 65535).astype(np.uint16)
        h = float(rng.uniform(300, 8000))
        t, s = [(3, 9), (5, 15), (7, 21)][trial % 3]
        want = cv2.fastNlMeansDenoising(img, np.array([h], np.float32), None,
                                        t, s, cv2.NORM_L1)
        got = ref.fast_nl_means_denoising(img, h, t, s, norm_type="l1")
        if want.ndim == 2:
            want = want[..., None]
        if got.ndim == 2:
            got = got[..., None]
        worst = max(worst, int(np.abs(got.astype(np.int64)
                                      - want.astype(np.int64)).max()))
    assert worst <= 1, worst
    with pytest.raises(TypeError):   # u16 requires L1, like cv2
        ref.fast_nl_means_denoising(img, h, t, s, norm_type="l2")


def test_device_u16_l1_bitexact():
    """Device u16-L1 path (s64 accumulation under enable_x64) ==
    oracle == cv2 bitwise."""
    rng = np.random.default_rng(seed("nlmu16dev"))
    for cn in (1, 3):
        shape = (36, 40) if cn == 1 else (36, 40, cn)
        img = rng.integers(0, 65536, shape).astype(np.uint16)
        want = ref.fast_nl_means_denoising(img, 900.0, 5, 9, "l1")
        got = np.asarray(ie.fast_nl_means_denoising(img, 900.0, 5, 9,
                                                    norm_type="l1"))
        assert np.array_equal(got, want), cn
    img = np.clip(rng.normal(30000, 4000, (40, 44)), 0, 65535).astype(np.uint16)
    want = cv2.fastNlMeansDenoising(img, [800.0], None, 5, 9, cv2.NORM_L1)
    got = np.asarray(ie.fast_nl_means_denoising(img, 800.0, 5, 9,
                                                norm_type="l1"))
    assert np.array_equal(got, want)
    with pytest.raises(ValueError):
        ie.fast_nl_means_denoising(img, 800.0, 5, 9, norm_type="l2")
