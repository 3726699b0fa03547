"""integral / meanStdDev / compareHist / applyColorMap parity."""

import numpy as np
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_integral_ref_vs_cv2(dt):
    rng = np.random.default_rng(hash(("int", dt.__name__)) % 2**31)
    for t in range(15):
        H, W = int(rng.integers(2, 40)), int(rng.integers(2, 40))
        img = ((rng.random((H, W)) * 300 - 100).astype(np.float32)
               if dt is np.float32 else rng.integers(0, 200, (H, W)).astype(dt))
        ws, wq = cv2.integral2(img)
        gs, gq = ref.integral(img, sq=True)
        assert gs.dtype == ws.dtype
        assert np.allclose(gs, ws) and np.allclose(gq, wq)


def test_integral_device():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (30, 40), np.uint8)
    want = cv2.integral(img)
    got = np.asarray(ie.integral(jnp.asarray(img)))[0]
    assert got.dtype == np.int32 and np.array_equal(got, want)
    # u16: f32 sums at relative tolerance
    u16 = rng.integers(0, 65536, (30, 40), np.uint16)
    w = cv2.integral(u16)
    g = np.asarray(ie.integral(jnp.asarray(u16)))[0]
    assert np.allclose(g, w, rtol=1e-6)


def test_mean_std_dev():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (33, 41), np.uint8)
    m, s = ie.mean_std_dev(img)
    wm, ws = cv2.meanStdDev(img)
    assert abs(m - wm[0, 0]) < 1e-12 and abs(s - ws[0, 0]) < 1e-12


@pytest.mark.parametrize("method,flag", [
    ("correl", cv2.HISTCMP_CORREL), ("chisqr", cv2.HISTCMP_CHISQR),
    ("intersect", cv2.HISTCMP_INTERSECT),
    ("bhattacharyya", cv2.HISTCMP_BHATTACHARYYA)])
def test_compare_hist(method, flag):
    rng = np.random.default_rng(hash(method) % 2**31)
    for t in range(20):
        h1 = (rng.random(256) * 100).astype(np.float32)
        h2 = (rng.random(256) * 100).astype(np.float32)
        w = cv2.compareHist(h1, h2, flag)
        g = ie.compare_hist(h1, h2, method)
        assert abs(w - g) <= 1e-9 * max(1, abs(w))


def test_colormaps_bitwise():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 23), np.uint8)
    for nm, code in [("jet", cv2.COLORMAP_JET), ("viridis", cv2.COLORMAP_VIRIDIS),
                     ("turbo", cv2.COLORMAP_TURBO), ("bone", cv2.COLORMAP_BONE),
                     ("twilight", cv2.COLORMAP_TWILIGHT)]:
        want = cv2.applyColorMap(img, code)[:, :, ::-1]   # BGR -> RGB
        assert np.array_equal(ref.apply_color_map(img, nm), want), nm
        got = np.asarray(ie.apply_color_map(jnp.asarray(img), nm))[0]
        assert np.array_equal(got, want), nm


def test_rejects():
    with pytest.raises(ValueError):
        ref.apply_color_map(np.zeros((4, 4), np.uint8), "nope")
    with pytest.raises(ValueError):
        ie.compare_hist(np.zeros(4), np.zeros(4), "l2")
    with pytest.raises(TypeError):
        ie.apply_color_map(jnp.zeros((4, 4), jnp.uint16))
