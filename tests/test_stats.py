"""integral / meanStdDev / compareHist / applyColorMap parity."""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_integral_ref_vs_cv2(dt):
    rng = np.random.default_rng(seed("int", dt.__name__))
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
    rng = np.random.default_rng(seed("compare_hist", method))
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


def test_sep_filter2d():
    rng = np.random.default_rng(11)
    for t in range(20):
        dt = [np.uint8, np.uint16, np.float32][t % 3]
        img = ((rng.random((20, 24)) * 300).astype(np.float32) if dt is np.float32
               else rng.integers(0, 250, (20, 24)).astype(dt))
        kx = rng.uniform(-1, 1, int(rng.choice([3, 5])))
        ky = rng.uniform(-1, 1, int(rng.choice([3, 5])))
        d = float(rng.uniform(-5, 5))
        want = cv2.sepFilter2D(img, -1, kx, ky, delta=d)
        got = ref.sep_filter2d(img, kx, ky, d)
        if dt is np.float32:
            assert np.abs(got - want).max() <= 1e-3 * max(1, np.abs(want).max())
        else:
            assert np.abs(got.astype(np.int64) - want.astype(np.int64)).max() <= 1


def test_box_filter_unnormalized():
    rng = np.random.default_rng(12)
    for t in range(15):
        dt = [np.uint8, np.uint16, np.int16][t % 3]
        img = rng.integers(0, 200, (int(rng.integers(5, 30)),
                                    int(rng.integers(5, 30)))).astype(dt)
        kh, kw = int(rng.choice([1, 3, 5])), int(rng.choice([1, 3, 5]))
        want = cv2.boxFilter(img, cv2.CV_32S, (kw, kh), normalize=False)
        assert np.array_equal(ref.box_filter(img, (kh, kw), normalize=False), want)
    got = np.asarray(ie.box_filter(jnp.asarray(img), (kh, kw), normalize=False))
    assert got.dtype == np.int32 and np.array_equal(got, want)


def test_calc_back_project():
    rng = np.random.default_rng(13)
    for t in range(15):
        img = rng.integers(0, 256, (12, 14), np.uint8)
        bins = int(rng.choice([16, 32, 64, 256]))
        hist = (rng.random(bins) * 300).astype(np.float32)
        sc = float(rng.uniform(0.1, 2))
        want = cv2.calcBackProject([img], [0], hist, [0, 256], scale=sc)
        assert np.array_equal(ref.calc_back_project(img, hist, sc), want)
        got = np.asarray(ie.calc_back_project(jnp.asarray(img), hist, sc))
        assert np.array_equal(got, want)


def test_psnr_and_norm():
    rng = np.random.default_rng(21)
    a = rng.integers(0, 256, (20, 24), np.uint8)
    b = rng.integers(0, 256, (20, 24), np.uint8)
    assert abs(ie.psnr(a, b) - cv2.PSNR(a, b)) < 1e-9
    assert ie.psnr(a, a) == float("inf")
    assert abs(ie.norm(a, "l2") - cv2.norm(a, cv2.NORM_L2)) < 1e-9
    assert abs(ie.norm(a, "l1", b) - cv2.norm(a, b, cv2.NORM_L1)) < 1e-9
    assert abs(ie.norm(a, "inf", b) - cv2.norm(a, b, cv2.NORM_INF)) < 1e-9
    with pytest.raises(ValueError):
        ie.norm(a, "l0")
