"""Structuring elements, masked morphology, Gabor kernels,
cornerHarris (docs/PARITY.md)."""

import numpy as np
import pytest
from detseed import seed

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)

_SHAPES = {"rect": cv2.MORPH_RECT, "ellipse": cv2.MORPH_ELLIPSE,
           "cross": cv2.MORPH_CROSS}


def test_structuring_elements_bitexact():
    for rows in range(1, 16):
        for cols in range(1, 16):
            for nm, flag in _SHAPES.items():
                want = cv2.getStructuringElement(flag, (cols, rows))
                got = ref.get_structuring_element(nm, (rows, cols))
                assert np.array_equal(got, want), (nm, rows, cols)


@pytest.mark.parametrize("shape", ["ellipse", "cross"])
def test_masked_morphology_vs_cv2(shape):
    rng = np.random.default_rng(seed("masked_morphology", shape))
    ops = [("erode", None), ("dilate", None), ("open", cv2.MORPH_OPEN),
           ("close", cv2.MORPH_CLOSE), ("gradient", cv2.MORPH_GRADIENT),
           ("tophat", cv2.MORPH_TOPHAT), ("blackhat", cv2.MORPH_BLACKHAT)]
    for t in range(14):
        H, W = int(rng.integers(10, 40)), int(rng.integers(10, 40))
        dt = [np.uint8, np.uint16, np.int16, np.float32][t % 4]
        img = ((rng.random((H, W)) * 300).astype(np.float32) if dt is np.float32
               else rng.integers(0, 250, (H, W)).astype(dt))
        kr, kc = int(rng.integers(2, 8)), int(rng.integers(2, 8))
        kern = ref.get_structuring_element(shape, (kr, kc))
        cvk = cv2.getStructuringElement(_SHAPES[shape], (kc, kr))
        op, cvop = ops[t % len(ops)]
        if cvop is None:
            want = (cv2.erode if op == "erode" else cv2.dilate)(img, cvk)
        else:
            want = cv2.morphologyEx(img, cvop, cvk)
        got = ref.morphology(img, op, kernel=kern)
        assert np.array_equal(got, want), (op, kr, kc, dt)


def test_masked_morphology_device():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 30), np.uint8)
    kern = ie.get_structuring_element("ellipse", (5, 7))
    cvk = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 5))
    got = np.asarray(ie.morphology_ex(jnp.asarray(img), "gradient", kernel=kern))
    want = cv2.morphologyEx(img, cv2.MORPH_GRADIENT, cvk)
    assert np.array_equal(got, want)


def test_gabor_kernel():
    rng = np.random.default_rng(1)
    for t in range(15):
        rows, cols = int(rng.integers(3, 15)), int(rng.integers(3, 15))
        sig, th, lm = rng.uniform(1, 5), rng.uniform(0, 3), rng.uniform(2, 10)
        ga, ps = rng.uniform(0.3, 1.5), rng.uniform(0, 3)
        want = cv2.getGaborKernel((cols, rows), sig, th, lm, ga, ps, ktype=cv2.CV_64F)
        got = ie.gabor_kernel((rows, cols), sig, th, lm, ga, ps)
        assert got.shape == want.shape
        assert np.abs(got - want).max() < 1e-12


def test_corner_harris():
    rng = np.random.default_rng(2)
    for t in range(10):
        H, W = int(rng.integers(10, 40)), int(rng.integers(10, 40))
        img = rng.integers(0, 256, (H, W), np.uint8)
        bs, ks = int(rng.choice([2, 3, 4])), int(rng.choice([3, 5]))
        kk = float(rng.uniform(0.02, 0.08))
        want = cv2.cornerHarris(img, bs, ks, kk)
        got = ref.corner_harris(img, bs, ks, kk)
        rel = float(np.abs(got - want).max()) / max(1e-9, float(np.abs(want).max()))
        assert rel <= 5e-6, (H, W, bs, ks)
    gdev = np.asarray(ie.corner_harris(jnp.asarray(img), bs, ks, kk))
    rel = float(np.abs(gdev - want).max()) / max(1e-9, float(np.abs(want).max()))
    assert rel <= 5e-6


def test_harris_finds_corner():
    img = np.zeros((32, 32), np.uint8)
    img[8:24, 8:24] = 255
    r = np.asarray(ie.corner_harris(jnp.asarray(img), 2, 3, 0.04))
    _, _, _, (mx, my) = ie.min_max_loc(r)
    # the response peak sits within 2 px of a true corner of the square
    corners = [(8, 8), (8, 23), (23, 8), (23, 23)]
    assert min(abs(mx - cx) + abs(my - cy) for cx, cy in corners) <= 4
    # and matches cv2's own peak location exactly
    wr = cv2.cornerHarris(img, 2, 3, 0.04)
    assert (mx, my) == cv2.minMaxLoc(wr)[3]


def test_corner_min_eigen_val():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(seed("mineig"))
    for bs, ks in ((2, 3), (3, 3), (5, 5), (4, 1)):
        img = rng.integers(0, 256, (40, 44), np.uint8)
        want = cv2.cornerMinEigenVal(img, bs, ksize=ks)
        got = ref.corner_min_eigen_val(img, bs, ks)
        rel = np.abs(got.astype(np.float64) - want.astype(np.float64)).max()
        rel /= max(1e-12, np.abs(want).max())
        assert rel <= 5e-7, (bs, ks, rel)
        gdev = np.asarray(ie.corner_min_eigen_val(jnp.asarray(img), bs, ks))
        reld = np.abs(gdev.astype(np.float64) - got.astype(np.float64)).max()
        reld /= max(1e-12, np.abs(got).max())
        assert reld <= 5e-7, (bs, ks, reld)


def test_good_features_selection_exact():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(seed("gft"))
    exact = 0
    total = 40
    for t in range(total):
        H, W = int(rng.integers(12, 70)), int(rng.integers(12, 70))
        img = cv2.GaussianBlur(
            rng.integers(0, 256, (H, W), np.uint8), (5, 5), 1.5)
        mc = int(rng.integers(0, 25))
        ql = float(rng.choice([0.01, 0.05, 0.2]))
        md = float(rng.choice([1.0, 3.5, 7.0, 0.0]))
        bs = int(rng.choice([2, 3, 5]))
        harris = bool(t % 3 == 0)
        mask = (rng.random((H, W)) > 0.3).astype(np.uint8) if t % 4 == 0 else None
        w = cv2.goodFeaturesToTrack(img, mc, ql, md, mask=mask, blockSize=bs,
                                    useHarrisDetector=harris, k=0.04)
        w = np.zeros((0, 2), np.float32) if w is None else w.reshape(-1, 2)
        resp = (cv2.cornerHarris(img, bs, 3, 0.04) if harris
                else cv2.cornerMinEigenVal(img, bs, ksize=3))
        g = ref.good_features_to_track(img, mc, ql, md, mask, bs, 3, harris,
                                       0.04, response=resp)
        # selection chain is pinned EXACT given cv2's own response map
        assert g.shape == w.shape and np.array_equal(g, w), t
        # end-to-end (our response): razor ties may flip — require the
        # strong corners to agree as sets on most configs
        ge = ie.good_features_to_track(img, mc, ql, md, mask, bs, 3, harris, 0.04)
        if ge.shape == w.shape and np.array_equal(ge, w):
            exact += 1
    assert exact >= int(total * 0.8), exact
