"""cv2.findContours + contour descriptor parity
(docs/PARITY.md "Contours")."""

import numpy as np

from detseed import seed
import pytest

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)

_MODES = {"list": cv2.RETR_LIST, "external": cv2.RETR_EXTERNAL,
          "ccomp": cv2.RETR_CCOMP, "tree": cv2.RETR_TREE}
_METH = {"none": cv2.CHAIN_APPROX_NONE, "simple": cv2.CHAIN_APPROX_SIMPLE}


def _blob(rng, lo=8, hi=70):
    H, W = int(rng.integers(lo, hi)), int(rng.integers(lo, hi))
    k = int(rng.choice([3, 5, 9]))
    return (cv2.GaussianBlur(rng.integers(0, 256, (H, W), np.uint8),
                             (k, k), 0)
            > int(rng.integers(100, 160))).astype(np.uint8) * 255


@pytest.mark.parametrize("mode", sorted(_MODES))
@pytest.mark.parametrize("method", sorted(_METH))
def test_find_contours_bitwise(mode, method):
    rng = np.random.default_rng(seed("fc", mode, method))
    for _ in range(25):
        img = _blob(rng)
        cs, h = cv2.findContours(img, _MODES[mode], _METH[method])
        h = h.reshape(-1, 4) if h is not None else np.zeros((0, 4), np.int32)
        gc, gh = ie.find_contours(img, mode, method)
        assert len(gc) == len(cs)
        assert np.array_equal(gh, h)
        for a, b in zip(cs, gc):
            assert np.array_equal(a.reshape(-1, 2), b)


def test_descriptors_bitwise():
    rng = np.random.default_rng(seed("fc-desc"))
    n_def = 0
    for _ in range(30):
        img = _blob(rng)
        cs, _ = cv2.findContours(img, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
        for c in cs:
            c2 = c.reshape(-1, 2)
            assert ie.contour_area(c2) == cv2.contourArea(c)
            assert ie.contour_area(c2, True) == cv2.contourArea(c, True)
            for closed in (True, False):
                assert ie.arc_length(c2, closed) == cv2.arcLength(c, closed)
            assert ie.bounding_rect(c2) == tuple(cv2.boundingRect(c))
            assert ie.is_contour_convex(c2) == bool(cv2.isContourConvex(c))
            mw = cv2.moments(c)
            mg = ie.contour_moments(c2)
            for k, v in mw.items():
                assert abs(mg[k] - v) <= max(1e-8, 1e-11 * abs(v)), (k, v)
            for _ in range(3):
                p = (int(rng.integers(0, img.shape[1])),
                     int(rng.integers(0, img.shape[0])))
                assert (ie.point_polygon_test(c2, p, False)
                        == cv2.pointPolygonTest(c, p, False))
                dw = cv2.pointPolygonTest(c, p, True)
                assert abs(ie.point_polygon_test(c2, p, True) - dw) \
                    <= 1e-9 * max(1, abs(dw))
            if len(c2) >= 4:
                hull = cv2.convexHull(c, returnPoints=False)
                try:
                    w = cv2.convexityDefects(c, hull)
                except cv2.error:
                    continue
                w = (w.reshape(-1, 4) if w is not None
                     else np.zeros((0, 4), np.int32))
                g = ie.convexity_defects(c2, hull.reshape(-1))
                assert np.array_equal(g, w)
                n_def += len(w)
    assert n_def > 50  # the fuzz actually exercised defects


@pytest.mark.parametrize("dt", ["int", "float"])
def test_convex_hull_distinct_bitwise(dt):
    rng = np.random.default_rng(seed("fc-hull", dt))
    for _ in range(60):
        n = int(rng.integers(3, 80))
        if dt == "int":
            base = rng.permutation(400 * 400)[:n]
            pts = np.stack([base % 400, base // 400], 1).astype(np.int32)
        else:
            pts = (rng.random((n, 2)) * 300).astype(np.float32)
        for cw in (False, True):
            want_i = cv2.convexHull(pts.reshape(-1, 1, 2), clockwise=cw,
                                    returnPoints=False).reshape(-1)
            want_p = cv2.convexHull(pts.reshape(-1, 1, 2),
                                    clockwise=cw).reshape(-1, 2)
            got_i = ie.convex_hull(pts, cw, return_points=False)
            got_p = ie.convex_hull(pts, cw)
            assert np.array_equal(got_i, want_i), (n, cw)
            assert np.array_equal(got_p, want_p), (n, cw)


def test_convex_hull_duplicates_same_polygon():
    # exact duplicates: index tie order is the build's unstable sort —
    # the output is the same polygon up to cyclic rotation
    rng = np.random.default_rng(seed("fc-hull-dup"))
    for _ in range(40):
        n = int(rng.integers(4, 60))
        pts = rng.integers(0, 8, (n, 2)).astype(np.int32)
        for cw in (False, True):
            want = cv2.convexHull(pts.reshape(-1, 1, 2),
                                  clockwise=cw).reshape(-1, 2).tolist()
            got = ie.convex_hull(pts, cw).tolist()
            assert len(got) == len(want)
            assert any(got[k:] + got[:k] == want for k in range(len(got)))


def test_segmentation_chain():
    # threshold (device) -> findContours -> descriptors end-to-end
    rng = np.random.default_rng(seed("fc-chain"))
    img = cv2.GaussianBlur(rng.integers(0, 256, (60, 80), np.uint8),
                           (9, 9), 0)
    import jax.numpy as jnp
    _, binary = ie.threshold(jnp.asarray(img), method="otsu")
    binary = np.asarray(binary)
    want_cs, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL,
                                  cv2.CHAIN_APPROX_SIMPLE)
    got_cs, _ = ie.find_contours(binary, "external", "simple")
    assert len(got_cs) == len(want_cs) > 0
    for a, b in zip(want_cs, got_cs):
        assert np.array_equal(a.reshape(-1, 2), b)
        assert ie.contour_area(b) == cv2.contourArea(a)


@pytest.mark.parametrize("dt", ["int", "float"])
def test_approx_poly_dp_bitwise(dt):
    rng = np.random.default_rng(seed("fc-approx", dt))
    for _ in range(25):
        if dt == "int":
            img = _blob(rng)
            cs, _ = cv2.findContours(img, cv2.RETR_LIST,
                                     cv2.CHAIN_APPROX_SIMPLE)
            curves = [c.reshape(-1, 2) for c in cs]
        else:
            n = int(rng.integers(3, 50))
            curves = [(rng.random((n, 2)) * 100).astype(np.float32)]
        for c in curves:
            for ep in (0.5, 1.0, 3.0, 8.0):
                for cl in (True, False):
                    want = cv2.approxPolyDP(
                        c.reshape(-1, 1, 2), ep, cl).reshape(-1, 2)
                    got = ie.approx_poly_dp(c, ep, cl)
                    assert np.array_equal(
                        got.astype(want.dtype), want), (dt, ep, cl)


def test_min_area_rect_and_circle():
    rng = np.random.default_rng(seed("fc-fit1"))
    for _ in range(50):
        n = int(rng.integers(3, 40))
        pts = (rng.random((n, 2)) * 100).astype(np.float32)
        wr = cv2.minAreaRect(pts.reshape(-1, 1, 2))
        gr = ie.min_area_rect(pts)
        wb = np.sort(cv2.boxPoints(wr), axis=0)
        gb = np.sort(ie.box_points(gr), axis=0)
        assert np.abs(wb - gb).max() <= 1e-3
        (wc, wrad) = cv2.minEnclosingCircle(pts.reshape(-1, 1, 2))
        (gc, grad) = ie.min_enclosing_circle(pts)
        assert abs(wrad - grad) <= 1e-3
        assert abs(wc[0] - gc[0]) <= 1e-3 and abs(wc[1] - gc[1]) <= 1e-3


def test_box_points_matches_cv2():
    rng = np.random.default_rng(seed("fc-boxpts"))
    for _ in range(40):
        rect = ((float(rng.uniform(0, 100)), float(rng.uniform(0, 100))),
                (float(rng.uniform(1, 50)), float(rng.uniform(1, 50))),
                float(rng.uniform(-90, 90)))
        assert np.abs(ie.box_points(rect) - cv2.boxPoints(rect)).max() \
            <= 1e-3


def test_fit_line_l2_tight_and_robust_budget():
    rng = np.random.default_rng(seed("fc-fitline"))
    for _ in range(30):
        n = int(rng.integers(10, 50))
        th = rng.uniform(0, np.pi)
        t = rng.uniform(-50, 50, n)
        base = np.stack([50 + t * np.cos(th), 50 + t * np.sin(th)], 1)
        noise = rng.normal(0, 0.5, (n, 2))
        noise[:max(1, n // 8)] = rng.normal(0, 8, (max(1, n // 8), 2))
        pts = (base + noise).astype(np.float32)
        wl = cv2.fitLine(pts.reshape(-1, 1, 2), cv2.DIST_L2,
                         0, 0.01, 0.01).reshape(-1)
        gl = np.array(ie.fit_line(pts, "l2"))
        assert min(np.abs(gl - wl).max(),
                   np.abs(np.concatenate([-gl[:2], gl[2:]]) - wl).max()) \
            <= 1e-5
        for dt, cvd in [("l1", cv2.DIST_L1), ("huber", cv2.DIST_HUBER),
                        ("welsch", cv2.DIST_WELSCH)]:
            wl = cv2.fitLine(pts.reshape(-1, 1, 2), cvd,
                             0, 0.01, 0.01).reshape(-1)
            gl = np.array(ie.fit_line(pts, dt))
            ddir = min(np.abs(gl[:2] - wl[:2]).max(),
                       np.abs(gl[:2] + wl[:2]).max())
            assert ddir <= 0.5, (dt, ddir)  # documented approximation


def test_fit_ellipse():
    rng = np.random.default_rng(seed("fc-fitell"))
    for _ in range(40):
        t = rng.uniform(0, 2 * np.pi, 24)
        a, b = rng.uniform(10, 40), rng.uniform(5, 25)
        th = rng.uniform(0, np.pi)
        ex = 50 + a * np.cos(t) * np.cos(th) - b * np.sin(t) * np.sin(th)
        ey = 50 + a * np.cos(t) * np.sin(th) + b * np.sin(t) * np.cos(th)
        pts = (np.stack([ex, ey], 1)
               + rng.normal(0, 0.05, (24, 2))).astype(np.float32)
        we = cv2.fitEllipse(pts.reshape(-1, 1, 2))
        ge = ie.fit_ellipse(pts)
        agg = (abs(we[0][0] - ge[0][0]) + abs(we[0][1] - ge[0][1])
               + abs(we[1][0] - ge[1][0]) + abs(we[1][1] - ge[1][1])
               + abs(((we[2] - ge[2]) + 90) % 180 - 90))
        assert agg <= 0.1, agg
