"""cv2.getRectSubPix parity — per-(channels, depth) kernel laws
(docs/PARITY.md "getRectSubPix")."""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _interior_cfg(rng):
    """Random image/patch/center with the patch strictly interior."""
    while True:
        H, W = int(rng.integers(12, 48)), int(rng.integers(12, 48))
        w, h = int(rng.integers(1, 10)), int(rng.integers(1, 10))
        m = max(w, h) / 2 + 2
        if H > 2 * m and W > 2 * m:
            cx = float(rng.uniform(m, W - 1 - m))
            cy = float(rng.uniform(m, H - 1 - m))
            return H, W, w, h, cx, cy


@pytest.mark.parametrize("ch", [1, 3])
def test_f32_exact(ch):
    rng = np.random.default_rng(seed("grsp-f32", ch))
    for _ in range(120):
        H, W, w, h, cx, cy = _interior_cfg(rng)
        shape = (H, W) if ch == 1 else (H, W, 3)
        img = rng.uniform(0, 255, shape).astype(np.float32)
        want = cv2.getRectSubPix(img, (w, h), (cx, cy))
        got = ref.get_rect_sub_pix(img, (w, h), (cx, cy))
        assert np.array_equal(got.reshape(want.shape), want), (H, W, w, h, cx, cy)


@pytest.mark.parametrize("ch", [1, 3])
def test_u8_to_f32_exact(ch):
    rng = np.random.default_rng(seed("grsp-u8f32", ch))
    for _ in range(120):
        H, W, w, h, cx, cy = _interior_cfg(rng)
        shape = (H, W) if ch == 1 else (H, W, 3)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        want = cv2.getRectSubPix(img, (w, h), (cx, cy), patchType=cv2.CV_32F)
        got = ref.get_rect_sub_pix(img, (w, h), (cx, cy), patch_type="f32")
        assert np.array_equal(got.reshape(want.shape), want), (H, W, w, h, cx, cy)


def test_u8_3ch_exact():
    # 3ch u8->u8 stays on OpenCV's own Q16 fixed-point kernel: bit-exact.
    rng = np.random.default_rng(seed("grsp-u8-3ch"))
    for _ in range(150):
        H, W, w, h, cx, cy = _interior_cfg(rng)
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        want = cv2.getRectSubPix(img, (w, h), (cx, cy))
        got = ref.get_rect_sub_pix(img, (w, h), (cx, cy))
        assert np.array_equal(got.reshape(want.shape), want), (H, W, w, h, cx, cy)


def test_u8_1ch_ipp_budget():
    # 1ch u8->u8 routes through ippiCopySubpixIntersect_8u_C1R in the
    # default build; its SIMD fixed point flips a thin band of near-half
    # ties vs the Q16 law — documented +-1 budget (docs/PARITY.md).
    rng = np.random.default_rng(seed("grsp-u8-1ch"))
    npx = nbad = 0
    for _ in range(200):
        H, W, w, h, cx, cy = _interior_cfg(rng)
        img = rng.integers(0, 256, (H, W), dtype=np.uint8)
        want = cv2.getRectSubPix(img, (w, h), (cx, cy))
        got = ref.get_rect_sub_pix(img, (w, h), (cx, cy)).reshape(want.shape)
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.max() <= 1, (H, W, w, h, cx, cy)
        npx += d.size
        nbad += int((d > 0).sum())
    assert nbad / npx < 0.05, f"IPP tie band should be sparse: {nbad}/{npx}"


def test_border_patch_within_one():
    # Patch overhanging the image edge (center still inside): cv2's
    # scalar border kernel agrees with the replicate-clamp model to
    # +-1 LSB.  3ch stays on the scalar kernel in the default build;
    # 1ch u8->u8 border goes through IPP whose x-overhang first row is
    # anomalous (samples col W-2; see the oracle docstring) and is
    # deliberately NOT asserted here.
    rng = np.random.default_rng(seed("grsp-border"))
    for _ in range(100):
        H, W = int(rng.integers(10, 30)), int(rng.integers(10, 30))
        w, h = int(rng.integers(2, 8)), int(rng.integers(2, 8))
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        cx = float(rng.uniform(0, W - 1))
        cy = float(rng.uniform(0, H - 1))
        want = cv2.getRectSubPix(img, (w, h), (cx, cy))
        got = ref.get_rect_sub_pix(img, (w, h), (cx, cy)).reshape(want.shape)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, \
            (H, W, w, h, cx, cy)


@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("src", ["u8", "f32"])
def test_device_vs_oracle(ch, src):
    # Device == oracle bitwise on every path (the oracle carries the
    # cv2 parity budget; the device must not add to it).
    rng = np.random.default_rng(seed("grsp-dev", ch, src))
    H, W = 40, 52
    shape = (H, W) if ch == 1 else (H, W, 3)
    if src == "u8":
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        types = ["u8", "f32"]
    else:
        img = rng.uniform(0, 255, shape).astype(np.float32)
        types = ["f32"]
    N = 24
    cs = np.stack([rng.uniform(1, W - 2, N),
                   rng.uniform(1, H - 2, N)], axis=1).astype(np.float32)
    for pt in types:
        for (w, h) in [(1, 1), (5, 4), (8, 8)]:
            out = np.asarray(ie.get_rect_sub_pix(
                jnp.asarray(img), (w, h), cs, patch_type=pt))
            for i in range(N):
                want = ref.get_rect_sub_pix(img, (w, h),
                                            (float(cs[i, 0]), float(cs[i, 1])),
                                            patch_type=pt)
                assert np.array_equal(out[i], want.reshape(out[i].shape)), \
                    (ch, src, pt, w, h, tuple(cs[i]))


def test_device_single_center_and_vs_cv2():
    rng = np.random.default_rng(seed("grsp-dev-single"))
    img = rng.integers(0, 256, (30, 34, 3), dtype=np.uint8)
    got = np.asarray(ie.get_rect_sub_pix(jnp.asarray(img), (7, 5),
                                         (12.37, 9.81)))
    want = cv2.getRectSubPix(img, (7, 5), (12.37, 9.81))
    assert got.shape == (5, 7, 3)
    assert np.array_equal(got, want)


def test_corner_sub_pix_interior_bitwise():
    # Interior margin keeps every iterate's patch inside the image:
    # refinement is bitwise vs cv2 (f64 tensor + pinned f32 patch laws).
    rng = np.random.default_rng(seed("csp-interior"))
    for _ in range(60):
        H, W = int(rng.integers(40, 90)), int(rng.integers(40, 90))
        img = cv2.GaussianBlur(
            rng.integers(0, 256, (H, W), np.uint8), (5, 5), 0)
        ww, wh = int(rng.integers(2, 6)), int(rng.integers(2, 6))
        mc = int(rng.integers(1, 40))
        eps = float(rng.choice([0.0, 0.01, 0.03]))
        mx, my = 3 * (ww + 1) + 2, 3 * (wh + 1) + 2
        if W - 1 - mx <= mx or H - 1 - my <= my:
            continue
        pts = np.stack([rng.uniform(mx, W - 1 - mx, 8),
                        rng.uniform(my, H - 1 - my, 8)], 1).astype(np.float32)
        want = cv2.cornerSubPix(
            img, pts.copy().reshape(-1, 1, 2), (ww, wh), (-1, -1),
            (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, mc, eps)
        ).reshape(-1, 2)
        got = ie.corner_sub_pix(img, pts, (ww, wh), (-1, -1), mc, eps)
        assert np.array_equal(got, want), (H, W, ww, wh, mc, eps)


def test_corner_sub_pix_detect_refine_chain():
    # goodFeaturesToTrack -> cornerSubPix, corners anywhere: interior
    # corners are bitwise; a window that reaches the border may settle
    # on a neighbouring fixpoint, bounded by the drift gate (~window).
    rng = np.random.default_rng(seed("csp-chain"))
    nbit = ntot = 0
    for _ in range(30):
        H, W = int(rng.integers(40, 100)), int(rng.integers(40, 100))
        img = cv2.GaussianBlur(
            rng.integers(0, 256, (H, W), np.uint8), (5, 5), 0)
        ww = wh = int(rng.integers(2, 7))
        corners = cv2.goodFeaturesToTrack(img, 20, 0.01, 6)
        if corners is None:
            continue
        corners = corners.reshape(-1, 2)
        mc = int(rng.integers(5, 40))
        want = cv2.cornerSubPix(
            img, corners.copy().reshape(-1, 1, 2), (ww, wh), (-1, -1),
            (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, mc, 0.01)
        ).reshape(-1, 2)
        got = ie.corner_sub_pix(img, corners, (ww, wh), (-1, -1), mc, 0.01)
        m = max(ww, wh) + 2
        for k in range(len(corners)):
            eq = np.array_equal(got[k], want[k])
            near = any(p[0] < m or p[1] < m or p[0] >= W - 1 - m
                       or p[1] >= H - 1 - m
                       for p in (corners[k], want[k], got[k]))
            if not near:
                assert eq, (H, W, ww, mc, tuple(corners[k]))
            else:
                assert eq or np.abs(got[k] - want[k]).max() <= 2 * max(ww, wh), \
                    (H, W, ww, mc, tuple(corners[k]))
            ntot += 1
            nbit += int(eq)
    assert nbit / ntot > 0.9, f"bitwise rate collapsed: {nbit}/{ntot}"


def test_corner_sub_pix_refines_synthetic_corner():
    # A synthetic checkerboard corner at a known sub-pixel location is
    # recovered to sub-pixel accuracy from an integer-ish start.
    xx, yy = np.meshgrid(np.arange(64, dtype=np.float64),
                         np.arange(64, dtype=np.float64))
    cx, cy = 31.63, 30.41
    img = cv2.GaussianBlur(
        (((xx < cx) ^ (yy < cy)) * 255).astype(np.uint8), (5, 5), 1.2)
    got = ie.corner_sub_pix(img, np.array([[31.0, 31.0]], np.float32),
                            (5, 5), (-1, -1), 50, 0.001)
    assert abs(float(got[0, 0]) - cx) < 0.2
    assert abs(float(got[0, 1]) - cy) < 0.2
