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
