"""floodFill — ref vs cv2 (exact), device vs cv2 (exact)."""

import numpy as np
import pytest
from detseed import seed

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")


def _cv(img, seedp, nv, lo, up, conn, fixed, mask0, maskonly, mfill):
    flags = conn | (mfill << 8)
    if fixed:
        flags |= cv2.FLOODFILL_FIXED_RANGE
    if maskonly:
        flags |= cv2.FLOODFILL_MASK_ONLY
    im = img.copy()
    m = mask0.copy()
    return cv2.floodFill(im, m, seedp, nv, loDiff=lo, upDiff=up, flags=flags)


def _configs(rng, t):
    H, W = int(rng.integers(3, 40)), int(rng.integers(3, 40))
    C = [1, 3][t % 2]
    img = rng.integers(0, 256, (H, W) if C == 1 else (H, W, C), np.uint8)
    seedp = (int(rng.integers(0, W)), int(rng.integers(0, H)))
    lo, up = int(rng.integers(0, 60)), int(rng.integers(0, 60))
    conn = [4, 8][t % 2 == 0]
    fixed = bool(t % 3)
    maskonly = t % 5 == 0
    mfill = int(rng.integers(1, 256)) if t % 4 == 0 else 1
    m0 = np.zeros((H + 2, W + 2), np.uint8)
    if t % 6 == 0:
        m0[1:-1, 1:-1] = (rng.random((H, W)) < 0.1).astype(np.uint8) * 3
    nv = int(rng.integers(0, 300))
    nv = nv if C == 1 else (nv, nv // 2, 7)
    lo_t = lo if C == 1 else (lo,) * C
    up_t = up if C == 1 else (up,) * C
    return img, seedp, nv, lo_t, up_t, conn, fixed, m0, maskonly, mfill


def test_ref_vs_cv2():
    rng = np.random.default_rng(seed("floodfill_ref"))
    for t in range(80):
        img, sp, nv, lo, up, conn, fixed, m0, mo, mf = _configs(rng, t)
        n_cv, im_cv, m_cv, r_cv = _cv(img, sp, nv, lo, up, conn, fixed, m0, mo, mf)
        n, im, m, r = ref.flood_fill(img, sp, nv, lo, up, conn, fixed, m0, mo, mf)
        assert n == n_cv and tuple(r) == tuple(r_cv), t
        assert np.array_equal(im, im_cv) and np.array_equal(m, m_cv), t


def test_device_vs_cv2():
    rng = np.random.default_rng(seed("floodfill_dev"))
    for t in range(14):
        img, sp, nv, lo, up, conn, fixed, m0, mo, mf = _configs(rng, t)
        n_cv, im_cv, m_cv, r_cv = _cv(img, sp, nv, lo, up, conn, fixed, m0, mo, mf)
        n, im, m, r = ie.flood_fill(img, sp, nv, lo, up, conn, fixed, m0, mo, mf)
        assert n == n_cv and tuple(r) == tuple(r_cv), t
        assert np.array_equal(im, im_cv) and np.array_equal(m, m_cv), t


def test_f32_and_u16():
    rng = np.random.default_rng(seed("floodfill_f32"))
    f = (rng.random((12, 13)) * 10).astype(np.float32)
    m0 = np.zeros((14, 15), np.uint8)
    n_cv, im_cv, m_cv, r_cv = cv2.floodFill(
        f.copy(), m0.copy(), (4, 4), 77.5, loDiff=0.7, upDiff=0.7, flags=4)
    n, im, m, r = ie.flood_fill(f, (4, 4), 77.5, 0.7, 0.7)
    assert n == n_cv and np.array_equal(im.view(np.int32), im_cv.view(np.int32))
    assert np.array_equal(m, m_cv) and tuple(r) == tuple(r_cv)
    # uint16 (cv2 floodFill supports integer types beyond u8 via the
    # generic path — our contract: same closure semantics; check ref ==
    # device, and n/rect consistency)
    u16 = (rng.integers(0, 65536, (10, 11))).astype(np.uint16)
    n1, im1, m1, r1 = ref.flood_fill(u16, (3, 3), 40000, 9000, 9000)
    n2, im2, m2, r2 = ie.flood_fill(u16, (3, 3), 40000, 9000, 9000)
    assert n1 == n2 and np.array_equal(im1, im2)
    assert np.array_equal(m1, m2) and tuple(r1) == tuple(r2)


def test_validation_and_noop():
    img = np.zeros((5, 5), np.uint8)
    with pytest.raises(ValueError):
        ie.flood_fill(img, (9, 0), 1)
    # blocked seed is a no-op
    m0 = np.zeros((7, 7), np.uint8)
    m0[1 + 2, 1 + 2] = 5
    n, im, m, r = ie.flood_fill(img, (2, 2), 200, mask=m0)
    assert n == 0 and r == (0, 0, 0, 0) and im[2, 2] == 0
