"""distanceTransform — ref vs cv2 (per-metric budgets), device vs ref."""

import numpy as np
import pytest
from detseed import seed

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")

_CVDT = {"l1": cv2.DIST_L1, "c": cv2.DIST_C, "l2": cv2.DIST_L2}


def _ulp32(a, b):
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    return int(np.abs(a.view(np.int32).astype(np.int64)
                      - b.view(np.int32).astype(np.int64)).max()) if a.size else 0


@pytest.mark.parametrize("dt", ["l1", "c", "l2"])
@pytest.mark.parametrize("mask", [3, 5])
def test_ref_vs_cv2(dt, mask):
    rng = np.random.default_rng(seed("distance", dt, mask))
    for t in range(40):
        H, W = int(rng.integers(4, 80)), int(rng.integers(4, 80))
        p = [0.5, 0.1, 0.02, 0.003][t % 4]
        img = (rng.random((H, W)) > p).astype(np.uint8) * int(rng.integers(1, 256))
        got = ref.distance_transform(img, dt, mask)
        want = cv2.distanceTransform(img, _CVDT[dt], mask)
        if dt == "l2" and mask == 3:
            # bitwise vs cv2's portable float law; the default build
            # routes 3x3 L2 through IPP whose vector kernel deviates
            # ≤1e-6 relative (right-edge scalar tail + one lane-order
            # quirk — docs/PARITY.md)
            gd = got.astype(np.float64)
            wd = want.astype(np.float64)
            rel = np.abs(gd - wd) / np.maximum(wd, 1e-6)
            assert rel.max() <= 2e-6, (t, rel.max())
        else:
            assert _ulp32(got, want) == 0, (t, H, W, p)


def test_ref_vs_cv2_l2mask3_portable():
    # with optimizations off cv2 uses the int16.16 chamfer — a different
    # law entirely; check our float law is the one the DEFAULT build
    # matches most closely (sanity against dense realistic images where
    # the IPP delta is ±1 ulp)
    rng = np.random.default_rng(seed("distance_l2m3"))
    for t in range(15):
        H, W = int(rng.integers(20, 90)), int(rng.integers(20, 90))
        img = (rng.random((H, W)) > 0.1).astype(np.uint8) * 255
        got = ref.distance_transform(img, "l2", 3)
        want = cv2.distanceTransform(img, cv2.DIST_L2, 3)
        assert _ulp32(got, want) <= 1, t


def test_ref_edge_cases():
    nz = np.full((7, 9), 255, np.uint8)
    got = ref.distance_transform(nz, "l2", 3)
    want = cv2.distanceTransform(nz, cv2.DIST_L2, 3)
    assert np.array_equal(got, want)          # FLT_MAX everywhere
    az = np.zeros((7, 9), np.uint8)
    assert ref.distance_transform(az, "l1", 3).max() == 0
    # u8 output saturates at 255
    wide = np.full((5, 400), 255, np.uint8)
    wide[0, 0] = 0
    got = ref.distance_transform(wide, "l1", 3, "u8")
    want = cv2.distanceTransform(wide, cv2.DIST_L1, 3, dstType=cv2.CV_8U)
    assert got.dtype == np.uint8 and np.array_equal(got, want)


def test_device_vs_ref():
    rng = np.random.default_rng(seed("distance_dev"))
    img = (rng.random((2, 33, 41)) > 0.08).astype(np.uint8) * 255
    for dt, mask in (("l1", 3), ("c", 3), ("l2", 3), ("l2", 5)):
        got = np.asarray(ie.distance_transform(jnp.asarray(img), dt, mask))
        for n in range(2):
            want = ref.distance_transform(img[n], dt, mask)
            assert _ulp32(got[n], want) == 0, (dt, mask, n)
    u8 = np.asarray(ie.distance_transform(jnp.asarray(img[0]), "l1", dst_type="u8"))
    assert np.array_equal(u8, ref.distance_transform(img[0], "l1", 3, "u8"))


def test_api_validation():
    img = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError):
        ie.distance_transform(jnp.asarray(img), "l3")
    with pytest.raises(ValueError):
        ie.distance_transform(jnp.asarray(img), "l2", 7)
    with pytest.raises(ValueError):
        ie.distance_transform(jnp.asarray(img), "l2", 3, dst_type="u8")
