"""cv2.warpPolar + cartToPolar parity (docs/PARITY.md): pinned maps
(f32 center, f32 radius table, single-FMA fastAtan2, fma magnitude,
post-cast +1 angular offset) + the bit-exact remap.  The one budget:
the semilog INVERSE's log32f is build-dependent inside cv2 itself —
u8 bit-exact, u16 +-1 on ~0.1% px, f32-linear <= 6e-6."""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _flags(interp, log, inv):
    f = (cv2.INTER_LINEAR if interp == "linear" else cv2.INTER_NEAREST)
    f += cv2.WARP_FILL_OUTLIERS
    if log:
        f += cv2.WARP_POLAR_LOG
    if inv:
        f += cv2.WARP_INVERSE_MAP
    return f


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "float32"])
@pytest.mark.parametrize("log", [False, True])
@pytest.mark.parametrize("inv", [False, True])
def test_ref_and_device_vs_cv2(dtype, log, inv):
    rng = np.random.default_rng(seed("warppolar", dtype, log, inv))
    for trial in range(4):
        interp = ("linear", "nearest")[trial % 2]
        H, W = int(rng.integers(28, 64)), int(rng.integers(28, 64))
        src = rng.integers(0, 256, (H, W)).astype(dtype)
        if dtype == "float32":
            src = (src / 255.0).astype(np.float32)
        cx = float(rng.uniform(4, W - 4))
        cy = float(rng.uniform(4, H - 4))
        mr = float(rng.uniform(8, 40))
        dsz = (int(rng.integers(16, 48)), int(rng.integers(16, 48)))
        want = cv2.warpPolar(src, dsz, (cx, cy), mr, _flags(interp, log, inv))
        got_ref = ref.warp_polar(src, dsz, (cx, cy), mr, log, inv, interp)
        got_dev = np.asarray(ie.warp_polar(jnp.asarray(src), dsz, (cx, cy),
                                           mr, log, inv, interp))
        if log and inv and dtype == "float32" and interp == "linear":
            tol = 6e-6  # cv2's own log32f is build-dependent
            assert np.abs(got_ref.astype(np.float64) - want).max() <= tol
            assert np.abs(got_dev.astype(np.float64) - want).max() <= tol
        elif log and inv and dtype == "uint16" and interp == "linear":
            # same budget at u16 quantization: +-1 on ~0.1% px
            assert np.abs(got_ref.astype(np.int64) - want.astype(np.int64)).max() <= 1
            assert np.abs(got_dev.astype(np.int64) - want.astype(np.int64)).max() <= 1
        else:
            assert np.array_equal(got_ref, want), (dtype, log, inv, interp)
            assert np.array_equal(got_dev, want), (dtype, log, inv, interp)


def test_batched_rgb_device():
    rng = np.random.default_rng(seed("warppolarb"))
    src = rng.integers(0, 256, (2, 50, 60, 3), np.uint8)
    want = np.stack([cv2.warpPolar(f, (40, 64), (30.0, 25.0), 28.0,
                                   _flags("linear", False, False))
                     for f in src])
    got = np.asarray(ie.warp_polar(jnp.asarray(src), (40, 64), (30.0, 25.0),
                                   28.0))
    assert np.array_equal(got, want)
    # inverse needs the angular wrap pad on the right axis (batched rgb
    # and a [N,H,W] grayscale batch via the channels_last=False flag)
    polar = rng.integers(0, 256, (2, 48, 36, 3), np.uint8)
    want = np.stack([cv2.warpPolar(f, (41, 45), (20.0, 22.0), 24.0,
                                   _flags("linear", False, True))
                     for f in polar])
    got = np.asarray(ie.warp_polar(jnp.asarray(polar), (41, 45), (20.0, 22.0),
                                   24.0, inverse=True))
    assert np.array_equal(got, want)
    gray3 = rng.integers(0, 256, (3, 48, 36), np.uint8)  # [N,H,W] batch
    want3 = np.stack([cv2.warpPolar(f, (41, 45), (20.0, 22.0), 24.0,
                                    _flags("linear", False, True))
                      for f in gray3])
    got3 = np.asarray(ie.warp_polar(jnp.asarray(gray3), (41, 45),
                                    (20.0, 22.0), 24.0, inverse=True,
                                    channels_last=False))
    assert np.array_equal(got3, want3)


def test_cart_to_polar_vs_cv2():
    rng = np.random.default_rng(seed("carttopolar"))
    X = (rng.standard_normal((256, 256)) *
         rng.choice([0.01, 1.0, 100.0, 1e4], (256, 256))).astype(np.float32)
    Y = (rng.standard_normal((256, 256)) *
         rng.choice([0.01, 1.0, 100.0, 1e4], (256, 256))).astype(np.float32)
    X[0, :10] = 0
    Y[0, 5:15] = 0
    for deg in (False, True):
        want_m, want_a = cv2.cartToPolar(X, Y, angleInDegrees=deg)
        got_m, got_a = ref.cart_to_polar(X, Y, angle_in_degrees=deg)
        assert np.array_equal(got_m, want_m)
        assert np.array_equal(got_a, want_a)
