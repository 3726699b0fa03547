"""cv2.resize parity: oracle vs cv2, device vs oracle, API surface.

Budgets (docs/PARITY.md):
* nearest — index-exact except cv2's measure-zero boundary snaps (a
  coordinate within ~1 ulp of an integer may pick the adjacent source
  line; provably non-monotone, no closed-form model reproduces it).
* linear — u8 bit-exact; u16/i16 ±1 (cv2's f32 path); f32 ulp-level.
* area — integer factors exact (incl. the 2x2 half-up fast path);
  otherwise ±1 plus the same boundary-snap caveat.
"""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.ops.resize import resize_planes

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)

_MAP = {"nearest": cv2.INTER_NEAREST, "linear": cv2.INTER_LINEAR,
        "area": cv2.INTER_AREA}


def _boundary_cfg(n, on):
    """True when a source coordinate sits within ~4 ulp of an integer —
    the pinned cv2 boundary-snap zone (nearest/area caveats)."""
    d = np.arange(1, on) * (n / on)
    return bool(np.any(np.abs(d - np.round(d)) < 1e-9 * np.maximum(d, 1)))


def _img(rng, dt, shape):
    if dt is np.float32:
        return (rng.random(shape) * 600 - 150).astype(np.float32)
    lo, hi = (0, 256) if dt is np.uint8 else (
        (0, 65536) if dt is np.uint16 else (-32768, 32768))
    return rng.integers(lo, hi, shape).astype(dt)


@pytest.mark.parametrize("interp", ["nearest", "linear", "area"])
@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_ref_vs_cv2(interp, dt):
    rng = np.random.default_rng(seed(interp, dt.__name__))
    checked = 0
    for t in range(140):
        H, W = int(rng.integers(1, 48)), int(rng.integers(1, 48))
        oh, ow = int(rng.integers(1, 64)), int(rng.integers(1, 64))
        if interp in ("nearest", "area") and (
                _boundary_cfg(H, oh) or _boundary_cfg(W, ow)):
            continue  # documented measure-zero snap zone
        img = _img(rng, dt, (H, W))
        want = cv2.resize(img, (ow, oh), interpolation=_MAP[interp])
        got = ref.resize(img, (oh, ow), interp)
        assert got.shape == want.shape
        if dt is np.float32:
            tol = 2e-5 * max(1.0, float(np.abs(want).max()))
            assert float(np.abs(got - want).max()) <= tol, (H, W, oh, ow)
        else:
            d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
            lim = 0 if interp == "nearest" else 1
            if interp == "linear" and dt is np.uint8:
                lim = 0
            if interp == "area" and H % oh == 0 and W % ow == 0 and H >= oh and W >= ow:
                lim = 0
            assert d <= lim, (H, W, oh, ow, d)
        checked += 1
    assert checked >= 40


def test_linear_u8_bitexact_vs_cv2():
    rng = np.random.default_rng(5)
    for t in range(40):
        H, W = int(rng.integers(1, 64)), int(rng.integers(1, 64))
        oh, ow = int(rng.integers(1, 96)), int(rng.integers(1, 96))
        img = rng.integers(0, 256, (H, W), np.uint8)
        want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        assert np.array_equal(ref.resize(img, (oh, ow), "linear"), want), (H, W, oh, ow)


def test_area_2x2_fast_path_half_up():
    # sum 2 -> mean 0.5 rounds UP (cv2's v_rshr_pack), not half-even
    img = np.array([[1, 1], [0, 0]], np.uint8)
    assert ref.resize(img, (1, 1), "area")[0, 0] == 1
    assert cv2.resize(img, (1, 1), interpolation=cv2.INTER_AREA)[0, 0] == 1


@pytest.mark.parametrize("interp", ["nearest", "linear", "area"])
@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_device_vs_oracle(interp, dt):
    rng = np.random.default_rng(seed(interp, dt.__name__, "dev"))
    for t in range(6):
        H, W = int(rng.integers(2, 40)), int(rng.integers(2, 40))
        oh, ow = int(rng.integers(1, 56)), int(rng.integers(1, 56))
        img = _img(rng, dt, (H, W))
        want = ref.resize(img, (oh, ow), interp)
        got = np.asarray(resize_planes(jnp.asarray(img)[None], (oh, ow), interp))[0]
        if dt is np.float32:
            tol = 2e-3 * max(1.0, float(np.abs(want).max()))
            assert float(np.abs(got - want).max()) <= tol, (H, W, oh, ow)
        else:
            d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
            lim = 1 if (interp == "area"
                        and not (H % oh == 0 and W % ow == 0 and H >= oh and W >= ow)) else 0
            assert d <= lim, (H, W, oh, ow, d)


def test_api_shapes_and_batch():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (2, 17, 23, 3), np.uint8)
    out = np.asarray(ie.resize(jnp.asarray(img), (9, 11)))
    assert out.shape == (2, 9, 11, 3)
    want = np.stack([
        np.stack([cv2.resize(img[b, :, :, c], (11, 9), interpolation=cv2.INTER_LINEAR)
                  for c in range(3)], -1)
        for b in range(2)])
    assert np.array_equal(out, want)


def test_api_rejects():
    with pytest.raises(ValueError):
        ie.resize(jnp.zeros((4, 4), jnp.uint8), (0, 3))
    with pytest.raises(ValueError):
        ie.resize(jnp.zeros((4, 4), jnp.uint8), (3, 3), "lanczos")


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_cubic_ref_vs_cv2(dt):
    rng = np.random.default_rng(seed("cubic", dt.__name__))
    for t in range(60):
        H, W = int(rng.integers(2, 45)), int(rng.integers(2, 45))
        oh, ow = int(rng.integers(1, 64)), int(rng.integers(1, 64))
        img = _img(rng, dt, (H, W))
        want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_CUBIC)
        got = ref.resize(img, (oh, ow), "cubic")
        if dt is np.float32:
            tol = 3e-5 * max(1.0, float(np.abs(want).max()))
            assert float(np.abs(got - want).max()) <= tol, (H, W, oh, ow)
        else:
            # ±1: cv2's u8 vertical runs in f32 with build-dependent
            # lane order (docs/PARITY.md)
            d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
            assert d <= 1, (H, W, oh, ow, d)


def test_cubic_device_vs_oracle():
    rng = np.random.default_rng(77)
    for dt in [np.uint8, np.uint16, np.float32]:
        img = _img(rng, dt, (33, 27))
        want = ref.resize(img, (21, 40), "cubic")
        got = np.asarray(resize_planes(jnp.asarray(img)[None], (21, 40), "cubic"))[0]
        if dt is np.float32:
            assert float(np.abs(got - want).max()) <= 2e-3 * max(
                1.0, float(np.abs(want).max()))
        else:
            d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
            assert d <= 1  # f32 vertical vs int64 oracle on razor ties


def test_geometry_exact():
    rng = np.random.default_rng(13)
    for dt in [np.uint8, np.uint16, np.int16, np.float32]:
        img = _img(rng, dt, (13, 17))
        assert np.array_equal(ref.flip(img, 0), cv2.flip(img, 0))
        assert np.array_equal(ref.flip(img, 1), cv2.flip(img, 1))
        assert np.array_equal(ref.flip(img, -1), cv2.flip(img, -1))
        assert np.array_equal(ref.transpose(img), cv2.transpose(img))
        assert np.array_equal(ref.rotate(img, "90cw"),
                              cv2.rotate(img, cv2.ROTATE_90_CLOCKWISE))
        assert np.array_equal(ref.rotate(img, "180"), cv2.rotate(img, cv2.ROTATE_180))
        assert np.array_equal(ref.rotate(img, "90ccw"),
                              cv2.rotate(img, cv2.ROTATE_90_COUNTERCLOCKWISE))
        # device
        got = np.asarray(ie.flip(jnp.asarray(img), -1))
        assert np.array_equal(got, ref.flip(img, -1))
        got = np.asarray(ie.rotate(jnp.asarray(img), "90ccw"))
        assert np.array_equal(got, ref.rotate(img, "90ccw"))
        got = np.asarray(ie.transpose(jnp.asarray(img)))
        assert np.array_equal(got, ref.transpose(img))


def test_rotate_rejects_bad_code():
    with pytest.raises(ValueError):
        ref.rotate(np.zeros((4, 4), np.uint8), "45")


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_lanczos_ref_vs_cv2(dt):
    rng = np.random.default_rng(seed("lanczos", dt.__name__))
    for t in range(40):
        H, W = int(rng.integers(2, 60)), int(rng.integers(2, 60))
        oh, ow = int(rng.integers(1, 72)), int(rng.integers(1, 72))
        img = _img(rng, dt, (H, W))
        want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LANCZOS4)
        got = ref.resize(img, (oh, ow), "lanczos4")
        if dt is np.float32:
            tol = 2e-6 * max(1.0, float(np.abs(want).max()))
            assert float(np.abs(got - want).max()) <= tol, (H, W, oh, ow)
        elif dt is np.uint8:
            # u8 integer pipeline is BIT-EXACT
            assert np.array_equal(got, want), (H, W, oh, ow)
        else:
            # u16/i16 ride cv2's f32 path: ±1 on full-range
            # accumulation-order ties (docs/PARITY.md)
            d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
            assert d <= 1, (H, W, oh, ow, d)


def test_lanczos_device_vs_oracle_and_cv2():
    rng = np.random.default_rng(seed("lanczosdev"))
    for dt in [np.uint8, np.uint16, np.float32]:
        img = _img(rng, dt, (43, 37))
        want = ref.resize(img, (29, 50), "lanczos4")
        got = np.asarray(resize_planes(jnp.asarray(img)[None], (29, 50),
                                       "lanczos4"))[0]
        if dt is np.float32:
            assert float(np.abs(got - want).max()) <= 2e-6 * max(
                1.0, float(np.abs(want).max()))
        else:
            assert np.array_equal(got, want), dt
    # adversarial checkerboard: the centered int32 pipeline must match
    # cv2 even where ringing is extreme
    cb = (np.indices((64, 64)).sum(0) % 2 * 255).astype(np.uint8)
    want = cv2.resize(cb, (37, 41), interpolation=cv2.INTER_LANCZOS4)
    got = np.asarray(resize_planes(jnp.asarray(cb)[None], (41, 37),
                                   "lanczos4"))[0]
    assert np.array_equal(got, want)
    # API route with a batched rgb frame
    rgb = rng.integers(0, 256, (2, 40, 44, 3), np.uint8)
    want = np.stack([cv2.resize(f, (30, 26), interpolation=cv2.INTER_LANCZOS4)
                     for f in rgb])
    got = np.asarray(ie.resize(jnp.asarray(rgb), (26, 30), "lanczos4"))
    assert np.array_equal(got, want)
