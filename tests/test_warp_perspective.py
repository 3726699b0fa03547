"""cv2.warpPerspective / getPerspectiveTransform / getAffineTransform parity.

Budgets (docs/PARITY.md): warp_perspective BIT-EXACT for every dtype
(hybrid-f32 perspective coordinate field for u8/u16/f32, legacy
fixed-point for i16); get_affine_transform BIT-EXACT;
get_perspective_transform BIT-EXACT on every LU-path (normally
conditioned) quad, structural-only (unit-norm homogeneous null vector)
on cv2 5.0's degenerate-quad SVD fallback.
"""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.ops.warp import warp_perspective_planes

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)

_B = {"constant": cv2.BORDER_CONSTANT, "replicate": cv2.BORDER_REPLICATE}
_I = {"linear": cv2.INTER_LINEAR, "nearest": cv2.INTER_NEAREST}


def _img(rng, dt, shape):
    if dt is np.float32:
        return (rng.random(shape) * 500 - 100).astype(np.float32)
    lo, hi = (0, 256) if dt is np.uint8 else (
        (0, 65536) if dt is np.uint16 else (-32768, 32768))
    return rng.integers(lo, hi, shape).astype(dt)


def _mat(rng):
    M = np.eye(3)
    M[:2] = [[rng.uniform(0.3, 2), rng.uniform(-0.5, 0.5), rng.uniform(-8, 8)],
             [rng.uniform(-0.5, 0.5), rng.uniform(0.3, 2), rng.uniform(-8, 8)]]
    M[2, :2] = rng.uniform(-0.01, 0.01, 2)
    return M


@pytest.mark.parametrize("interp", ["linear", "nearest"])
@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_ref_vs_cv2(interp, dt):
    rng = np.random.default_rng(seed("warpp", interp, dt.__name__))
    for t in range(40):
        H, W = int(rng.integers(4, 45)), int(rng.integers(4, 45))
        oh, ow = int(rng.integers(4, 45)), int(rng.integers(4, 45))
        img = _img(rng, dt, (H, W))
        M = _mat(rng)
        bmode = ["constant", "replicate"][t % 2]
        bval = float(rng.integers(0, 100))
        want = cv2.warpPerspective(img, M, (ow, oh), flags=_I[interp],
                                   borderMode=_B[bmode], borderValue=bval)
        got = ref.warp_perspective(img, M, (oh, ow), interp, bmode, bval)
        if dt is np.float32:
            assert np.array_equal(got, want), (H, W, oh, ow)
        else:
            d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
            assert d == 0, (H, W, oh, ow, d)


def test_inverse_map_roundtrip():
    rng = np.random.default_rng(seed("warpp-inv"))
    img = rng.integers(0, 256, (20, 25), np.uint8).astype(np.uint8)
    M = _mat(rng)
    a = ref.warp_perspective(img, M, (18, 22))
    b = ref.warp_perspective(img, ref.invert_perspective(M), (18, 22),
                             inverse_map=True)
    assert np.array_equal(a, b)
    want = cv2.warpPerspective(img, M, (22, 18),
                               flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
    got = ref.warp_perspective(img, M, (18, 22), inverse_map=True)
    assert np.array_equal(got, want)


def test_get_affine_transform_bitwise():
    rng = np.random.default_rng(seed("getaff"))
    for t in range(200):
        sc = [1.0, 100.0, 1e4, 0.01][t % 4]
        src = (rng.uniform(0, 1, (3, 2)) * sc).astype(np.float32)
        dst = (rng.uniform(0, 1, (3, 2)) * sc).astype(np.float32)
        a = ref.get_affine_transform(src, dst)
        b = cv2.getAffineTransform(src, dst)
        assert np.array_equal(a, b), t
    # collinear -> both fail to zeros
    s = np.float32([[0, 0], [1, 1], [2, 2]])
    d = np.float32([[0, 0], [1, 0], [0, 1]])
    assert np.array_equal(ref.get_affine_transform(s, d),
                          cv2.getAffineTransform(s, d))


def test_get_perspective_transform_bitwise_lu_path():
    rng = np.random.default_rng(seed("getpersp"))
    n_fallback = 0
    for t in range(500):
        sc = [1.0, 100.0, 1e4, 0.01][t % 4]
        off = [0.0, -50.0, 1e3][t % 3]
        src = (rng.uniform(0, 1, (4, 2)) * sc + off).astype(np.float32)
        dst = (rng.uniform(0, 1, (4, 2)) * sc + off).astype(np.float32)
        a = ref.get_perspective_transform(src, dst)
        b = cv2.getPerspectiveTransform(src, dst)
        if abs(np.linalg.norm(b) - 1) < 1e-9:
            # cv2 took its degenerate-quad SVD fallback: structural match
            n_fallback += 1
            assert abs(np.linalg.norm(a) - 1) < 1e-9, t
        else:
            assert np.array_equal(a, b), t
    assert n_fallback <= 5  # fuzz stream is overwhelmingly well-conditioned


def test_get_perspective_transform_degenerate_structural():
    # collinear src: cv2 5.0 returns a unit-norm homogeneous null vector
    src = np.float32([[0, 0], [1, 1], [2, 2], [3, 3]])
    dst = np.float32([[0, 0], [1, 0], [1, 1], [0, 1]])
    b = cv2.getPerspectiveTransform(src, dst)
    a = ref.get_perspective_transform(src, dst)
    assert abs(np.linalg.norm(b) - 1) < 1e-9   # pins cv2's behavior
    assert abs(np.linalg.norm(a) - 1) < 1e-9


def test_transform_solvers_roundtrip_api():
    src = np.float32([[0, 0], [30, 1], [28, 27], [1, 29]])
    dst = np.float32([[2, 3], [25, 0], [29, 25], [0, 24]])
    M = ie.get_perspective_transform(src, dst)
    assert np.array_equal(M, cv2.getPerspectiveTransform(src, dst))
    A = ie.get_affine_transform(src[:3], dst[:3])
    assert np.array_equal(A, cv2.getAffineTransform(src[:3], dst[:3]))


@pytest.mark.parametrize("interp", ["linear", "nearest"])
@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_device_vs_oracle(interp, dt):
    rng = np.random.default_rng(seed("warppdev", interp, dt.__name__))
    img = _img(rng, dt, (29, 34))
    M = _mat(rng)
    want = ref.warp_perspective(img, M, (25, 31), interp, "constant", 7.0)
    got = np.asarray(warp_perspective_planes(
        jnp.asarray(img)[None], M, (25, 31), interp, "constant", 7.0))[0]
    assert np.array_equal(got, want)


def test_device_replicate_border():
    rng = np.random.default_rng(seed("warppdev-rep"))
    img = rng.integers(0, 256, (20, 22), np.uint8).astype(np.uint8)
    M = _mat(rng)
    want = ref.warp_perspective(img, M, (24, 26), "linear", "replicate")
    got = np.asarray(warp_perspective_planes(
        jnp.asarray(img)[None], M, (24, 26), "linear", "replicate"))[0]
    assert np.array_equal(got, want)


def test_api_batch_rgb():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (2, 24, 30, 3), np.uint8).astype(np.uint8)
    src = np.float32([[0, 0], [29, 0], [29, 23], [0, 23]])
    dst = np.float32([[1, 2], [27, 0], [28, 22], [0, 21]])
    M = ie.get_perspective_transform(src, dst)
    out = np.asarray(ie.warp_perspective(jnp.asarray(img), M, (24, 30)))
    assert out.shape == (2, 24, 30, 3)
    want = cv2.warpPerspective(img[0], M, (30, 24))
    assert np.array_equal(out[0], want)


def test_rejects():
    img = jnp.zeros((4, 4), jnp.uint8)
    M = np.eye(3)
    with pytest.raises(ValueError):
        ie.warp_perspective(img, M, (0, 3))
    with pytest.raises(ValueError):
        ie.warp_perspective(img, M, (3, 3), "area")
    with pytest.raises(ValueError):
        ie.warp_perspective(img, M, (3, 3), "linear", "reflect")
