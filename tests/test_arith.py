"""Core arithmetic parity: cv2.add/subtract/multiply/divide/absdiff/
bitwise/min/max/compare (docs/PARITY.md — everything exact except f32
multiply at fractional scales, 1 ulp)."""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _pair(rng, dt, shape):
    if dt is np.float32:
        return ((rng.random(shape) * 600 - 300).astype(np.float32),
                (rng.random(shape) * 600 - 300).astype(np.float32))
    lo, hi = (0, 256) if dt is np.uint8 else (
        (0, 65536) if dt is np.uint16 else (-32768, 32768))
    return (rng.integers(lo, hi, shape).astype(dt),
            rng.integers(lo, hi, shape).astype(dt))


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_ref_vs_cv2(dt):
    rng = np.random.default_rng(seed("arith", dt.__name__))
    for t in range(50):
        a, b = _pair(rng, dt, (int(rng.integers(2, 25)), int(rng.integers(2, 25))))
        sc = float(rng.choice([1.0, 0.5, 2.0, 1.7, 0.23]))
        assert np.array_equal(ref.add(a, b), cv2.add(a, b))
        assert np.array_equal(ref.subtract(a, b), cv2.subtract(a, b))
        assert np.array_equal(ref.absdiff(a, b), cv2.absdiff(a, b))
        assert np.array_equal(ref.minimum(a, b), cv2.min(a, b))
        assert np.array_equal(ref.maximum(a, b), cv2.max(a, b))
        assert np.array_equal(ref.compare(a, b, "le"), cv2.compare(a, b, cv2.CMP_LE))
        wm = cv2.multiply(a, b, scale=sc)
        gm = ref.multiply(a, b, sc)
        if dt is np.float32:
            # build-dependent lane ordering at fractional scales: 1 ulp
            assert np.all(np.abs(wm - gm) <= np.abs(wm) * 2e-7 + 1e-30)
        else:
            assert np.array_equal(wm, gm), sc
        wd = cv2.divide(a, b, scale=sc)
        gd = ref.divide(a, b, sc)
        if dt is np.float32:
            same = (wd == gd) | (np.isnan(wd) & np.isnan(gd))
            assert same.all()
        else:
            assert np.array_equal(wd, gd)
        if dt is not np.float32:
            assert np.array_equal(ref.bitwise_and(a, b), cv2.bitwise_and(a, b))
            assert np.array_equal(ref.bitwise_or(a, b), cv2.bitwise_or(a, b))
            assert np.array_equal(ref.bitwise_xor(a, b), cv2.bitwise_xor(a, b))
            assert np.array_equal(ref.bitwise_not(a), cv2.bitwise_not(a))


def test_multiply_overflow_saturates_to_min():
    # cv2's cvRound(x86 cvtsd2si) overflow: huge POSITIVE u16 product -> 0
    a = np.array([[60000]], np.uint16)
    assert cv2.multiply(a, a)[0, 0] == 0
    assert ref.multiply(a, a)[0, 0] == 0
    assert int(np.asarray(ie.multiply(jnp.asarray(a), jnp.asarray(a)))[0, 0]) == 0


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_device_vs_cv2(dt):
    rng = np.random.default_rng(seed("arithdev", dt.__name__))
    a, b = _pair(rng, dt, (13, 17))
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    for sc in (1.0, 0.5, 1.7):
        wm = cv2.multiply(a, b, scale=sc)
        gm = np.asarray(ie.multiply(ja, jb, sc))
        if dt is np.float32:
            assert np.all(np.abs(wm - gm) <= np.abs(wm) * 2e-7 + 1e-30)
        else:
            assert np.array_equal(wm, gm), sc
        wd = cv2.divide(a, b, scale=sc)
        gd = np.asarray(ie.divide(ja, jb, sc))
        if dt is np.float32:
            same = (wd == gd) | (np.isnan(wd) & np.isnan(gd))
            assert same.all()
        else:
            d = np.abs(wd.astype(np.int64) - gd.astype(np.int64)).max()
            assert d <= 1, (sc, d)  # device f32 quotient razor ties
    assert np.array_equal(np.asarray(ie.add(ja, jb)), cv2.add(a, b))
    assert np.array_equal(np.asarray(ie.absdiff(ja, jb)), cv2.absdiff(a, b))
    assert np.array_equal(np.asarray(ie.compare(ja, jb, "ne")),
                          cv2.compare(a, b, cv2.CMP_NE))


def test_rejects():
    f = jnp.zeros((4, 4), jnp.float32)
    with pytest.raises(TypeError):
        ie.bitwise_and(f, f)
    with pytest.raises(ValueError):
        ie.compare(f, f, "gg")
    with pytest.raises(ValueError):
        ie.add(jnp.zeros((4, 4), jnp.uint8), jnp.zeros((4, 5), jnp.uint8))
