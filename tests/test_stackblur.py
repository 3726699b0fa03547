"""cv2.stackBlur: budgeted op (pinned interior law, SIMD-scheduled edges)."""

import numpy as np
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu.ref.stackblur import stack_blur as ref_sb
from detseed import seed

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def test_oracle_budget_vs_cv2():
    rng = np.random.default_rng(seed("stackblur"))
    for t in range(12):
        H = int(rng.integers(30, 70))
        W = int(rng.integers(30, 90))
        k = int(rng.choice([3, 5, 7, 9, 11]))
        img = rng.integers(0, 256, (H, W), np.uint8)
        want = cv2.stackBlur(img, (k, k))
        got = ref_sb(img, k)
        d = np.abs(got.astype(int) - want.astype(int))
        r = k // 2
        assert d.max() <= 2, (H, W, k, d.max())
        if W > 4 * r + 20:
            assert d[:, 2 * r + 8 : -(2 * r + 8)].max() <= 1, (H, W, k)


def test_rect_kernel_and_axis_order():
    rng = np.random.default_rng(seed("stackblur", "rect"))
    img = rng.integers(0, 256, (40, 50), np.uint8)
    want = cv2.stackBlur(img, (5, 9))  # cv2 Size is (w, h)
    got = ref_sb(img, (9, 5))          # ours is (rows, cols)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_device_matches_oracle_bitwise():
    rng = np.random.default_rng(seed("stackblur", "dev"))
    for t in range(6):
        img = rng.integers(0, 256, (3, 30, 40), np.uint8)
        k = int(rng.choice([3, 5, 9, 13]))
        got = np.asarray(ie.stack_blur(jnp.asarray(img), k))
        want = np.stack([ref_sb(p, k) for p in img])
        assert np.array_equal(got, want), k
    # color HWC input
    img = rng.integers(0, 256, (20, 24, 3), np.uint8)
    got = np.asarray(ie.stack_blur(jnp.asarray(img), 5))
    want = np.stack([ref_sb(img[..., c], 5) for c in range(3)], axis=-1)
    assert np.array_equal(got, want)


def test_rejects():
    img = jnp.zeros((8, 8), jnp.uint8)
    with pytest.raises(ValueError):
        ie.stack_blur(img, 4)
    with pytest.raises(TypeError):
        ie.stack_blur(jnp.zeros((8, 8), jnp.uint16), 3)
