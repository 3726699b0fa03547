"""cv2.connectedComponents parity: numbering bit-exact for BOTH
connectivities (4-conn = SAUF first-pixel raster order, 8-conn = BBDT
min-2x2-block order; docs/PARITY.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def test_conn4_bitexact_vs_cv2():
    rng = np.random.default_rng(0)
    for t in range(30):
        H, W = int(rng.integers(5, 60)), int(rng.integers(5, 60))
        mask = (rng.random((H, W)) > float(rng.uniform(0.3, 0.7))).astype(np.uint8) * 255
        _, want = cv2.connectedComponents(mask, connectivity=4)
        assert np.array_equal(ref.connected_components(mask, 4), want), (H, W)


def test_conn8_bitexact_vs_cv2():
    rng = np.random.default_rng(1)
    for t in range(60):
        H, W = int(rng.integers(3, 60)), int(rng.integers(3, 60))
        mask = (rng.random((H, W)) > float(rng.uniform(0.3, 0.7))).astype(np.uint8) * 255
        _, want = cv2.connectedComponents(mask, connectivity=8)
        assert np.array_equal(ref.connected_components(mask, 8), want), (H, W)


@pytest.mark.parametrize("conn", [4, 8])
def test_device_vs_oracle(conn):
    rng = np.random.default_rng(2 + conn)
    for t in range(5):
        H, W = int(rng.integers(8, 50)), int(rng.integers(8, 50))
        mask = (rng.random((H, W)) > 0.5).astype(np.uint8) * 255
        want = ref.connected_components(mask, conn)
        got = np.asarray(ie.connected_components(jnp.asarray(mask), conn))
        assert np.array_equal(got, want), (H, W)


def test_spiral_long_path():
    """Pointer jumping must converge on a long snaking component."""
    m = np.zeros((41, 41), np.uint8)
    lo, hi = 0, 40
    while lo < hi:
        m[lo, lo:hi + 1] = 255
        m[lo:hi + 1, hi] = 255
        m[hi, lo:hi + 1] = 255
        m[lo + 2:hi + 1, lo] = 255
        lo += 2
        hi -= 2
    want = ref.connected_components(m, 4)
    got = np.asarray(ie.connected_components(jnp.asarray(m), 4))
    assert np.array_equal(got, want)
    assert np.array_equal(want, cv2.connectedComponents(m, connectivity=4)[1])


def test_threshold_to_components_chain():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (40, 50), np.uint8)
    _, mask = ie.threshold(jnp.asarray(img), 127, 255, "binary")
    got = np.asarray(ie.connected_components(mask, 4))
    _, mc = cv2.threshold(img, 127, 255, cv2.THRESH_BINARY)
    _, want = cv2.connectedComponents(mc, connectivity=4)
    assert np.array_equal(got, want)


def test_rejects():
    with pytest.raises(ValueError):
        ie.connected_components(jnp.zeros((4, 4), jnp.uint8), 6)
