"""Pallas kernel parity (interpret mode on CPU — the "fake TPU" tier,
SURVEY.md §4)."""

import numpy as np
import pytest

from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.kernels.conv import (
    gaussian_blur_pallas,
    unsharp_mask_pallas,
)


def maxdiff(a, b):
    return int(np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)).max())


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("shape", [(2, 64, 67), (1, 37, 200)])
def test_gaussian_pallas_bitexact(rng, k, shape):
    x = rng.integers(0, 256, shape, dtype=np.uint8)
    got = gaussian_blur_pallas(x, k, 0.0, interpret=True)
    want = np.stack([ref.gaussian_blur(p, k, 0.0) for p in x])
    assert maxdiff(got, want) == 0


def test_gaussian_pallas_sigma(rng):
    x = rng.integers(0, 256, (1, 64, 67), dtype=np.uint8)
    got = gaussian_blur_pallas(x, 5, 1.5, interpret=True)
    assert maxdiff(got, ref.gaussian_blur(x[0], 5, 1.5)[None]) <= 1


@pytest.mark.parametrize("amount", [1.0, 2.0])
def test_unsharp_pallas_bitexact(rng, amount):
    x = rng.integers(0, 256, (2, 100, 131), dtype=np.uint8)
    got = unsharp_mask_pallas(x, amount, 5, 0.0, interpret=True)
    want = np.stack([ref.unsharp_mask(p, amount, 5, 0.0) for p in x])
    assert maxdiff(got, want) == 0


def test_unsharp_pallas_multitile(rng):
    # tall image -> several row stripes, exercises the double-buffer loop
    x = rng.integers(0, 256, (1, 700, 131), dtype=np.uint8)
    got = unsharp_mask_pallas(x, 1.0, 5, 0.0, interpret=True)
    assert maxdiff(got, ref.unsharp_mask(x[0], 1.0, 5, 0.0)[None]) == 0


def test_ops_dispatch_forced_pallas(rng):
    """Force the Pallas path through the public ops layer (interpret on CPU)."""
    from imageenhancement_mp_tpu import config
    from imageenhancement_mp_tpu.ops.filters import unsharp_mask_planes

    x = rng.integers(0, 256, (1, 64, 67), dtype=np.uint8)
    config.use_pallas_kernels = True
    try:
        got = unsharp_mask_planes(x, 1.0, 5, 0.0)
    finally:
        config.use_pallas_kernels = None
    assert maxdiff(got, ref.unsharp_mask(x[0], 1.0, 5, 0.0)[None]) == 0


def test_median_pallas_bitexact(rng):
    from imageenhancement_mp_tpu.kernels.median import median_blur_pallas

    for k in (3, 5):
        x = rng.integers(0, 256, (2, 100, 131), dtype=np.uint8)
        got = median_blur_pallas(x, k, interpret=True)
        want = np.stack([ref.median_blur(p, k) for p in x])
        assert maxdiff(got, want) == 0, k


def test_median_pallas_multitile(rng):
    from imageenhancement_mp_tpu.kernels.median import median_blur_pallas

    x = rng.integers(0, 256, (1, 700, 131), dtype=np.uint8)
    got = median_blur_pallas(x, 3, tile_rows=128, interpret=True)
    assert maxdiff(got, ref.median_blur(x[0], 3)[None]) == 0


def test_unsharp_pallas_fractional_amount(rng):
    # fixed-point conv + f32 epilogue path
    x = rng.integers(0, 256, (1, 64, 131), dtype=np.uint8)
    got = unsharp_mask_pallas(x, 1.5, 5, 0.0, interpret=True)
    assert maxdiff(got, ref.unsharp_mask(x[0], 1.5, 5, 0.0)[None]) <= 1


@pytest.mark.parametrize("km,amount", [(3, 1.0), (5, 1.0), (5, 1.5)])
def test_fused_median_unsharp_bitexact(rng, km, amount):
    from imageenhancement_mp_tpu.kernels.fused import median_unsharp_pallas

    x = rng.integers(0, 256, (2, 64, 131), dtype=np.uint8)
    got = median_unsharp_pallas(x, km, amount, 5, interpret=True)
    want = np.stack([ref.unsharp_mask(ref.median_blur(p, km), amount, 5, 0.0) for p in x])
    assert maxdiff(got, want) == 0


def test_fused_median_unsharp_small_image_fallback(rng):
    from imageenhancement_mp_tpu.kernels.fused import median_unsharp_pallas

    x = rng.integers(0, 256, (1, 10, 11), dtype=np.uint8)  # below strip threshold
    got = median_unsharp_pallas(x, 5, 1.0, 5, interpret=True)
    want = ref.unsharp_mask(ref.median_blur(x[0], 5), 1.0, 5, 0.0)[None]
    assert maxdiff(got, want) == 0


def test_median_pallas_u16(rng):
    """u16 Pallas median (interpret on CPU) vs oracle — exact, both sizes."""
    from imageenhancement_mp_tpu.kernels.median import median_blur_pallas
    from imageenhancement_mp_tpu import ref

    planes = rng.integers(0, 65536, (2, 53, 67), dtype=np.uint16)
    for k in (3, 5):
        got = np.asarray(median_blur_pallas(planes, k))
        want = np.stack([ref.median_blur(p, k) for p in planes])
        assert got.dtype == np.uint16
        assert np.array_equal(got, want), k


def test_median_pallas_u16_dispatch(rng):
    """ops.median_blur_planes routes u16 k3/k5 to the Pallas kernel."""
    from imageenhancement_mp_tpu.ops.median import median_blur_planes
    from imageenhancement_mp_tpu import ref

    planes = rng.integers(0, 65536, (1, 40, 44), dtype=np.uint16)
    got = np.asarray(median_blur_planes(planes, 5, backend="pallas"))
    want = np.stack([ref.median_blur(p, 5) for p in planes])
    assert np.array_equal(got, want)
