"""Tier-2 parity: JAX op layer vs the NumPy oracle (SURVEY.md §4).

Runs on the hermetic CPU backend (conftest).  Acceptance mirrors the judged
budget (BASELINE.json:5): exact where the oracle is exact, ±1 LSB where
float tie-breaking can differ (CLAHE blend, non-integral unsharp amounts,
σ>0 Gaussian).  Batch/channel handling is covered by running every op on
all four accepted shapes.
"""

import numpy as np
import pytest

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref


def _rand(rng, shape):
    return rng.integers(0, 256, shape, dtype=np.uint8)


def maxdiff(a, b):
    return int(np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)).max())


def per_plane_ref(fn, img):
    """Apply a single-image oracle fn over any of the 4 accepted shapes."""
    img = np.asarray(img)
    if img.ndim == 2:
        return fn(img)
    if img.ndim == 3:
        if img.shape[-1] in (1, 2, 3, 4):
            return np.stack([fn(img[..., c]) for c in range(img.shape[-1])], axis=-1)
        return np.stack([fn(p) for p in img])
    return np.stack(
        [
            np.stack([fn(img[n, ..., c]) for c in range(img.shape[-1])], axis=-1)
            for n in range(img.shape[0])
        ]
    )


SHAPES = [(37, 53), (64, 64, 3), (4, 37, 53), (2, 33, 47, 3)]


@pytest.mark.parametrize("shape", SHAPES)
def test_equalize_hist_exact(rng, shape):
    img = _rand(rng, shape)
    assert maxdiff(ie.equalize_hist(img), per_plane_ref(ref.equalize_hist, img)) == 0


def test_equalize_hist_constant(rng):
    img = np.full((32, 32), 99, np.uint8)
    assert maxdiff(ie.equalize_hist(img), ref.equalize_hist(img)) == 0


@pytest.mark.parametrize("shape", SHAPES)
def test_gamma_exact(rng, shape):
    img = _rand(rng, shape)
    got = ie.gamma(img, 2.2)
    assert maxdiff(got, per_plane_ref(lambda p: ref.gamma_transform(p, 2.2), img)) == 0


def test_log_exact(rng):
    img = _rand(rng, (64, 64))
    assert maxdiff(ie.log_transform(img), ref.log_transform(img)) == 0


def test_apply_lut_exact(rng):
    img = _rand(rng, (4, 37, 53))
    lut = _rand(rng, 256)
    assert maxdiff(ie.apply_lut(img, lut), per_plane_ref(lambda p: ref.apply_lut(p, lut), img)) == 0


@pytest.mark.parametrize("shape", SHAPES)
def test_contrast_stretch_exact(rng, shape):
    img = _rand(rng, shape)
    assert maxdiff(ie.contrast_stretch(img), per_plane_ref(ref.contrast_stretch, img)) == 0


def test_contrast_stretch_constant():
    img = np.full((16, 16), 42, np.uint8)
    assert maxdiff(ie.contrast_stretch(img), ref.contrast_stretch(img)) == 0


@pytest.mark.parametrize("k", [3, 5, 7])
def test_gaussian_auto_sigma_exact(rng, k):
    img = _rand(rng, (64, 67))
    got = ie.gaussian_blur(img, k, 0.0)
    assert maxdiff(got, ref.gaussian_blur(img, k, 0.0)) == 0


def test_gaussian_sigma_1lsb(rng):
    img = _rand(rng, (64, 67))
    assert maxdiff(ie.gaussian_blur(img, 5, 1.5), ref.gaussian_blur(img, 5, 1.5)) <= 1


@pytest.mark.parametrize("shape", SHAPES)
def test_gaussian_batched(rng, shape):
    img = _rand(rng, shape)
    got = ie.gaussian_blur(img, 5, 0.0)
    assert maxdiff(got, per_plane_ref(lambda p: ref.gaussian_blur(p, 5, 0.0), img)) == 0


def test_laplacian_exact(rng):
    img = _rand(rng, (64, 67))
    assert maxdiff(ie.laplacian(img), ref.laplacian(img)) == 0


def test_laplacian_sharpen_exact(rng):
    img = _rand(rng, (64, 67))
    assert maxdiff(ie.laplacian_sharpen(img), ref.laplacian_sharpen(img)) == 0


@pytest.mark.parametrize("amount", [1.0, 2.0])
def test_unsharp_integral_amount_exact(rng, amount):
    img = _rand(rng, (64, 67))
    assert maxdiff(ie.unsharp_mask(img, amount), ref.unsharp_mask(img, amount)) == 0


def test_unsharp_fractional_amount_1lsb(rng):
    img = _rand(rng, (64, 67))
    assert maxdiff(ie.unsharp_mask(img, 1.5), ref.unsharp_mask(img, 1.5)) <= 1


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("shape", SHAPES)
def test_median_exact(rng, k, shape):
    img = _rand(rng, shape)
    got = ie.median_blur(img, k)
    assert maxdiff(got, per_plane_ref(lambda p: ref.median_blur(p, k), img)) == 0


@pytest.mark.parametrize("clip,grid", [(2.0, (8, 8)), (40.0, (8, 8)), (3.5, (4, 6))])
@pytest.mark.parametrize("hw", [(64, 64), (128, 131), (250, 250)])
def test_clahe_1lsb_vs_ref(rng, clip, grid, hw):
    img = _rand(rng, hw)
    got = ie.clahe(img, clip, grid)
    assert maxdiff(got, ref.clahe(img, clip, grid)) <= 1


def test_clahe_1lsb_vs_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    cv2.setNumThreads(1)
    for hw in [(128, 131), (250, 250), (256, 259)]:
        img = _rand(rng, hw)
        want = cv2.createCLAHE(2.0, (8, 8)).apply(img)
        assert maxdiff(ie.clahe(img, 2.0, (8, 8)), want) <= 1, hw


def test_wrong_dtype_raises():
    with pytest.raises(TypeError):
        ie.equalize_hist(np.zeros((8, 8), np.float32))
