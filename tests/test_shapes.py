"""utils/shapes.py: the layout-ambiguity rule has one source of truth.

`treat_as_hwc` decides whether a 3-D array is one [H,W,C] image; both
`as_planes` and the pooled-histogram channel inference in api.equalize_hist
must route through it, so this test pins their agreement for every shape
class around the ≤4 boundary.
"""

import numpy as np
import pytest

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu.utils.shapes import as_planes, treat_as_hwc


@pytest.mark.parametrize("last", [1, 2, 3, 4, 5, 6])
@pytest.mark.parametrize("channels_last", [True, False])
def test_as_planes_matches_treat_as_hwc(last, channels_last):
    img = np.zeros((7, 9, last), np.uint8)
    planes, _ = as_planes(img, channels_last=channels_last)
    if treat_as_hwc(img, channels_last):
        assert planes.shape == (last, 7, 9)  # [H,W,C] -> C planes
    else:
        assert planes.shape == (7, 9, last)  # [N,H,W] passthrough


def test_pooled_equalize_single_image_matches_per_frame(rng):
    """For a single [H,W,C] image, per-channel pooling over a batch of one
    must equal the per-frame path — this holds only if equalize_hist infers
    the channel count with the same rule as_planes uses."""
    img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    per_frame = np.asarray(ie.equalize_hist(img))
    pooled = np.asarray(ie.equalize_hist(img, per_frame=False))
    np.testing.assert_array_equal(pooled, per_frame)


def test_pooled_equalize_nhw_not_treated_as_channels(rng):
    """[N,H,W] grayscale batches pool ONE histogram across frames: each
    frame's output must differ from its per-frame equalization when the
    frames have different histograms."""
    a = rng.integers(0, 64, (30, 40), dtype=np.uint8)
    b = rng.integers(128, 256, (30, 40), dtype=np.uint8)
    batch = np.stack([a, b])
    pooled = np.asarray(ie.equalize_hist(batch, per_frame=False))
    per_frame = np.asarray(ie.equalize_hist(batch))
    assert not np.array_equal(pooled, per_frame)
