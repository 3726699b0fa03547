"""cv2.inpaint (Telea) oracle: the one BUDGETED op (docs/PARITY.md).

The FMM structure (band/ring marches, Eikonal solve, weight law shape)
is transcribed; the exact outside-T capture rule resists black-box
probing, so parity is pinned as a budget, not bitwise: >=93% exact
pixels and small mean error over the masked region.
"""

import numpy as np
import pytest

import imageenhancement_mp_tpu as ie

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _budget(img, mask, r):
    want = cv2.inpaint(img, mask, r, cv2.INPAINT_TELEA)
    got = ie.inpaint(img, mask, r)
    assert got.dtype == want.dtype and got.shape == want.shape
    d = np.abs(got.astype(int) - want.astype(int))
    # unmasked pixels must be untouched (bitwise)
    assert np.array_equal(got[mask == 0], want[mask == 0])
    return d[mask != 0].mean() if (mask != 0).any() else 0.0, (d == 0).mean()


def test_block_mask():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (30, 34), np.uint8)
    mask = np.zeros_like(img)
    mask[10:16, 12:20] = 255
    mean, exact = _budget(img, mask, 3)
    assert exact >= 0.93 and mean <= 8.0, (mean, exact)


def test_stroke_and_speckle():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (28, 40), np.uint8)
    mask = np.zeros_like(img)
    mask[14:16, 4:36] = 255
    mean, exact = _budget(img, mask, 4)
    # long strokes accumulate the T-capture deviation along the fill
    assert exact >= 0.93 and mean <= 15.0, (mean, exact)
    mask2 = (rng.random(img.shape) < 0.05).astype(np.uint8) * 255
    mean, exact = _budget(img, mask2, 2)
    assert exact >= 0.90 and mean <= 15.0, (mean, exact)


def test_smooth_content_is_tight():
    # on smooth images the directional J-term vanishes and the weighted
    # averages agree closely regardless of the T-capture detail
    yy, xx = np.mgrid[0:30, 0:30]
    img = (100 + 2 * xx + yy).clip(0, 255).astype(np.uint8)
    mask = np.zeros_like(img)
    mask[12:18, 12:18] = 255
    mean, exact = _budget(img, mask, 3)
    assert exact >= 0.97 and mean <= 3.0, (mean, exact)


def test_empty_mask_and_rejects():
    img = np.zeros((8, 8), np.uint8)
    out = ie.inpaint(img, np.zeros((8, 8), np.uint8), 3)
    assert np.array_equal(out, img)
    with pytest.raises(ValueError):
        ie.inpaint(img, np.zeros((8, 8), np.uint8), 3, flags="ns")
