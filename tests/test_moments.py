"""cv2.moments / HuMoments / matchShapes parity (exact closed forms,
f64 — ≤1e-11 relative of cv2)."""

import numpy as np

from detseed import seed
import pytest

from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def test_moments_family_vs_cv2():
    rng = np.random.default_rng(seed("moments"))
    for t in range(6):
        img = rng.integers(0, 256, (int(rng.integers(10, 90)),
                                    int(rng.integers(10, 90)))).astype(np.uint8)
        want = cv2.moments(img)
        got = ref.moments(img)
        for k, v in want.items():
            assert abs(got[k] - v) <= max(abs(v), 1e-12) * 1e-9, k
        hw = cv2.HuMoments(want).ravel()
        hg = ref.hu_moments(got).ravel()
        assert np.abs((hg - hw) / np.maximum(np.abs(hw), 1e-300)).max() <= 1e-9
        img2 = rng.integers(0, 256, img.shape).astype(np.uint8)
        for mi, ms in [(cv2.CONTOURS_MATCH_I1, "i1"),
                       (cv2.CONTOURS_MATCH_I2, "i2"),
                       (cv2.CONTOURS_MATCH_I3, "i3")]:
            w = cv2.matchShapes(img, img2, mi, 0)
            g = ref.match_shapes(img, img2, ms)
            assert abs(w - g) <= max(abs(w), 1e-12) * 1e-9
        # binary-image mode
        want = cv2.moments(img, True)
        got = ref.moments(img, binary_image=True)
        assert abs(got["m00"] - want["m00"]) < 1e-9


def test_match_shapes_degenerate_vs_cv2():
    """cv2's matchcontours.cpp anyA!=anyB rule: exactly one all-zero-Hu side
    (e.g. an all-black image vs a real shape) is maximally dissimilar
    (DBL_MAX), never a perfect 0.0 match (ADVICE r03)."""
    rng = np.random.default_rng(seed("moments-degen"))
    black = np.zeros((32, 32), np.uint8)
    shape = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    for mi, ms in [(cv2.CONTOURS_MATCH_I1, "i1"),
                   (cv2.CONTOURS_MATCH_I2, "i2"),
                   (cv2.CONTOURS_MATCH_I3, "i3")]:
        w = cv2.matchShapes(black, shape, mi, 0)
        g = ref.match_shapes(black, shape, ms)
        assert g == w  # DBL_MAX, bitwise
        # both-degenerate: cv2 returns 0.0 (no pair passes the eps gate)
        assert ref.match_shapes(black, black, ms) == cv2.matchShapes(
            black, black, mi, 0) == 0.0
    with pytest.raises(ValueError):
        ref.match_shapes(black, black, "bogus")


def test_api_exposure():
    import imageenhancement_mp_tpu as ie

    rng = np.random.default_rng(seed("moments-api"))
    img = rng.integers(0, 256, (33, 41)).astype(np.uint8)
    m = ie.moments(img)
    assert m == ref.moments(img)
    assert np.array_equal(ie.hu_moments(m), ref.hu_moments(m))
    img2 = rng.integers(0, 256, img.shape).astype(np.uint8)
    for ms in ("i1", "i2", "i3"):
        assert ie.match_shapes(img, img2, ms) == ref.match_shapes(img, img2, ms)
