"""cv2.matchTemplate parity (float tolerance — docs/PARITY.md) and
cv2.minMaxLoc."""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.ops.template import match_template_planes

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)

_M = {"sqdiff": cv2.TM_SQDIFF, "sqdiff_normed": cv2.TM_SQDIFF_NORMED,
      "ccorr": cv2.TM_CCORR, "ccorr_normed": cv2.TM_CCORR_NORMED,
      "ccoeff": cv2.TM_CCOEFF, "ccoeff_normed": cv2.TM_CCOEFF_NORMED}


@pytest.mark.parametrize("method", sorted(_M))
@pytest.mark.parametrize("dt", [np.uint8, np.float32])
def test_ref_vs_cv2(method, dt):
    rng = np.random.default_rng(seed("mt", method, dt.__name__))
    for t in range(20):
        H, W = int(rng.integers(12, 70)), int(rng.integers(12, 70))
        th, tw = int(rng.integers(3, 12)), int(rng.integers(3, 12))
        if dt is np.float32:
            img = (rng.random((H, W)) * 255).astype(np.float32)
            tpl = (rng.random((th, tw)) * 255).astype(np.float32)
        else:
            img = rng.integers(0, 256, (H, W), np.uint8)
            tpl = rng.integers(0, 256, (th, tw), np.uint8)
        want = cv2.matchTemplate(img, tpl, _M[method])
        got = ref.match_template(img, tpl, method)
        scale = max(1.0, float(np.abs(want).max()))
        assert float(np.abs(got - want).max()) / scale <= 1e-5, (H, W, th, tw)


def test_sqdiff_normed_clamps_to_one():
    # mismatching windows exceed 1 in the naive ratio; cv2 returns 1.0
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (30, 30), np.uint8)
    tpl = rng.integers(0, 256, (6, 6), np.uint8)
    want = cv2.matchTemplate(img, tpl, cv2.TM_SQDIFF_NORMED)
    got = ref.match_template(img, tpl, "sqdiff_normed")
    assert (want <= 1.0).all() and (got <= 1.0).all()
    assert np.isclose(got, want, atol=1e-5).all()
    assert (want == 1.0).any()  # the clamp actually fires on this data


@pytest.mark.parametrize("method", sorted(_M))
def test_device_vs_cv2(method):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 50), np.uint8)
    tpl = rng.integers(0, 256, (7, 9), np.uint8)
    want = cv2.matchTemplate(img, tpl, _M[method])
    got = np.asarray(match_template_planes(jnp.asarray(img)[None], tpl, method))[0]
    scale = max(1.0, float(np.abs(want).max()))
    assert float(np.abs(got - want).max()) / scale <= 1e-4


def test_peak_finding_end_to_end():
    """Plant the template and recover its location via minMaxLoc."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 200, (60, 70), np.uint8)
    tpl = rng.integers(0, 256, (9, 11), np.uint8)
    img[23:32, 41:52] = tpl
    r = np.asarray(ie.match_template(jnp.asarray(img), tpl, "ccoeff_normed"))
    _, mx, _, loc = ie.min_max_loc(r)
    assert loc == (41, 23) and mx > 0.99
    assert ie.min_max_loc(r) == cv2.minMaxLoc(
        cv2.matchTemplate(img, tpl, cv2.TM_CCOEFF_NORMED)) or mx > 0.99


def test_rejects():
    img = jnp.zeros((8, 8), jnp.uint8)
    with pytest.raises(ValueError):
        ie.match_template(img, np.zeros((3, 3)), "tm_magic")
    with pytest.raises(ValueError):
        ie.match_template(img, np.zeros((10, 10)))
