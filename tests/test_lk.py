"""cv2.calcOpticalFlowPyrLK / buildOpticalFlowPyramid parity
(docs/PARITY.md "Pyramidal Lucas-Kanade")."""

import numpy as np

from detseed import seed
import pytest

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _shift(img, dx, dy):
    M = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))


def _pair(rng, lo=50, hi=120):
    H, W = int(rng.integers(lo, hi)), int(rng.integers(lo, hi))
    base = cv2.GaussianBlur(rng.integers(0, 256, (H, W), np.uint8), (5, 5), 0)
    nxt = _shift(base, float(rng.uniform(-4, 4)), float(rng.uniform(-4, 4)))
    pts = cv2.goodFeaturesToTrack(base, 15, 0.01, 6)
    return base, nxt, None if pts is None else pts.reshape(-1, 2)


def _assert_triple(got, gs, ge, want, ws, we, ctx):
    want = want.reshape(-1, 2)
    ws = ws.reshape(-1)
    we = we.reshape(-1)
    assert np.array_equal(got, want), (ctx, np.abs(got - want).max())
    assert np.array_equal(gs, ws), ctx
    m = gs == 1  # cv2 leaves err uninitialized for some status-0 points
    if m.any():
        assert np.array_equal(ge[m], we[m]), (ctx, np.abs(ge[m] - we[m]).max())


def test_scharr_deriv_exact():
    rng = np.random.default_rng(seed("lk-scharr"))
    for _ in range(25):
        H, W = int(rng.integers(8, 60)), int(rng.integers(8, 60))
        img = rng.integers(0, 256, (H, W), np.uint8)
        _, pyr = cv2.buildOpticalFlowPyramid(img, (7, 7), 0, None, True)
        assert np.array_equal(ref.scharr_deriv(img), pyr[1])


def test_pyramid_levels_and_clamp():
    rng = np.random.default_rng(seed("lk-pyr"))
    for _ in range(25):
        H, W = int(rng.integers(16, 120)), int(rng.integers(16, 120))
        win = int(rng.choice([5, 7, 11, 21]))
        ml = int(rng.integers(0, 5))
        img = rng.integers(0, 256, (H, W), np.uint8)
        n, pyr = cv2.buildOpticalFlowPyramid(img, (win, win), ml, None, False)
        gn, levels = ref.build_optical_flow_pyramid(img, (win, win), ml)
        assert gn == n, (H, W, win, ml)
        for lv, (a, b) in enumerate(zip(levels, pyr)):
            assert np.array_equal(a, b), (H, W, win, ml, lv)


def _assert_budget(got, gs, ge, want, ws, we, ctx, stats):
    # status bitwise ALWAYS; points bitwise except the deep-iteration
    # ulp-amplification class (<=1e-4 px, rate asserted at file level)
    want = want.reshape(-1, 2)
    ws = ws.reshape(-1)
    we = we.reshape(-1)
    assert np.array_equal(gs, ws), ctx
    for k in range(len(ws)):
        stats[1] += 1
        if (np.array_equal(got[k], want[k])
                and (gs[k] != 1 or ge[k] == we[k])):
            stats[0] += 1
        else:
            assert np.abs(got[k] - want[k]).max() <= 1e-4, (ctx, k)


@pytest.mark.parametrize("win", [3, 7, 9, 15, 21])
def test_oracle_vs_cv2_bitwise(win):
    rng = np.random.default_rng(seed("lk-oracle", win))
    stats = [0, 0]
    for trial in range(8):
        base, nxt, pts = _pair(rng)
        if pts is None:
            continue
        ml = int(rng.integers(0, 4))
        for crit, mc, eps, oeps in [
            (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 30, 0.01, 0.01),
            # COUNT-only: cv2 defaults epsilon to 0.01 internally
            (cv2.TERM_CRITERIA_COUNT, 12, 0.0, 0.01),
            (cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 50, 0.001,
             0.001),
        ]:
            want, ws, we = cv2.calcOpticalFlowPyrLK(
                base, nxt, pts.reshape(-1, 1, 2), None,
                winSize=(win, win), maxLevel=ml, criteria=(crit, mc, eps))
            got, gs, ge = ref.calc_optical_flow_pyr_lk(
                base, nxt, pts, (win, win), ml, mc, oeps)
            _assert_budget(got, gs, ge, want, ws, we, (win, ml, mc, eps),
                           stats)
    assert stats[0] / stats[1] > 0.97, f"bitwise rate: {stats}"


def test_oracle_min_eigenvals_flag():
    rng = np.random.default_rng(seed("lk-eig"))
    base, nxt, pts = _pair(rng)
    want, ws, we = cv2.calcOpticalFlowPyrLK(
        base, nxt, pts.reshape(-1, 1, 2), None, winSize=(9, 9), maxLevel=1,
        criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 30, 0.01),
        flags=cv2.OPTFLOW_LK_GET_MIN_EIGENVALS)
    got, gs, ge = ref.calc_optical_flow_pyr_lk(
        base, nxt, pts, (9, 9), 1, 30, 0.01, get_min_eigenvals=True)
    assert np.array_equal(got, want.reshape(-1, 2))
    assert np.array_equal(ge, we.reshape(-1))


@pytest.mark.parametrize("win", [5, 9, 13, 21])
def test_device_vs_oracle_bitwise(win):
    # the device carries the oracle's contract with ZERO extra budget
    rng = np.random.default_rng(seed("lk-dev", win))
    stats = [0, 0]
    for trial in range(4):
        base, nxt, pts = _pair(rng, 50, 100)
        if pts is None:
            continue
        ml = int(rng.integers(0, 3))
        go, so, eo = ref.calc_optical_flow_pyr_lk(
            base, nxt, pts, (win, win), ml, 30, 0.01)
        got, gs, ge = ie.calc_optical_flow_pyr_lk(
            base, nxt, pts, (win, win), ml)
        got, gs, ge = np.asarray(got), np.asarray(gs), np.asarray(ge)
        assert np.array_equal(got, go), (win, ml, np.abs(got - go).max())
        assert np.array_equal(gs, so), (win, ml)
        m = gs == 1
        assert np.array_equal(ge[m], eo[m]), (win, ml)
        want, ws, we = cv2.calcOpticalFlowPyrLK(
            base, nxt, pts.reshape(-1, 1, 2), None, winSize=(win, win),
            maxLevel=ml,
            criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS,
                      30, 0.01))
        _assert_budget(got, gs, ge, want, ws, we, (win, ml), stats)
    assert stats[0] / stats[1] > 0.95, f"bitwise rate: {stats}"


def test_device_fast_path_tracks():
    # exact=False: free-order reductions — same algorithm, must track
    # the same motion to sub-0.1px on well-conditioned corners.
    rng = np.random.default_rng(seed("lk-fast"))
    base, nxt, pts = _pair(rng)
    want, ws, _ = cv2.calcOpticalFlowPyrLK(
        base, nxt, pts.reshape(-1, 1, 2), None, winSize=(15, 15), maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 30, 0.01))
    got, gs, _ = ie.calc_optical_flow_pyr_lk(
        base, nxt, pts, (15, 15), 2, exact=False)
    m = (np.asarray(gs) == 1) & (ws.reshape(-1) == 1)
    assert m.any()
    d = np.abs(np.asarray(got)[m] - want.reshape(-1, 2)[m]).max()
    assert d < 0.1, d


def test_tracks_known_translation():
    # sanity: recovered flow equals the synthetic shift
    rng = np.random.default_rng(seed("lk-known"))
    base = cv2.GaussianBlur(rng.integers(0, 256, (90, 110), np.uint8),
                            (5, 5), 0)
    dx, dy = 2.3, -1.6
    nxt = _shift(base, dx, dy)
    pts = cv2.goodFeaturesToTrack(base, 12, 0.01, 10).reshape(-1, 2)
    inner = ((pts[:, 0] > 15) & (pts[:, 0] < 95)
             & (pts[:, 1] > 15) & (pts[:, 1] < 75))
    got, gs, _ = ie.calc_optical_flow_pyr_lk(base, nxt, pts, (15, 15), 2)
    got, gs = np.asarray(got), np.asarray(gs)
    m = inner & (gs == 1)
    assert m.sum() >= 4
    flow = got[m] - pts[m]
    assert np.abs(flow - np.array([dx, dy])).max() < 0.25
