"""Tier-1 parity: NumPy oracle (`ref/`) vs OpenCV 5.0.0 directly.

This freezes the behavioral contract of SURVEY.md §8.  Every judged op is
checked on randomized images including the edge cases called out in
SURVEY.md §4 (constant image, single-bin histogram, non-divisible CLAHE
sizes, saturating unsharp).  Skipped wholesale if cv2 is unavailable — the
oracle formulas themselves were pinned against OpenCV 5.0.0 (SURVEY.md §8).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)

from imageenhancement_mp_tpu import ref


def _rand(rng, shape):
    return rng.integers(0, 256, shape, dtype=np.uint8)


SHAPES = [(64, 64), (128, 131), (256, 259), (512, 512), (250, 250), (33, 47)]


def maxdiff(a, b):
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


# ---------------------------------------------------------------- LUT family

def test_lut_exact(rng):
    img = _rand(rng, (128, 131))
    lut = _rand(rng, 256)
    assert maxdiff(ref.apply_lut(img, lut), cv2.LUT(img, lut)) == 0


@pytest.mark.parametrize("gamma", [0.4, 1.0, 2.2])
def test_gamma_matches_cv2_lut_path(rng, gamma):
    # gamma transform is LUT-based; verify our LUT applied via cv2.LUT equals
    # our full transform (the formula itself is the standard power law).
    img = _rand(rng, (64, 64))
    lut = ref.gamma_lut(gamma)
    assert maxdiff(ref.gamma_transform(img, gamma), cv2.LUT(img, lut)) == 0


def test_contrast_stretch_exact(rng):
    for shape in SHAPES:
        img = _rand(rng, shape)
        want = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX)
        assert maxdiff(ref.contrast_stretch(img), want) == 0


def test_contrast_stretch_constant_image():
    img = np.full((16, 16), 77, np.uint8)
    want = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX)
    assert maxdiff(ref.contrast_stretch(img), want) == 0


# ------------------------------------------------------------------- hist-eq

def test_equalize_hist_exact(rng):
    for shape in SHAPES:
        img = _rand(rng, shape)
        assert maxdiff(ref.equalize_hist(img), cv2.equalizeHist(img)) == 0


def test_equalize_hist_constant_image():
    img = np.full((32, 32), 200, np.uint8)
    assert maxdiff(ref.equalize_hist(img), cv2.equalizeHist(img)) == 0


def test_equalize_hist_two_values(rng):
    img = np.where(_rand(rng, (64, 64)) > 128, 200, 10).astype(np.uint8)
    assert maxdiff(ref.equalize_hist(img), cv2.equalizeHist(img)) == 0


# --------------------------------------------------------------------- CLAHE

@pytest.mark.parametrize("clip,grid", [(2.0, (8, 8)), (40.0, (8, 8)), (3.5, (4, 6)), (1.0, (2, 2))])
def test_clahe_within_1lsb(rng, clip, grid):
    for shape in SHAPES + [(16, 16)]:
        img = _rand(rng, shape)
        # cv2 takes tileGridSize as Size(tilesX, tilesY) = (cols, rows)
        want = cv2.createCLAHE(clip, (grid[1], grid[0])).apply(img)
        got = ref.clahe(img, clip, grid)
        assert maxdiff(got, want) <= 1, (shape, clip, grid)


def test_clahe_constant_image():
    img = np.full((64, 64), 128, np.uint8)
    want = cv2.createCLAHE(2.0, (8, 8)).apply(img)
    assert maxdiff(ref.clahe(img, 2.0, (8, 8)), want) <= 1


# ------------------------------------------------------------------- filters

@pytest.mark.parametrize("k", [3, 5, 7])
def test_gaussian_auto_sigma_bitexact(rng, k):
    for shape in SHAPES:
        img = _rand(rng, shape)
        want = cv2.GaussianBlur(img, (k, k), 0)
        assert maxdiff(ref.gaussian_blur(img, k, 0.0), want) == 0


@pytest.mark.parametrize("k,sigma", [(3, 1.0), (5, 1.5), (7, 2.0), (5, 0.8), (13, 3.3), (21, 0.6)])
def test_gaussian_explicit_sigma_bitexact(rng, k, sigma):
    # round 2: cv2's fixed-point sigma>0 scheme reverse-engineered
    # (cumulative-quantized taps, ref/ops.py _cdf_fixed_taps) — exact
    img = _rand(rng, (256, 259))
    want = cv2.GaussianBlur(img, (k, k), sigma)
    assert maxdiff(ref.gaussian_blur(img, k, sigma), want) == 0


@pytest.mark.parametrize("k,sigma", [(5, 1.3), (9, 0.0), (11, 0.0), (13, 0.0), (11, 2.6)])
def test_gaussian_u16_bitexact(rng, k, sigma):
    # uint16: Q16 cumulative-quantized taps (sigma=0 k<=9 reuses the
    # dyadic /256 kernels, a pinned cv2 quirk) — exact for any sigma
    img = rng.integers(0, 65536, (128, 131), dtype=np.uint16)
    want = cv2.GaussianBlur(img, (k, k), sigma)
    assert maxdiff(ref.gaussian_blur(img, k, sigma), want) == 0


def test_laplacian_exact(rng):
    for shape in SHAPES:
        img = _rand(rng, shape)
        want = cv2.Laplacian(img, cv2.CV_16S, ksize=1)
        assert maxdiff(ref.laplacian(img), want) == 0


def test_laplacian_sharpen_exact(rng):
    img = _rand(rng, (128, 131))
    lap = cv2.Laplacian(img, cv2.CV_16S, ksize=1)
    want = np.clip(img.astype(np.int32) - lap.astype(np.int32), 0, 255).astype(np.uint8)
    assert maxdiff(ref.laplacian_sharpen(img), want) == 0


@pytest.mark.parametrize("amount", [0.5, 1.0, 1.5])
def test_unsharp_exact(rng, amount):
    for shape in SHAPES:
        img = _rand(rng, shape)
        blur = cv2.GaussianBlur(img, (5, 5), 0)
        want = cv2.addWeighted(img, 1.0 + amount, blur, -amount, 0)
        assert maxdiff(ref.unsharp_mask(img, amount, 5, 0.0), want) == 0


def test_unsharp_saturating(rng):
    # force saturation at both ends
    img = np.where(_rand(rng, (64, 64)) > 128, 250, 5).astype(np.uint8)
    blur = cv2.GaussianBlur(img, (5, 5), 0)
    want = cv2.addWeighted(img, 3.0, blur, -2.0, 0)
    assert maxdiff(ref.unsharp_mask(img, 2.0, 5, 0.0), want) == 0


def test_addweighted_rounding_half_to_even():
    a = np.array([[1, 3, 5]], np.uint8)
    z = np.zeros_like(a)
    assert list(cv2.addWeighted(a, 0.5, z, 0.0, 0).ravel()) == [0, 2, 2]


@pytest.mark.parametrize("k", [3, 5])
def test_median_exact(rng, k):
    for shape in SHAPES:
        img = _rand(rng, shape)
        assert maxdiff(ref.median_blur(img, k), cv2.medianBlur(img, k)) == 0


@pytest.mark.parametrize("amount", [0.3, 1.7, 2.45])
def test_unsharp_fractional_u16_exact(rng, amount):
    # round 2: addWeighted pinned as a two-FMA f32 chain — exact on u16 too
    img = rng.integers(0, 65536, (64, 67), dtype=np.uint16)
    blur = cv2.GaussianBlur(img, (5, 5), 0)
    want = cv2.addWeighted(img, 1.0 + amount, blur, -amount, 0)
    assert maxdiff(ref.unsharp_mask(img, amount, 5, 0.0), want) == 0


def test_convert_scale_abs_f32_input_exact(rng):
    # f32-input convertScaleAbs: device reproduces the single-rounded FMA
    from imageenhancement_mp_tpu.ops.pointwise import convert_scale_abs_planes

    img = rng.uniform(-300, 900, (2, 31, 37)).astype(np.float32)
    for alpha, beta in [(1.3, -7.0), (0.017, 200.0), (-2.2, 80.5)]:
        want = cv2.convertScaleAbs(img[0], alpha=alpha, beta=beta)
        got = np.asarray(convert_scale_abs_planes(img, alpha, beta))[0]
        assert maxdiff(got, want) == 0, (alpha, beta)


@pytest.mark.parametrize("kh,kw,sx,sy", [(3, 7, 0.0, 0.0), (5, 5, 1.2, 2.4), (9, 3, 0.0, 1.1), (0, 5, 2.0, 0.0), (11, 1, 0.0, 3.0)])
def test_gaussian_rect_sigma_y_vs_cv2(rng, kh, kw, sx, sy):
    # NOTE cv2's Size is (cols, rows) = (kw, kh)
    for dt, hi in [(np.uint8, 256), (np.uint16, 65536)]:
        img = rng.integers(0, hi, (48, 53), dtype=dt)
        want = cv2.GaussianBlur(img, (kw, kh), sx, sigmaY=sy)
        assert maxdiff(ref.gaussian_blur(img, (kh, kw), sx, sy), want) == 0, (dt, kh, kw)


# ------------------------------------------------- addWeighted / cvtColor


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_add_weighted_general_exact(rng, dt):
    """General cv2.addWeighted(src1, α, src2, β, γ): bit-exact for every
    dtype (two single-rounded f32 FMAs — the pinned model)."""
    for _ in range(30):
        shape = (int(rng.integers(2, 50)), int(rng.integers(2, 50)))
        if dt is np.float32:
            a = (rng.random(shape) * 2000 - 700).astype(np.float32)
            b = (rng.random(shape) * 2000 - 700).astype(np.float32)
        else:
            lo, hi = (0, 256) if dt is np.uint8 else (
                (0, 65536) if dt is np.uint16 else (-32768, 32768))
            a = rng.integers(lo, hi, shape).astype(dt)
            b = rng.integers(lo, hi, shape).astype(dt)
        al = float(rng.uniform(-4, 4))
        be = float(rng.uniform(-4, 4))
        ga = float(rng.uniform(-1000, 1000))
        want = cv2.addWeighted(a, al, b, be, ga)
        got = ref.add_weighted(a, al, b, be, ga)
        assert got.dtype == want.dtype
        assert np.array_equal(got, want)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16])
@pytest.mark.parametrize("c", [3, 4])
@pytest.mark.parametrize("order", ["rgb", "bgr"])
def test_cvt_gray_integer_exact(rng, dt, c, order):
    code = {
        ("rgb", 3): cv2.COLOR_RGB2GRAY, ("rgb", 4): cv2.COLOR_RGBA2GRAY,
        ("bgr", 3): cv2.COLOR_BGR2GRAY, ("bgr", 4): cv2.COLOR_BGRA2GRAY,
    }[(order, c)]
    for shape in [(64, 64, c), (33, 47, c), (128, 131, c)]:
        img = rng.integers(0, 256 if dt is np.uint8 else 65536, shape).astype(dt)
        assert np.array_equal(ref.cvt_gray(img, order), cv2.cvtColor(img, code))


def test_cvt_gray_u8_grid_exact():
    """All (r,g) pairs × several b planes — the sum-preserving 15-bit
    fixed point is exact at every rounding boundary."""
    rr, gg = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    for b in (0, 7, 128, 200, 255):
        im = np.stack([rr, gg, np.full_like(rr, b)], axis=-1).astype(np.uint8)
        want = cv2.cvtColor(im, cv2.COLOR_RGB2GRAY)
        assert np.array_equal(ref.cvt_gray(im, "rgb"), want)


@pytest.mark.parametrize("order", ["rgb", "bgr"])
def test_cvt_gray_f32_vector_body_exact_tail_1ulp(rng, order):
    """f32: bit-exact on cv2's SIMD vector body; cv2's own row tail
    (last ≤8 columns) uses a build-dependent accumulation order, so only
    ≤1 ULP is well-defined there (docs/PARITY.md)."""
    code = cv2.COLOR_RGB2GRAY if order == "rgb" else cv2.COLOR_BGR2GRAY
    for _ in range(10):
        h, w = int(rng.integers(4, 60)), int(rng.integers(16, 120))
        img = (rng.random((h, w, 3)) * 1000 - 300).astype(np.float32)
        want = cv2.cvtColor(img, code)
        got = ref.cvt_gray(img, order)
        assert np.array_equal(got[:, : w - 8], want[:, : w - 8])
        # tail: a different summation order keeps absolute error within a
        # few ULP of the largest CHANNEL magnitude (cancellation can make
        # it large relative to the output)
        diff = np.abs(got.astype(np.float64) - want.astype(np.float64))
        amax = np.abs(img).max(axis=-1).astype(np.float32)
        assert (diff <= 4.0 * np.spacing(amax).astype(np.float64)).all()


def test_unsharp_f32_matches_cv2_given_cv2_blur(rng):
    """The f32 unsharp blend is cv2's exact two-FMA chain: feeding cv2's
    own blur through ref.add_weighted reproduces cv2.addWeighted bitwise."""
    for _ in range(20):
        shape = (int(rng.integers(8, 60)), int(rng.integers(8, 60)))
        img = (rng.random(shape) * 500 - 100).astype(np.float32)
        amt = float(rng.uniform(0.05, 3))
        blur = cv2.GaussianBlur(img, (5, 5), 0)
        want = cv2.addWeighted(img, 1 + amt, blur, -amt, 0)
        got = ref.add_weighted(img, 1 + amt, blur, -amt, 0.0)
        assert np.array_equal(got, want)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_box_blur_vs_cv2(rng, dt):
    """cv2.blur: integer dtypes bit-exact on cv2's SIMD body (any diffs
    are confined to cv2's build-dependent <16-column scalar row tail and
    are ±1 — docs/PARITY.md); f32 bitwise (f64-sum model)."""
    for _ in range(25):
        kh, kw = int(rng.choice([1, 3, 5, 7, 9, 15])), int(rng.choice([1, 3, 5, 7, 9, 15]))
        H = int(rng.integers(max(kh, kw), 70))
        W = int(rng.integers(max(kh, kw), 70))
        if dt is np.float32:
            img = (rng.random((H, W)) * 1000 - 300).astype(np.float32)
        else:
            lo, hi = (0, 256) if dt is np.uint8 else (
                (0, 65536) if dt is np.uint16 else (-32768, 32768))
            img = rng.integers(lo, hi, (H, W)).astype(dt)
        want = cv2.blur(img, (kw, kh))  # cv2 Size = (cols, rows)
        got = ref.box_blur(img, (kh, kw))
        assert got.dtype == want.dtype
        d = got != want
        if dt is np.float32:
            assert not d.any()
        elif d.any():
            cols = np.argwhere(d)[:, 1]
            assert (cols >= W - 16).all()  # cv2's scalar-tail region only
            assert int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max()) <= 1


@pytest.mark.parametrize("d,sc,ss", [(5, 25.0, 5.0), (9, 75.0, 75.0), (7, 30.0, 10.0), (0, 40.0, 3.0)])
def test_bilateral_gray_exact_vs_plain_cv2(rng, d, sc, ss):
    """Bit-exact vs cv2's reference C++ path.  cv2's DEFAULT dispatch uses
    IPP on x86, which differs from cv2's own reference path by ±1 on ~20 %
    of pixels — so the pinned contract is the reference path
    (docs/PARITY.md)."""
    img = _rand(rng, (64, 71))
    opt = cv2.useOptimized()
    try:
        cv2.setUseOptimized(False)
        want = cv2.bilateralFilter(img, d, sc, ss)
    finally:
        cv2.setUseOptimized(opt)
    got = ref.bilateral_filter(img, d, sc, ss)
    if not np.array_equal(got, want):
        # cv2 can LATCH its optimized dispatch in long-running processes,
        # silently ignoring setUseOptimized(False) (seen in full-suite
        # runs): `want` is then the IPP path, which differs from the
        # pinned reference path by ±1 on a bounded fraction of pixels
        assert maxdiff(got, want) <= 1, (d, sc, ss)
        assert (got != want).mean() < 0.35, (d, sc, ss)


def test_bilateral_color_joint_vs_plain_cv2(rng):
    img = rng.integers(0, 256, (40, 43, 3), dtype=np.uint8)
    opt = cv2.useOptimized()
    try:
        cv2.setUseOptimized(False)
        want = cv2.bilateralFilter(img, 7, 40.0, 8.0)
    finally:
        cv2.setUseOptimized(opt)
    got = ref.bilateral_filter(img, 7, 40.0, 8.0)
    # color: cv2's SIMD accumulation order leaves ±1 on ~1e-5 of pixels
    # (or on ~20 % if cv2 latched its IPP dispatch — see the gray test)
    assert maxdiff(got, want) <= 1
    assert (got != want).mean() < 0.35


def test_bilateral_vs_default_cv2_within_1(rng):
    """Against cv2's default (IPP) dispatch the budget is ±1 — cv2's own
    two paths disagree by that much."""
    img = _rand(rng, (48, 53))
    want = cv2.bilateralFilter(img, 7, 50.0, 7.0)
    assert maxdiff(ref.bilateral_filter(img, 7, 50.0, 7.0), want) <= 1


def test_bilateral_rejects_nonpositive_sigma(rng):
    with pytest.raises(ValueError):
        ref.bilateral_filter(_rand(rng, (16, 16)), 5, -1.0, 5.0)
    with pytest.raises(ValueError):
        ref.bilateral_filter(_rand(rng, (16, 16)), 5, 25.0, 0.0)


_CV_THRESH = None


def _cv_thresh_map():
    global _CV_THRESH
    if _CV_THRESH is None:
        _CV_THRESH = {
            "binary": cv2.THRESH_BINARY, "binary_inv": cv2.THRESH_BINARY_INV,
            "trunc": cv2.THRESH_TRUNC, "tozero": cv2.THRESH_TOZERO,
            "tozero_inv": cv2.THRESH_TOZERO_INV,
        }
    return _CV_THRESH


@pytest.mark.parametrize("typ", ["binary", "binary_inv", "trunc", "tozero", "tozero_inv"])
@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_threshold_exact(rng, typ, dt):
    for t, mv in [(100.7, 210.3), (127.5, 255.0), (-3.0, 300.0), (255.0, 128.5), (0.0, 77.0)]:
        if dt is np.float32:
            img = (rng.random((33, 47)) * 600 - 150).astype(np.float32)
            t *= 2.0
        else:
            lo, hi = (0, 256) if dt is np.uint8 else (
                (0, 65536) if dt is np.uint16 else (-32768, 32768))
            img = rng.integers(lo, hi, (33, 47)).astype(dt)
            if dt is not np.uint8:
                t *= 100
                mv *= 90
        want_ret, want = cv2.threshold(img, t, mv, _cv_thresh_map()[typ])
        got_ret, got = ref.threshold(img, t, mv, typ)
        assert got_ret == want_ret, (typ, dt, t)
        assert got.dtype == want.dtype
        assert np.array_equal(got, want), (typ, dt, t, mv)


@pytest.mark.parametrize("method,flag", [("otsu", cv2.THRESH_OTSU), ("triangle", cv2.THRESH_TRIANGLE)])
def test_threshold_auto_exact(rng, method, flag):
    for kind in range(6):
        shape = (int(rng.integers(8, 80)), int(rng.integers(8, 80)))
        if kind == 0:
            img = rng.integers(0, 256, shape).astype(np.uint8)
        elif kind == 1:
            img = rng.integers(0, 40, shape).astype(np.uint8)
        elif kind == 2:
            img = rng.normal(128, 30, shape).clip(0, 255).astype(np.uint8)
        elif kind == 3:
            img = np.where(rng.random(shape) > 0.5,
                           rng.integers(0, 50), rng.integers(200, 256)).astype(np.uint8)
        elif kind == 4:
            img = np.full(shape, 77, np.uint8)
        else:
            img = np.where(rng.random(shape) > 0.9, 255, 0).astype(np.uint8)
        want_ret, want = cv2.threshold(img, 0, 255, cv2.THRESH_BINARY + flag)
        got_ret, got = ref.threshold(img, 0, 255, "binary", method=method)
        assert got_ret == want_ret, (method, kind)
        assert np.array_equal(got, want)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16])
@pytest.mark.parametrize("order", ["rgb", "bgr"])
def test_ycrcb_roundtrip_exact(rng, dt, order):
    fwd = {"rgb": cv2.COLOR_RGB2YCrCb, "bgr": cv2.COLOR_BGR2YCrCb}[order]
    inv = {"rgb": cv2.COLOR_YCrCb2RGB, "bgr": cv2.COLOR_YCrCb2BGR}[order]
    for shape in [(64, 64, 3), (33, 47, 3), (128, 131, 3)]:
        img = rng.integers(0, 256 if dt is np.uint8 else 65536, shape).astype(dt)
        assert np.array_equal(ref.rgb_to_ycrcb(img, order), cv2.cvtColor(img, fwd))
        assert np.array_equal(ref.ycrcb_to_rgb(img, order), cv2.cvtColor(img, inv))


@pytest.mark.parametrize("order", ["rgb", "bgr"])
def test_ycrcb_f32_vector_body_exact(rng, order):
    fwd = {"rgb": cv2.COLOR_RGB2YCrCb, "bgr": cv2.COLOR_BGR2YCrCb}[order]
    inv = {"rgb": cv2.COLOR_YCrCb2RGB, "bgr": cv2.COLOR_YCrCb2BGR}[order]
    img = (rng.random((40, 64, 3)) * 3 - 1).astype(np.float32)  # W % 16 == 0
    assert np.array_equal(ref.rgb_to_ycrcb(img, order), cv2.cvtColor(img, fwd))
    assert np.array_equal(ref.ycrcb_to_rgb(img, order), cv2.cvtColor(img, inv))
    # ragged width: mismatches only in cv2's trailing tail columns
    img = (rng.random((20, 77, 3)) * 3 - 1).astype(np.float32)
    got, want = ref.rgb_to_ycrcb(img, order), cv2.cvtColor(img, fwd)
    bad = np.argwhere((got != want).any(axis=-1))
    assert all(x >= 77 - 16 for _, x in bad)


def test_equalize_luma_recipe_vs_cv2(rng):
    """The classic color-equalization recipe, end-to-end bit-exact."""
    img = rng.integers(0, 256, (60, 71, 3), dtype=np.uint8)
    ycc = cv2.cvtColor(img, cv2.COLOR_RGB2YCrCb)
    ycc[..., 0] = cv2.equalizeHist(ycc[..., 0])
    want = cv2.cvtColor(ycc, cv2.COLOR_YCrCb2RGB)
    got = ref.ycrcb_to_rgb(
        np.concatenate(
            [ref.equalize_hist(ref.rgb_to_ycrcb(img)[..., 0])[..., None],
             ref.rgb_to_ycrcb(img)[..., 1:]], axis=-1))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("method,cvm", [("mean", cv2.ADAPTIVE_THRESH_MEAN_C),
                                        ("gaussian", cv2.ADAPTIVE_THRESH_GAUSSIAN_C)])
@pytest.mark.parametrize("typ,cvt", [("binary", cv2.THRESH_BINARY),
                                     ("binary_inv", cv2.THRESH_BINARY_INV)])
def test_adaptive_threshold_exact(rng, method, cvm, typ, cvt):
    for bs in (3, 5, 11, 21):
        for C in (2.0, -3.7, 0.0, 7.5):
            img = _rand(rng, (int(rng.integers(8, 70)), int(rng.integers(8, 70))))
            want = cv2.adaptiveThreshold(img, 200.6, cvm, cvt, bs, C)
            got = ref.adaptive_threshold(img, 200.6, method, typ, bs, C)
            assert np.array_equal(got, want), (method, typ, bs, C)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_morphology_exact(rng, dt):
    if dt is np.float32:
        img = (rng.random((33, 47)) * 500 - 100).astype(np.float32)
    else:
        lo, hi = (0, 256) if dt is np.uint8 else (
            (0, 65536) if dt is np.uint16 else (-32768, 32768))
        img = rng.integers(lo, hi, (33, 47)).astype(dt)
    for k in (3, (3, 5), (5, 1), (2, 4)):
        ker = np.ones(k if isinstance(k, tuple) else (k, k), np.uint8)
        assert np.array_equal(ref.erode(img, k), cv2.erode(img, ker)), k
        assert np.array_equal(ref.dilate(img, k), cv2.dilate(img, ker)), k
        assert np.array_equal(ref.erode(img, k, 2), cv2.erode(img, ker, iterations=2))
    ker = np.ones((3, 3), np.uint8)
    for op, cvop in (("open", cv2.MORPH_OPEN), ("close", cv2.MORPH_CLOSE),
                     ("gradient", cv2.MORPH_GRADIENT), ("tophat", cv2.MORPH_TOPHAT),
                     ("blackhat", cv2.MORPH_BLACKHAT)):
        assert np.array_equal(ref.morphology(img, op, 3), cv2.morphologyEx(img, cvop, ker)), op
        assert np.array_equal(ref.morphology(img, op, 3, 2),
                              cv2.morphologyEx(img, cvop, ker, iterations=2)), op


def test_deriv_kernels_grid_vs_cv2():
    for k in (1, 3, 5, 7, 9, 13, 27):
        for dx in range(0, 3):
            for dy in range(0, 3):
                if dx + dy == 0:
                    continue
                if k == 1 and (dx > 2 or dy > 2):
                    continue
                if dx >= max(k, 3) or dy >= max(k, 3):
                    continue
                ckx, cky = cv2.getDerivKernels(dx, dy, k)
                kx, ky = ref.deriv_kernels(dx, dy, k)
                assert np.array_equal(kx, ckx.ravel().astype(np.int64)), (k, dx, dy)
                assert np.array_equal(ky, cky.ravel().astype(np.int64)), (k, dx, dy)
    kx, ky = ref.deriv_kernels(1, 0, -1)
    ckx, cky = cv2.getDerivKernels(1, 0, -1)
    assert np.array_equal(kx, ckx.ravel().astype(np.int64))


@pytest.mark.parametrize("dx,dy", [(1, 0), (0, 1), (1, 1), (2, 0)])
@pytest.mark.parametrize("k", [1, 3, 5, 7, -1])
def test_sobel_u8_exact(rng, dx, dy, k):
    if k == -1 and dx + dy != 1:
        pytest.skip("scharr is first-derivative only")
    if k == 1 and max(dx, dy) > 2:
        pytest.skip("")
    img = _rand(rng, (40, 47))
    for de in (0.0, 11.7, -3.3):
        want = (cv2.Scharr(img, cv2.CV_16S, dx, dy, delta=de) if k == -1
                else cv2.Sobel(img, cv2.CV_16S, dx, dy, ksize=k, delta=de))
        got = ref.sobel(img, dx, dy, k, 1.0, de)
        assert got.dtype == want.dtype
        assert np.array_equal(got, want), (k, dx, dy, de)


def test_sobel_16bit_within_halfulp_of_cv2_float(rng):
    """cv2 only offers a FLOAT destination for 16-bit Sobel; our exact
    int32 agrees with its f32 to 0.5 ULP (i.e. cv2's output is the
    rounding of ours)."""
    for dt in (np.uint16, np.int16):
        lo, hi = (0, 65536) if dt is np.uint16 else (-32768, 32768)
        img = rng.integers(lo, hi, (30, 31)).astype(dt)
        got = ref.sobel(img, 1, 1, 5)
        want = cv2.Sobel(img, cv2.CV_32F, 1, 1, ksize=5).astype(np.float64)
        d = np.abs(got.astype(np.float64) - want)
        ulp = np.spacing(np.abs(want).astype(np.float32)).astype(np.float64)
        assert (d <= 0.5 * np.maximum(ulp, 2.0)).all()


def test_sobel_scale_fold_within_1(rng):
    img = _rand(rng, (40, 43))
    want = cv2.Sobel(img, cv2.CV_16S, 1, 0, ksize=3, scale=0.37, delta=11.7)
    got = ref.sobel(img, 1, 0, 3, 0.37, 11.7)
    assert int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max()) <= 1


@pytest.mark.parametrize("order", ["rgb", "bgr"])
def test_hsv_forward_exact(rng, order):
    code = cv2.COLOR_RGB2HSV if order == "rgb" else cv2.COLOR_BGR2HSV
    for shape in [(64, 64, 3), (33, 47, 3), (128, 131, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        want = cv2.cvtColor(img, code)
        got = ref.rgb_to_hsv(img, order)
        if not np.array_equal(got, want):
            # cv2's latched IPP dispatch can flip odd pixels (see bilateral)
            assert maxdiff(got, want) <= 1
            assert (got != want).mean() < 1e-3


@pytest.mark.parametrize("order", ["rgb", "bgr"])
def test_hsv_inverse_body_model(rng, order):
    """The SIMD-body (truncating) model: within ±1 of cv2 everywhere,
    exact where cv2's own 32-px body ran."""
    code = cv2.COLOR_HSV2RGB if order == "rgb" else cv2.COLOR_HSV2BGR
    for _ in range(6):
        H, W = int(rng.integers(8, 60)), int(rng.integers(34, 120))
        hsv = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        hsv[..., 0] = rng.integers(0, 180, (H, W))
        want = cv2.cvtColor(hsv, code)
        got = ref.hsv_to_rgb(hsv, order)
        assert maxdiff(got, want) <= 1


def test_hsv_roundtrip_matches_cv2_roundtrip(rng):
    """Our HSV roundtrip drifts exactly like cv2's own roundtrip (the
    quantization loss is the format's, not ours)."""
    img = rng.integers(0, 256, (40, 43, 3)).astype(np.uint8)
    ours = ref.hsv_to_rgb(ref.rgb_to_hsv(img))
    cv2s = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_RGB2HSV), cv2.COLOR_HSV2RGB)
    assert maxdiff(ours, cv2s) <= 1


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32])
def test_pyramids_vs_cv2(rng, dt):
    for _ in range(8):
        H, W = int(rng.integers(8, 80)), int(rng.integers(8, 80))
        if dt is np.float32:
            img = (rng.random((H, W)) * 500 - 100).astype(np.float32)
        else:
            lo, hi = (0, 256) if dt is np.uint8 else (
                (0, 65536) if dt is np.uint16 else (-32768, 32768))
            img = rng.integers(lo, hi, (H, W)).astype(dt)
        wd, wu = cv2.pyrDown(img), cv2.pyrUp(img)
        gd, gu = ref.pyr_down(img), ref.pyr_up(img)
        assert gd.shape == wd.shape and gu.shape == wu.shape
        if dt is np.float32:
            assert np.abs(gd.astype(np.float64) - wd).max() < 1e-3
            assert np.abs(gu.astype(np.float64) - wu).max() < 1e-3
        else:
            assert np.array_equal(gd, wd) and np.array_equal(gu, wu)


def test_filter2d_vs_cv2(rng):
    """Custom-kernel correlation: integer kernels exact on every dtype;
    float kernels exact on u8, ±1 on 16-bit (cv2's f32 accumulation)."""
    for trial in range(32):
        dt = [np.uint8, np.uint16, np.int16][trial % 3]
        kh, kw = int(rng.integers(1, 8)), int(rng.integers(1, 8))
        integral = trial % 2 == 0
        k = (rng.integers(-3, 4, (kh, kw)).astype(np.float32) if integral
             else (rng.random((kh, kw)) * 2 - 0.6).astype(np.float32))
        delta = float(rng.uniform(-30, 30))
        lo, hi = (0, 255) if dt is np.uint8 else (
            (0, 65535) if dt is np.uint16 else (-32768, 32767))
        img = rng.integers(lo, hi + 1, (30, 33)).astype(dt)
        want = cv2.filter2D(img, -1, k, delta=delta)
        got = ref.filter2d(img, k, delta)
        d = maxdiff(got, want)
        lim = 0 if (dt is np.uint8 or integral) else 1
        assert d <= lim, (trial, dt, integral, d)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_laplacian_ksize_exact(rng, k):
    """Laplacian ksize≥3 = Sobel-based d²x+d²y with RAW integer sums and
    a single final saturation (per-term saturation diverges at k=7)."""
    img = _rand(rng, (40, 43))
    for de in (0.0, 11.7):
        want = cv2.Laplacian(img, cv2.CV_16S, ksize=k, delta=de)
        got = ref.laplacian(img, k, de)
        assert got.dtype == want.dtype
        assert np.array_equal(got, want), (k, de)
    img16 = rng.integers(0, 65536, (30, 31), dtype=np.uint16)
    want = cv2.Laplacian(img16, cv2.CV_32F, ksize=k).astype(np.float64)
    got = ref.laplacian(img16, k).astype(np.float64)
    ulp = np.spacing(np.abs(want).astype(np.float32)).astype(np.float64)
    assert (np.abs(got - want) <= np.maximum(ulp, 2.0)).all()
