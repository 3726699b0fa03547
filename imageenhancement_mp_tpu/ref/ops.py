"""Pure-NumPy parity oracle: bit-exact reimplementation of the reference semantics.

The reference (``hanxuel/ImageEnhancement_MP``) is a per-image Python/OpenCV
image-enhancement project (BASELINE.json:5).  The reference mount is empty
(SURVEY.md §0), so the behavioral contract was pinned empirically against the
reference's backend, OpenCV 5.0.0, and is recorded in SURVEY.md §8.  Every
function here reproduces the corresponding ``cv2`` call on uint8 inputs either
bit-exactly or within the ±1-LSB acceptance budget (BASELINE.json:2,5):

==================  ==========================================  ============
oracle function     cv2 equivalent                              parity
==================  ==========================================  ============
apply_lut           cv2.LUT                                     exact
gamma / log LUTs    standard power-law / log transforms         exact (spec)
contrast_stretch    cv2.normalize(NORM_MINMAX, 0, 255)          exact
equalize_hist       cv2.equalizeHist                            exact
clahe               cv2.createCLAHE(clip, grid).apply           exact (u8/u16)
gaussian_blur       cv2.GaussianBlur(k, σ) u8/u16, any σ        exact
laplacian           cv2.Laplacian(ksize=1, CV_16S)              exact
laplacian_sharpen   src − Laplacian, saturating                 exact
unsharp_mask        cv2.addWeighted(src,1+a,blur,−a,0)          exact
median_blur         cv2.medianBlur (border replicate)           exact
warp_affine/remap   cv2.warpAffine / cv2.remap, all dtypes      exact
==================  ==========================================  ============

(The one remaining ±1 budget in the integer API is GaussianBlur on
int16 — cv2's f32 conv vs the oracle's double-float model, docs/
PARITY.md; every other row above is bit-exact per the deterministic
fuzz tiers in tests/.)

All formulas below were verified by direct probes against OpenCV 5.0.0 in this
environment (see tests/test_ref_vs_cv2.py, which re-verifies them in CI when
cv2 is importable).  Key pinned facts (SURVEY.md §8 + probes this session):

* ``cvRound`` is round-half-to-even; ``np.round`` matches.
* uint8 GaussianBlur is *integer fixed point*: taps = getGaussianKernel·256
  (integers for σ=0: [1,2,1]·64, [1,4,6,4,1]·16, [2,7,14,18,14,7,2]·8),
  int accumulation, output = (acc + 2^15) >> 16, saturating.  Bit-exact.
* CLAHE pads with BORDER_REFLECT_101 to a grid multiple, but when *any* dim is
  non-divisible, *every* dim is padded by ``tiles - size % tiles`` (a divisible
  dim gains a full extra ``tiles`` pixels).  Interpolation coordinates are
  ``y / tile_h - 0.5`` (no half-pixel offset) with blend weights taken before
  index clamping.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "apply_lut",
    "convert_scale_abs",
    "calc_hist",
    "gamma_lut",
    "log_lut",
    "gamma_transform",
    "log_transform",
    "contrast_stretch",
    "equalize_hist",
    "clahe",
    "gaussian_kernel_fixed",
    "gaussian_kernel",
    "gaussian_blur",
    "laplacian",
    "laplacian_sharpen",
    "unsharp_mask",
    "box_blur",
    "bilateral_filter",
    "median_blur",
    "threshold",
    "adaptive_threshold",
    "otsu_threshold",
    "triangle_threshold",
    "add_weighted",
    "cvt_gray",
    "rgb_to_ycrcb",
    "ycrcb_to_rgb",
    "erode",
    "dilate",
    "morphology",
    "deriv_kernels",
    "sobel",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "pyr_down",
    "pyr_up",
    "filter2d",
    "resize",
    "resize_cubic",
    "resize_cubic_tables",
    "resize_lin_tables",
    "cubic_weights",
    "flip",
    "transpose",
    "rotate",
    "warp_affine",
    "warp_affine_coords_int",
    "warp_affine_nn_coords_int",
    "warp_tab_int",
    "invert_affine",
    "get_rotation_matrix_2d",
    "canny",
    "remap",
    "match_template",
    "add",
    "subtract",
    "absdiff",
    "multiply",
    "divide",
    "bitwise_and",
    "bitwise_or",
    "bitwise_xor",
    "bitwise_not",
    "minimum",
    "maximum",
    "compare",
    "integral",
    "mean_std_dev",
    "compare_hist",
    "apply_color_map",
    "connected_components",
    "init_undistort_rectify_map",
    "undistort",
    "fast_nl_means_denoising",
    "sep_filter2d",
    "calc_back_project",
    "box_filter",
    "get_structuring_element",
    "gabor_kernel",
    "corner_harris",
    "psnr",
    "rgb_to_xyz",
    "xyz_to_rgb",
    "rgb_to_lab",
    "lab_to_rgb",
    "norm",
    "min_max_loc",
]


def _check_u8(img: np.ndarray) -> None:
    if img.dtype != np.uint8:
        raise TypeError(f"expected uint8 image, got {img.dtype}")


def _img_kind(img: np.ndarray, allow_i16: bool = False) -> str:
    """'u8' | 'u16' | 'i16' | 'f32'; int16 (CV_16S) only where cv2 has a
    16S path (filters, addWeighted, normalize, convertScaleAbs)."""
    if img.dtype == np.uint8:
        return "u8"
    if img.dtype == np.uint16:
        return "u16"
    if img.dtype == np.float32:
        return "f32"
    if img.dtype == np.int16 and allow_i16:
        return "i16"
    raise TypeError(
        f"expected uint8/uint16{'/int16' if allow_i16 else ''}/float32 image, "
        f"got {img.dtype}"
    )


def _int_maxval(kind: str) -> int:
    return 255 if kind == "u8" else (32767 if kind == "i16" else 65535)


def _int_minval(kind: str) -> int:
    return -32768 if kind == "i16" else 0


# ---------------------------------------------------------------------------
# Point operations (LUT family)
# ---------------------------------------------------------------------------

def apply_lut(img: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """``cv2.LUT`` ≡ fancy-index gather (SURVEY.md §8.6; exact)."""
    _check_u8(img)
    return lut.astype(np.uint8)[img]


def gamma_lut(gamma: float) -> np.ndarray:
    """256-entry power-law LUT: ``s = 255·(r/255)^γ`` (SURVEY.md §2 #1)."""
    r = np.arange(256, dtype=np.float64) / 255.0
    return np.clip(np.round(255.0 * np.power(r, gamma)), 0, 255).astype(np.uint8)


def gamma_lut16(gamma: float) -> np.ndarray:
    """65536-entry power-law LUT for uint16 (single source for oracle+device)."""
    r = np.arange(65536, dtype=np.float64) / 65535.0
    return np.clip(np.round(65535.0 * np.power(r, gamma)), 0, 65535).astype(np.uint16)


def log_lut() -> np.ndarray:
    """256-entry log LUT: ``s = c·log(1+r)``, ``c = 255/log(256)`` (SURVEY.md §2 #2)."""
    c = 255.0 / np.log(256.0)
    r = np.arange(256, dtype=np.float64)
    return np.clip(np.round(c * np.log1p(r)), 0, 255).astype(np.uint8)


def log_lut16() -> np.ndarray:
    """65536-entry log LUT for uint16."""
    c = 65535.0 / np.log(65536.0)
    return np.clip(
        np.round(c * np.log1p(np.arange(65536, dtype=np.float64))), 0, 65535
    ).astype(np.uint16)


def convert_scale_abs_lut(alpha: float, beta: float, n: int, offset: int = 0) -> np.ndarray:
    """convertScaleAbs LUT with cv2's single-rounded f32-FMA semantics.
    ``offset`` shifts the value domain (−32768 for int16 inputs; the LUT is
    then indexed by ``v − offset``)."""
    i = np.arange(n, dtype=np.float64) + offset
    fma = np.float32(i * float(np.float32(alpha)) + float(np.float32(beta)))
    return np.clip(np.abs(np.round(fma.astype(np.float64))), 0, 255).astype(np.uint8)


def gamma_transform(img: np.ndarray, gamma: float) -> np.ndarray:
    """uint8/uint16: LUT path (exact on the dtype's full range).
    float32: direct ``255·(r/255)^γ`` on non-negative inputs
    (extensions — cv2 has no gamma op)."""
    kind = _img_kind(img)
    if kind == "f32":
        r = np.maximum(img.astype(np.float64), 0.0) / 255.0
        return (255.0 * np.power(r, gamma)).astype(np.float32)
    if kind == "u16":
        return gamma_lut16(gamma)[img]
    return apply_lut(img, gamma_lut(gamma))


def log_transform(img: np.ndarray) -> np.ndarray:
    """uint8/uint16: LUT path (exact).  float32: direct ``c·log(1+r)``."""
    kind = _img_kind(img)
    if kind == "f32":
        c = 255.0 / np.log(256.0)
        return (c * np.log1p(np.maximum(img.astype(np.float64), 0.0))).astype(np.float32)
    if kind == "u16":
        return log_lut16()[img]
    return apply_lut(img, log_lut())


def contrast_stretch(
    img: np.ndarray, out_range: tuple[float, float] = (0.0, 255.0)
) -> np.ndarray:
    """``cv2.normalize(img, None, alpha, beta, NORM_MINMAX)``
    (SURVEY.md §8.5; probe: round((x−min)·(β−α)/(max−min) + α) half-even,
    range sorted so src-min maps to min(α,β); constant image → min(α,β)).

    uint8/uint16: bit-exact vs cv2 for arbitrary float ranges (0/6000
    fuzz mismatches — the FMA emulation below is the whole story).
    float32: cv2 float path, no rounding.
    """
    # cv2 sorts the output range: src-min maps to min(α,β) (verified probe)
    a, b = sorted((float(out_range[0]), float(out_range[1])))
    kind = _img_kind(img, allow_i16=True)
    if kind == "f32":
        lo = float(img.min())
        hi = float(img.max())
        if hi == lo:
            return np.full_like(img, np.float32(a))
        return ((img - lo) * ((b - a) / (hi - lo)) + a).astype(np.float32)
    # cv2's exact arithmetic (normalize -> convertTo): double scale/shift
    # (scale = (β−α)·(1/(max−min)) with the pre-rounded reciprocal), then
    # the per-element SIMD op is a SINGLE-ROUNDED f32 FMA of f32-converted
    # scale/shift — same convention as convertScaleAbs.  Emulated via the
    # exact-f64-product + one-f32-rounding trick (probe: 0/3000 mismatches;
    # plain f64 or f32 mul+add both mis-round ties on ~3-5% of tiny images;
    # int16 verified 0/200 with the value domain shifted by −32768).
    lo = float(img.min())
    hi = float(img.max())
    maxv = _int_maxval(kind)
    minv = _int_minval(kind)
    if hi == lo:
        return np.full_like(img, img.dtype.type(np.clip(round(a), minv, maxv)))
    scale = (b - a) * (np.float64(1.0) / (hi - lo))
    shift = a - lo * scale
    i = np.arange(minv, maxv + 1, dtype=np.float64)
    fma = np.float32(i * float(np.float32(scale)) + float(np.float32(shift)))
    lut = np.clip(np.round(fma.astype(np.float64)), minv, maxv).astype(img.dtype)
    return lut[img.astype(np.int32) - minv]


def convert_scale_abs(img: np.ndarray, alpha: float = 1.0, beta: float = 0.0) -> np.ndarray:
    """``cv2.convertScaleAbs`` — exact: ``saturate_u8(round(|α·x + β|))``
    with round-half-to-even (SURVEY.md §8.4).

    cv2 ALWAYS returns 8-bit regardless of input depth (probe: u16 input
    → u8 saturated at 255; float input → u8); so does this.  The integer
    paths mirror cv2's SIMD exactly: a single-rounded f32 FMA
    ``f32(x·f32(α) + f32(β))`` then cvRound (probe: bit-exact for
    u8/u16/i16 across sweeping α/β; plain f64 or f32 arithmetic both
    mis-round ties).
    """
    kind = _img_kind(img, allow_i16=True)
    if kind == "f32":
        fma = np.float32(img.astype(np.float64) * float(np.float32(alpha))
                         + float(np.float32(beta)))
        out = np.abs(np.round(fma.astype(np.float64)))
        return np.clip(out, 0, 255).astype(np.uint8)
    if kind == "i16":
        lut = convert_scale_abs_lut(alpha, beta, 65536, offset=-32768)
        return lut[img.astype(np.int32) + 32768]
    return convert_scale_abs_lut(alpha, beta, 256 if kind == "u8" else 65536)[img]


def calc_hist(img: np.ndarray) -> np.ndarray:
    """``cv2.calcHist`` ≡ bincount — exact (256 bins u8, 65536 bins u16)."""
    if img.dtype == np.uint8:
        return np.bincount(img.ravel(), minlength=256).astype(np.int64)
    if img.dtype == np.uint16:
        return np.bincount(img.ravel(), minlength=65536).astype(np.int64)
    raise TypeError(f"expected uint8 or uint16 image, got {img.dtype}")


# ---------------------------------------------------------------------------
# Histogram equalization
# ---------------------------------------------------------------------------

def _equalize_lut(hist: np.ndarray, total: int) -> np.ndarray:
    """LUT of ``cv2.equalizeHist`` from a 256-bin histogram (SURVEY.md §8.1)."""
    nz = np.nonzero(hist)[0]
    if nz.size == 0:
        return np.zeros(256, np.uint8)
    i0 = nz[0]
    if hist[i0] == total:
        # constant image: cv2 short-circuits with dst.setTo(i0) — identity
        return np.arange(256, dtype=np.uint8)
    cdf = np.cumsum(hist)
    # cv2 computes lut[i] = saturate_cast<uchar>(int_sum * float_scale) with a
    # FLOAT32 scale — mirror that exactly (f64 here differs on ~1% of images)
    scale = np.float32(255.0) / np.float32(total - hist[i0])
    return np.clip(
        np.round((cdf - cdf[i0]).astype(np.float32) * scale), 0, 255
    ).astype(np.uint8)


def equalize_hist(img: np.ndarray) -> np.ndarray:
    """``cv2.equalizeHist`` — exact (SURVEY.md §8.1; probe maxdiff 0)."""
    _check_u8(img)
    hist = np.bincount(img.ravel(), minlength=256)
    return _equalize_lut(hist, img.size)[img]


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------

def clahe_tile_lut(
    tile_hist: np.ndarray, tile_area: int, clip_limit: float, hist_size: int = 256
) -> np.ndarray:
    """Per-tile CLAHE LUT: clip, redistribute, CDF, scale (SURVEY.md §8.3).

    ``hist_size`` is 256 for uint8 and 65536 for uint16 (cv2 convention).
    """
    h = tile_hist.astype(np.int64).copy()
    maxv = hist_size - 1
    if clip_limit > 0:
        clip_abs = max(int(clip_limit * tile_area / hist_size), 1)
        excess = int(np.sum(np.maximum(h - clip_abs, 0)))
        h = np.minimum(h, clip_abs)
        h += excess // hist_size
        r = excess % hist_size
        if r:
            step = max(hist_size // r, 1)
            idx = np.arange(0, hist_size, step)[:r]
            h[idx] += 1
    cdf = np.cumsum(h)
    # same f32-scale convention as equalizeHist (cv2's lutScale is float)
    scale = np.float32(float(maxv)) / np.float32(tile_area)
    out = np.clip(np.round(cdf.astype(np.float32) * scale), 0, maxv)
    return out.astype(np.uint8 if hist_size == 256 else np.uint16)


def clahe(
    img: np.ndarray, clip_limit: float = 40.0, tile_grid: tuple[int, int] = (8, 8)
) -> np.ndarray:
    """``cv2.createCLAHE(clip_limit, (gw, gh)).apply`` — ±1 LSB (SURVEY.md §8.3).

    ``tile_grid`` is (rows, cols) = (tilesY, tilesX).  cv2's default
    ``clip_limit`` is 40.0 with an 8×8 grid.  uint8 and uint16 (cv2 uses a
    65536-bin histogram for 16-bit; probe: bit-exact).
    """
    kind = _img_kind(img)
    if kind == "f32":
        raise TypeError("CLAHE supports uint8/uint16 (cv2 parity)")
    hist_size = 256 if kind == "u8" else 65536
    maxv = hist_size - 1
    H, W = img.shape
    gh, gw = tile_grid
    if H % gh == 0 and W % gw == 0:
        th, tw = H // gh, W // gw
        padded = img
    else:
        # cv2 quirk (verified): when any dim is non-divisible, BOTH dims are
        # padded by (tiles - size % tiles) with BORDER_REFLECT_101 — a
        # divisible dim gains a full extra `tiles` pixels.
        pad_h = gh - (H % gh)
        pad_w = gw - (W % gw)
        padded = np.pad(img, ((0, pad_h), (0, pad_w)), mode="reflect")
        th, tw = padded.shape[0] // gh, padded.shape[1] // gw
    area = th * tw

    luts = np.empty((gh, gw, hist_size), img.dtype)
    for ty in range(gh):
        for tx in range(gw):
            tile = padded[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            hist = np.bincount(tile.ravel(), minlength=hist_size)
            luts[ty, tx] = clahe_tile_lut(hist, area, clip_limit, hist_size)

    # Bilinear blend of the 4 neighboring tile LUTs.  Pinned convention
    # (probe): coords = y·(1/tile) − 0.5 evaluated in FLOAT32 exactly as cv2
    # does (bit-exact), NO half-pixel offset, fractional weights taken BEFORE
    # clamping the tile indices; at borders the two clamped indices coincide
    # so the unclamped weight is harmless.  Blend in f32 with cv2's
    # association: ((1−fx)·l00 + fx·l01)·(1−fy) + (...)·fy, one final round.
    tyf = np.arange(H, dtype=np.float32) * (np.float32(1.0) / np.float32(th)) - np.float32(0.5)
    txf = np.arange(W, dtype=np.float32) * (np.float32(1.0) / np.float32(tw)) - np.float32(0.5)
    ty0f = np.floor(tyf).astype(int)
    tx0f = np.floor(txf).astype(int)
    fy = (tyf - ty0f).astype(np.float32)
    fx = (txf - tx0f).astype(np.float32)
    ty0 = np.clip(ty0f, 0, gh - 1)
    ty1 = np.clip(ty0f + 1, 0, gh - 1)
    tx0 = np.clip(tx0f, 0, gw - 1)
    tx1 = np.clip(tx0f + 1, 0, gw - 1)

    l00 = luts[ty0[:, None], tx0[None, :], img].astype(np.float32)
    l01 = luts[ty0[:, None], tx1[None, :], img].astype(np.float32)
    l10 = luts[ty1[:, None], tx0[None, :], img].astype(np.float32)
    l11 = luts[ty1[:, None], tx1[None, :], img].astype(np.float32)
    one = np.float32(1.0)
    out = (one - fy)[:, None] * ((one - fx)[None, :] * l00 + fx[None, :] * l01) + fy[
        :, None
    ].astype(np.float32) * ((one - fx)[None, :] * l10 + fx[None, :] * l11)
    return np.clip(np.round(out), 0, maxv).astype(img.dtype)


# ---------------------------------------------------------------------------
# Spatial filters
# ---------------------------------------------------------------------------

_BINOMIAL_FX = {
    1: np.array([256], np.int64),  # k=1 is the identity (probe: any sigma)
    3: np.array([64, 128, 64], np.int64),
    5: np.array([16, 64, 96, 64, 16], np.int64),
    7: np.array([8, 28, 56, 72, 56, 28, 8], np.int64),
    # k=9 is ALSO a dyadic /256 table in cv2 (probe: getGaussianKernel(9,0)
    # returns exactly these /256) — k>=11 switches to the sigma formula
    9: np.array([4, 13, 30, 51, 60, 51, 30, 13, 4], np.int64),
}


def _cdf_fixed_taps(ksize: int, sigma: float, q: int) -> np.ndarray:
    """cv2's bit-exact fixed-point Gaussian tap quantization, reverse-
    engineered (round 2): quantize the kernel's CUMULATIVE sums at scale
    ``q`` and difference — ``tap_i = round(q·cdf_i) − round(q·cdf_{i−1})``
    (guarantees Σtaps = q exactly).  Pinned by per-tap impulse staircase
    probes (80/80 configs) and 1500/1500 full-image fuzz vs cv2 5.0.0
    across k ≤ 31, σ ∈ (0, 8], u8 (q=256) and u16 (q=65536).
    """
    c = (ksize - 1) * 0.5
    i = np.arange(ksize, dtype=np.float64) - c
    v = np.exp(-(i * i) / (2.0 * sigma * sigma))
    v = v / v.sum()
    cdf = np.round(np.cumsum(v) * q)
    return np.diff(np.concatenate([[0.0], cdf])).astype(np.int64)


def gaussian_kernel_fixed(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2's uint8-path Gaussian kernel ·256 (bit-exact, any σ).

    σ≤0, k ∈ {1,3,5,7}: hardcoded binomial taps (SURVEY.md §8.2).
    Otherwise (σ≤0 uses auto-σ): cumulative-quantized taps at Q8
    (``_cdf_fixed_taps``) — cv2's bit-exact fixed-point scheme.
    """
    if ksize % 2 == 0 or ksize < 1:
        raise ValueError(f"ksize must be odd >= 1, got {ksize}")
    if sigma <= 0:
        if ksize in _BINOMIAL_FX:
            return _BINOMIAL_FX[ksize]
        sigma = _auto_sigma(ksize)
    return _cdf_fixed_taps(ksize, sigma, 256)


def gaussian_taps_u16(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """cv2's uint16-path Gaussian taps ·65536 (bit-exact, any σ).

    σ≤0: k ≤ 9 the dyadic /256 tables ·256 (cv2 quirk — its 16U σ=0 k=9
    filter reuses the 8-bit kernel, pinned by probe); k ≥ 11 cumulative-
    quantized at Q16.  σ>0: cumulative-quantized at Q16.
    Apply with int accumulation and a single final ``(h + 2^31) >> 32``.
    """
    if ksize % 2 == 0 or ksize < 1:
        raise ValueError(f"ksize must be odd >= 1, got {ksize}")
    if sigma <= 0:
        if ksize in _BINOMIAL_FX:
            return _BINOMIAL_FX[ksize] * 256
        sigma = _auto_sigma(ksize)
    return _cdf_fixed_taps(ksize, sigma, 65536)


def _auto_sigma(ksize: int) -> float:
    """cv2's σ=0 fallback formula (used for k > 7)."""
    return 0.3 * ((ksize - 1) * 0.5 - 1.0) + 0.8


def gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """``cv2.getGaussianKernel(ksize, sigma)`` as float64 taps."""
    if sigma <= 0:
        if ksize in _BINOMIAL_FX:
            return _BINOMIAL_FX[ksize] / 256.0
        sigma = _auto_sigma(ksize)
    i = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    g = np.exp(-(i * i) / (2.0 * sigma * sigma))
    return g / g.sum()


def _reflect_pad(img: np.ndarray, pad: int) -> np.ndarray:
    """BORDER_REFLECT_101 ≡ numpy 'reflect' (edge pixel not duplicated)."""
    return np.pad(img, pad, mode="reflect")


def gaussian_axes(ksize, sigma: float, sigma_y: float, depth_u8: bool):
    """Resolve cv2's GaussianBlur parameter conventions to per-axis
    ``(kh, kw, sy, sx)``:

    * ``ksize``: int (square) or ``(kh, kw)`` rows-cols; a 0 dimension is
      derived from its sigma like cv2 — ``round(σ·F·2 + 1) | 1`` with
      F = 3 for 8-bit, 4 for deeper (pinned probe);
    * ``sigma_y <= 0`` follows ``sigma`` (cv2's sigmaY=0 convention);
      a ≤0 sigma with a positive ksize means auto-σ from that ksize
      (handled downstream by the tap builders).
    """
    kh, kw = (ksize, ksize) if isinstance(ksize, int) else (int(ksize[0]), int(ksize[1]))
    sx = float(sigma)
    sy = float(sigma_y) if sigma_y > 0 else sx
    factor = 3 if depth_u8 else 4
    if kw <= 0:
        if sx <= 0:
            raise ValueError("ksize width 0 requires sigma > 0 (cv2 semantics)")
        kw = int(round(sx * factor * 2 + 1)) | 1
    if kh <= 0:
        if sy <= 0:
            raise ValueError("ksize height 0 requires sigma(_y) > 0 (cv2 semantics)")
        kh = int(round(sy * factor * 2 + 1)) | 1
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError(f"ksize must be odd, got ({kh}, {kw})")
    return kh, kw, sy, sx


def gaussian_blur(
    img: np.ndarray, ksize=5, sigma: float = 0.0, sigma_y: float = 0.0
) -> np.ndarray:
    """``cv2.GaussianBlur(img, (kw,kh), sigmaX, sigmaY)`` on u8/u16/f32.

    ``ksize`` here is int or (rows, cols) — NOTE cv2's Size argument is
    (cols, rows).  ``sigma_y`` ≤ 0 follows ``sigma`` (cv2 convention).

    uint8 (ANY σ): bit-exact integer fixed point — Q8 taps per axis from
    ``gaussian_kernel_fixed``, int separable accumulation, single final
    ``(acc + 2^15) >> 16`` (round 2: 1500/1500 + 200/200 rect fuzz vs cv2).
    uint16 (ANY σ): same with the Q16 taps from ``gaussian_taps_u16`` and
    ``(acc + 2^31) >> 32``.
    int16 (CV_16S): cv2 takes its FLOAT filter path here (per-tap impulse
    staircases show float-kernel × half-even behavior, and no fixed-point
    Q reproduces them); the f32 separable conv below lands within ±1 LSB
    of cv2 (worst over 200 fuzz configs) — cv2's exact SIMD accumulation
    order is not reproducible portably, so i16 carries a documented ±1
    budget (docs/PARITY.md).
    float32: plain separable float conv (f64 accumulation), no round/clip.
    """
    kind = _img_kind(img, allow_i16=True)
    kh, kw, sy, sx = gaussian_axes(ksize, sigma, sigma_y, kind == "u8")
    if kh == 1 and kw == 1:
        return img.copy()  # cv2: k=1 is the identity for any sigma (probe)
    ph, pw = kh // 2, kw // 2
    H, W = img.shape
    p = np.pad(img, ((ph, ph), (pw, pw)), mode="reflect")
    if kind == "f32":
        gv = gaussian_kernel(kh, sy)
        gh_ = gaussian_kernel(kw, sx)
        acc = p.astype(np.float64)
        v = sum(gv[j] * acc[j : j + H, :] for j in range(kh))
        h = sum(gh_[j] * v[:, j : j + W] for j in range(kw))
        return h.astype(np.float32)
    if kind == "i16":
        gv = gaussian_kernel(kh, sy).astype(np.float32)
        gh_ = gaussian_kernel(kw, sx).astype(np.float32)
        acc = p.astype(np.float32)
        v = sum(gv[j] * acc[j : j + H, :] for j in range(kh))
        h = sum(gh_[j] * v[:, j : j + W] for j in range(kw))
        return np.clip(
            np.round(h.astype(np.float64)), -32768, 32767
        ).astype(np.int16)
    if kind == "u8":
        tv = gaussian_kernel_fixed(kh, sy)
        tw = gaussian_kernel_fixed(kw, sx)
        shift, maxv = 16, 255
    else:
        tv = gaussian_taps_u16(kh, sy)
        tw = gaussian_taps_u16(kw, sx)
        shift, maxv = 32, 65535
    acc = p.astype(np.int64)
    v = sum(tv[j] * acc[j : j + H, :] for j in range(kh))
    h = sum(tw[j] * v[:, j : j + W] for j in range(kw))
    return np.clip((h + (1 << (shift - 1))) >> shift, 0, maxv).astype(img.dtype)


def laplacian(img: np.ndarray, ksize: int = 1, delta: float = 0.0) -> np.ndarray:
    """``cv2.Laplacian`` — exact.  ``ksize=1``: the 4-neighbor stencil
    ``[[0,1,0],[1,−4,1],[0,1,0]]``; ``ksize≥3``: the Sobel-based
    ``d²/dx² + d²/dy²`` with RAW integer sums and ONE final saturation
    (pinned: per-term saturation diverges at k=7).  REFLECT_101 border.
    uint8 → int16 (CV_16S); uint16/int16 → int32; float32 → float32.
    Fractional deltas: cv2 computes the k≥3 path in f32, so totals
    within f32 noise of a .5 boundary flip ±1 vs these correctly-rounded
    integers (docs/PARITY.md); integral deltas are bitwise."""
    kind = _img_kind(img, allow_i16=True)
    if ksize != 1:
        kx2, ky2 = deriv_kernels(2, 0, ksize)
        H, W = img.shape

        def raw(kx, ky):
            ph, pw = len(ky) // 2, len(kx) // 2
            pd = np.pad(
                img.astype(np.float64 if kind == "f32" else np.int64),
                ((ph, ph), (pw, pw)), mode="reflect",
            )
            acc_dt = np.float64 if kind == "f32" else np.int64
            v = np.zeros((H, pd.shape[1]), acc_dt)
            for i, t in enumerate(ky):
                v += (float(t) if kind == "f32" else int(t)) * pd[i : i + H, :]
            o = np.zeros((H, W), acc_dt)
            for i, t in enumerate(kx):
                o += (float(t) if kind == "f32" else int(t)) * v[:, i : i + W]
            return o

        acc = raw(kx2, ky2) + raw(ky2, kx2)  # d²x + d²y (kernels swap axes)
        if kind == "f32":
            return (acc + float(delta)).astype(np.float32)
        acc = acc + int(np.round(float(delta)))
        if kind == "u8":
            return np.clip(acc, -32768, 32767).astype(np.int16)
        return np.clip(acc, -(2**31), 2**31 - 1).astype(np.int32)
    if delta:
        raise ValueError("delta is only supported for ksize >= 3 (cv2 parity scope)")
    if kind == "f32":
        p = _reflect_pad(img.astype(np.float64), 1)
        lap = (
            p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * p[1:-1, 1:-1]
        )
        return lap.astype(np.float32)
    if kind in ("u16", "i16"):
        p = _reflect_pad(img.astype(np.int64), 1)
        lap = (
            p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * p[1:-1, 1:-1]
        )
        return lap.astype(np.int32)
    p = _reflect_pad(img.astype(np.int32), 1)
    lap = (
        p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * p[1:-1, 1:-1]
    )
    return lap.astype(np.int16)


def laplacian_sharpen(img: np.ndarray) -> np.ndarray:
    """Sharpen = src − Laplacian(src); saturating for integer dtypes
    (SURVEY.md §2 #7)."""
    kind = _img_kind(img, allow_i16=True)
    if kind == "f32":
        return (img.astype(np.float64) - laplacian(img)).astype(np.float32)
    lap = laplacian(img).astype(np.int64)
    return np.clip(
        img.astype(np.int64) - lap, _int_minval(kind), _int_maxval(kind)
    ).astype(img.dtype)


def unsharp_mask(
    img: np.ndarray, amount: float = 1.0, ksize: int = 5, sigma: float = 0.0
) -> np.ndarray:
    """``cv2.addWeighted(src, 1+a, GaussianBlur(src), −a, 0)`` — exact.

    cv2's integer addWeighted is a chain of TWO single-rounded f32 FMAs
    (round-2 probe — model fitting against u16 where the roundings are
    visible: 0/600 mismatches, vs 40-56 for f64/three-rounding models):

        t   = f32(blur·f32(−a) + f32(0))
        out = cvRound(f32(src·f32(1+a) + t)), saturating

    (cvRound = half-to-even; probe: 0.5·[1,3,5] → [0,2,2].)  The float32
    path neither rounds nor saturates.  int16: the addWeighted chain is the
    same two-FMA model (0/200 fuzz vs cv2); the blur inherits the i16
    Gaussian's ±1 float-path budget.
    """
    _img_kind(img, allow_i16=True)
    blur = gaussian_blur(img, ksize, sigma)
    return add_weighted(img, 1.0 + amount, blur, -amount, 0.0)


def box_blur(img: np.ndarray, ksize=3) -> np.ndarray:
    """``cv2.blur(img, Size(kw, kh))`` (normalized box filter) — exact.

    ``ksize``: int (square) or (rows, cols); odd dims ≥ 1 (cv2 also allows
    even kernels — anchor semantics differ, rejected here).  Default border
    BORDER_REFLECT_101, like cv2.

    Pinned arithmetic (fuzz vs OpenCV 5.0.0): integer dtypes multiply the
    int32 window sum by the **f32** reciprocal — ``cvRound(f32(f32(S) ·
    f32(1/area)))`` — on cv2's SIMD body (0 mismatches there in 240
    configs); cv2's scalar ROW TAIL (last < one-vector columns) uses a
    double scale instead, so the tail is build-dependent and can differ
    by ±1 where the two straddle a .5 boundary (~1 px per 300k in fuzz).
    We implement the SIMD model everywhere (docs/PARITY.md).  float32
    images are the f64 window sum times ``1/area`` rounded once to f32 —
    bitwise (0/100 fuzz configs).
    """
    kind = _img_kind(img, allow_i16=True)
    kh, kw = (int(ksize), int(ksize)) if np.isscalar(ksize) else (int(ksize[0]), int(ksize[1]))
    if kh < 1 or kw < 1 or kh % 2 == 0 or kw % 2 == 0:
        raise ValueError(f"ksize dims must be odd and >= 1, got {(kh, kw)}")
    if kh == 1 and kw == 1:
        return img.copy()
    H, W = img.shape
    area = kh * kw
    acc_dt = np.float64 if kind == "f32" else np.int64
    p = np.pad(img.astype(acc_dt), ((kh // 2,) * 2, (kw // 2,) * 2), mode="reflect")
    rows = np.zeros((H, p.shape[1]), acc_dt)
    for dy in range(kh):
        rows += p[dy : dy + H, :]
    S = np.zeros((H, W), acc_dt)
    for dx in range(kw):
        S += rows[:, dx : dx + W]
    if kind == "f32":
        return (S * (1.0 / area)).astype(np.float32)
    prod = (S.astype(np.float32) * np.float32(1.0 / area)).astype(np.float64)
    return np.clip(np.round(prod), _int_minval(kind), _int_maxval(kind)).astype(img.dtype)


_THRESH_TYPES = ("binary", "binary_inv", "trunc", "tozero", "tozero_inv")


def otsu_threshold(hist: np.ndarray, total: int) -> int:
    """``cv2.THRESH_OTSU`` threshold from a 256-bin histogram — exact
    transcription of cv2's double recurrence (incl. its quirk of leaving
    ``mu1`` scaled when an endpoint iteration is skipped); 0/200 fuzz
    mismatches vs cv2."""
    flt_eps = float(np.float32(1.1920929e-07))
    scale = 1.0 / total
    mu = 0.0
    for i in range(256):
        mu += i * (hist[i] * scale)
    mu1 = 0.0
    q1 = 0.0
    max_sigma = -1.0
    max_val = 0
    for i in range(256):
        p_i = hist[i] * scale
        mu1 *= q1
        q1 += p_i
        q2 = 1.0 - q1
        if min(q1, q2) < flt_eps or max(q1, q2) > 1.0 - flt_eps:
            continue
        mu1 = (mu1 + i * p_i) / q1
        mu2 = (mu - q1 * mu1) / q2
        sigma = q1 * q2 * (mu1 - mu2) * (mu1 - mu2)
        if sigma > max_sigma:
            max_sigma = sigma
            max_val = i
    return max_val


def triangle_threshold(hist: np.ndarray) -> int:
    """``cv2.THRESH_TRIANGLE`` threshold from a 256-bin histogram — exact
    transcription of cv2's geometric algorithm (note ``b = left_bound −
    max_ind`` is NEGATIVE in cv2's line-distance form); 0/300 fuzz
    mismatches vs cv2."""
    h = np.asarray(hist, dtype=np.int64).copy()
    i = 0
    while i < 256 and h[i] == 0:
        i += 1
    left_bound = i if i < 256 else 0
    if left_bound > 0:
        left_bound -= 1
    i = 255
    while i > 0 and h[i] == 0:
        i -= 1
    right_bound = i
    if right_bound < 255:
        right_bound += 1
    maxv = 0
    max_ind = 0
    for i in range(256):
        if h[i] > maxv:
            maxv = int(h[i])
            max_ind = i
    isflipped = False
    if max_ind - left_bound < right_bound - max_ind:
        isflipped = True
        h = h[::-1].copy()
        left_bound = 255 - right_bound
        max_ind = 255 - max_ind
    thresh = left_bound
    a = float(maxv)
    b = float(left_bound - max_ind)
    dist = 0.0
    for i in range(left_bound + 1, max_ind + 1):
        tempdist = a * i + b * h[i]
        if tempdist > dist:
            dist = tempdist
            thresh = i
    thresh -= 1
    if isflipped:
        thresh = 255 - thresh
    return int(thresh)


def threshold(
    img: np.ndarray,
    thresh: float = 0.0,
    maxval: float = 255.0,
    type: str = "binary",
    method: str | None = None,
):
    """``cv2.threshold`` — exact.  Returns ``(ret, dst)`` like cv2.

    ``type``: binary | binary_inv | trunc | tozero | tozero_inv.
    Integer dtypes compare against ``floor(thresh)`` and set
    ``sat(round(maxval))``; float32 compares/sets the f32 values directly
    (probes: fractional thresh/maxval, out-of-range maxval — all exact).
    ``method``: None | "otsu" | "triangle" — compute ``thresh`` from the
    histogram (uint8 only, like cv2), exact per-algorithm transcriptions.
    """
    kind = _img_kind(img, allow_i16=True)
    if type not in _THRESH_TYPES:
        raise ValueError(f"type must be one of {_THRESH_TYPES}, got {type!r}")
    if method is not None:
        if kind != "u8":
            raise TypeError(f"{method} threshold is uint8-only, like cv2")
        hist = np.bincount(img.ravel(), minlength=256)
        thresh = (
            otsu_threshold(hist, img.size) if method == "otsu"
            else triangle_threshold(hist)
        )
    if kind == "f32":
        t = np.float32(thresh)
        mv = np.float32(maxval)
        ret = float(thresh)  # cv2 returns the double input, compares in f32
    else:
        t = int(np.floor(float(thresh)))
        mv = int(np.clip(np.round(float(maxval)), _int_minval(kind), _int_maxval(kind)))
        ret = float(t)
    if type == "binary":
        dst = np.where(img > t, mv, 0)
    elif type == "binary_inv":
        dst = np.where(img > t, 0, mv)
    elif type == "trunc":
        if kind == "f32":
            dst = np.minimum(img, t)
        elif t < _int_minval(kind):
            # cv2's out-of-range special case: a below-range thresh makes
            # TRUNC output ZEROS (probed: i16 t=-32869 → all 0, NOT
            # dtype-min saturation)
            dst = np.zeros_like(img)
        else:
            # int64 then clip: an above-range thresh must saturate, and
            # NumPy 2 rejects out-of-range Python ints in same-dtype ufuncs
            dst = np.clip(
                np.minimum(img.astype(np.int64), t),
                _int_minval(kind), _int_maxval(kind),
            )
    elif type == "tozero":
        dst = np.where(img > t, img, 0)
    else:
        dst = np.where(img > t, 0, img)
    return ret, dst.astype(img.dtype)


def bilateral_filter(
    img: np.ndarray, d: int = 5, sigma_color: float = 50.0, sigma_space: float = 50.0
) -> np.ndarray:
    """``cv2.bilateralFilter`` — edge-preserving denoise, uint8.

    [H,W] gray or [H,W,3] color (cv2's JOINT semantics: one weight per
    pixel from the L1 color distance — channels are NOT independent).
    Bit-exact vs cv2's reference C++ path for gray (0 mismatches over 95
    positive-sigma fuzz configs); color ±1 on ~1e-5 of pixels (cv2's SIMD
    accumulation order).  cv2's default IPP dispatch on x86 differs from
    cv2's own reference path by ±1 on ~20 % of pixels, so ±1 is the
    tightest build-portable contract (ops/bilateral.py docstring).
    σ ≤ 0 raises: OpenCV 5.0's behavior there is data-dependent (probed)
    and cannot be pinned.
    """
    _check_u8(img)
    if sigma_color <= 0 or sigma_space <= 0:
        raise ValueError("sigma_color and sigma_space must be > 0")
    cn = 1 if img.ndim == 2 else img.shape[2]
    if img.ndim not in (2, 3) or cn not in (1, 3):
        raise ValueError(f"expected [H,W] or [H,W,3], got {img.shape}")
    radius = int(round(sigma_space * 1.5)) if d <= 0 else int(d) // 2
    radius = max(radius, 1)
    gc = -0.5 / (sigma_color * sigma_color)
    gs = -0.5 / (sigma_space * sigma_space)
    color_w = np.exp(np.arange(256 * cn, dtype=np.float64) ** 2 * gc).astype(np.float32)
    H, W = img.shape[:2]
    pw = ((radius, radius), (radius, radius)) + (((0, 0),) if cn == 3 else ())
    p = np.pad(img, pw, mode="reflect").astype(np.float32)
    c = p[radius : radius + H, radius : radius + W]
    num = np.zeros(c.shape, np.float32)
    den = np.zeros((H, W), np.float32)
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            r = np.sqrt(i * i + j * j)
            if r > radius:
                continue
            w0 = np.float32(np.exp(r * r * gs))
            v = p[radius + i : radius + i + H, radius + j : radius + j + W]
            diff = (np.abs(v - c) if cn == 1 else np.abs(v - c).sum(axis=-1)).astype(np.int32)
            w = (w0 * color_w[diff]).astype(np.float32)
            num = (num + v * (w[..., None] if cn == 3 else w)).astype(np.float32)
            den = (den + w).astype(np.float32)
    out = num / (den[..., None] if cn == 3 else den)
    return np.clip(np.round(out.astype(np.float64)), 0, 255).astype(np.uint8)


def median_blur(img: np.ndarray, ksize: int = 3) -> np.ndarray:
    """``cv2.medianBlur`` — exact; border = replicate (SURVEY.md §8.2).

    uint16/int16 are supported for k∈{3,5} (cv2 parity, exact — i16
    verified order-statistic-identical to the u16 path by offset probe);
    float32 for any odd k (cv2 only supports k=3 for floats — a strict
    extension; the k=3 float results match cv2 exactly).
    """
    _img_kind(img, allow_i16=True)
    if ksize % 2 == 0 or ksize < 3:
        raise ValueError("ksize must be odd and >= 3")
    pad = ksize // 2
    p = np.pad(img, pad, mode="edge")
    H, W = img.shape
    windows = np.stack(
        [p[dy : dy + H, dx : dx + W] for dy in range(ksize) for dx in range(ksize)],
        axis=-1,
    )
    return np.median(windows, axis=-1).astype(img.dtype)


# ---------------------------------------------------------------------------
# General blending / color conversion
# ---------------------------------------------------------------------------

def add_weighted(
    src1: np.ndarray,
    alpha: float,
    src2: np.ndarray,
    beta: float,
    gamma: float = 0.0,
) -> np.ndarray:
    """``cv2.addWeighted(src1, α, src2, β, γ)`` — exact, all dtypes.

    Pinned arithmetic (model-fitting probes, 0/900 integer + 0/400 f32
    fuzz configs vs OpenCV 5.0.0): a chain of TWO single-rounded f32 FMAs
    with the weights first narrowed to f32 —

        t   = f32(src2·f32(β) + f32(γ))
        acc = f32(src1·f32(α) + t)

    Integer dtypes then apply ``cvRound`` (half-to-even) and saturate;
    float32 returns ``acc`` directly (no rounding, no saturation).  The
    f64 math below emulates each single-rounded f32 FMA exactly (products
    of f32 values are exact in f64).
    """
    kind = _img_kind(src1, allow_i16=True)
    if src2.dtype != src1.dtype:
        raise TypeError(f"src dtypes differ: {src1.dtype} vs {src2.dtype}")
    if src2.shape != src1.shape:
        raise ValueError(f"src shapes differ: {src1.shape} vs {src2.shape}")
    al = float(np.float32(alpha))
    be = float(np.float32(beta))
    ga = float(np.float32(gamma))
    t = np.float32(src2.astype(np.float64) * be + ga)
    acc = np.float32(src1.astype(np.float64) * al + t.astype(np.float64))
    if kind == "f32":
        return acc
    return np.clip(
        np.round(acc.astype(np.float64)), _int_minval(kind), _int_maxval(kind)
    ).astype(src1.dtype)


# cv2's RGB→gray weights (0.299, 0.587, 0.114) as the EXACT constants its
# u8/u16 and f32 paths use (probes: u8 exhaustive 16.7M triples 0 diff;
# u16 262k-sample fuzz 0 diff; f32 262k-sample fuzz 0 diff):
#   integer: 15-bit fixed point with a SUM-PRESERVING blue coefficient
#            (cB = 2^15 − cR − cG, NOT independently rounded), then
#            DESCALE: (acc + 2^14) >> 15.  The shift-15 accumulator is
#            also why u16 fits: 65535·2^15 + 2^14 < 2^31.
#   float:   fma(b, cB, fma(r, cR, g·cG)) — green's product first, each
#            step a single-rounded f32 FMA.
_GRAY_CR, _GRAY_CG = 9798, 19235            # round(0.299·2^15), round(0.587·2^15)
_GRAY_CB = 32768 - _GRAY_CR - _GRAY_CG      # 3735: sum-preserving


def cvt_gray(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(img, COLOR_{RGB,BGR}[A]2GRAY)`` — exact (u8/u16/f32).

    ``img``: [H, W, C] with C ∈ {3, 4} (alpha ignored, like cv2);
    ``order``: "rgb" or "bgr" (which end of the channel axis is red).
    """
    kind = _img_kind(img)
    if img.ndim != 3 or img.shape[-1] not in (3, 4):
        raise ValueError(f"expected [H,W,3|4], got {img.shape}")
    if order not in ("rgb", "bgr"):
        raise ValueError(f"order must be 'rgb' or 'bgr', got {order!r}")
    ri, gi, bi = (0, 1, 2) if order == "rgb" else (2, 1, 0)
    if kind == "f32":
        # cv2 walks the channels in MEMORY order x0,x1,x2 (with each
        # order's own weights): fma(x2, w2, fma(x0, w0, x1·w1)) — pinned
        # for both RGB and BGR (the naive "always b last" chain mismatches
        # BGR everywhere).  Each FMA is single-rounded f32, emulated in
        # f64 (products of f32 values are exact there).
        w = {ri: 0.299, gi: 0.587, bi: 0.114}
        x0, x1, x2 = (img[..., i].astype(np.float64) for i in range(3))
        t = np.float32(x0 * float(np.float32(w[0]))
                       + np.float32(x1 * float(np.float32(w[1]))).astype(np.float64))
        return np.float32(x2 * float(np.float32(w[2])) + t.astype(np.float64))
    r, g, b = (img[..., i].astype(np.int64) for i in (ri, gi, bi))
    acc = r * _GRAY_CR + g * _GRAY_CG + b * _GRAY_CB + (1 << 14)
    return (acc >> 15).astype(img.dtype)


# cv2's YCrCb fixed point (shift 14; Y here uses the CLASSIC 14-bit table
# — 4899/9617/1868 sum-preserving at 14 bits — while →GRAY uses the
# 15-bit table: a pinned cv2 inconsistency).  Probes: u8+u16 fwd/inv
# maxdiff 0; f32 = reverse-memory-order FMA chain with f32-subtracted
# chroma deltas, exact on cv2's vector body (tail like cvt_gray).
_YCRCB = dict(sh=14, cR=4899, cG=9617, cB=(1 << 14) - 4899 - 9617,
              c713=11682, c564=9241, inv=(22987, 11698, 5636, 29049))


def rgb_to_ycrcb(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(COLOR_{RGB,BGR}2YCrCb)`` — exact (u8/u16; f32 on
    cv2's vector body)."""
    kind = _img_kind(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    if order not in ("rgb", "bgr"):
        raise ValueError(f"order must be 'rgb' or 'bgr', got {order!r}")
    ri, gi, bi = (0, 1, 2) if order == "rgb" else (2, 1, 0)
    p = _YCRCB
    if kind == "f32":
        w = {ri: 0.299, gi: 0.587, bi: 0.114}
        x0, x1, x2 = (img[..., i].astype(np.float64) for i in range(3))
        t = np.float32(x1 * float(np.float32(w[1]))
                       + np.float32(x2 * float(np.float32(w[2]))).astype(np.float64))
        y = np.float32(x0 * float(np.float32(w[0])) + t.astype(np.float64))
        y64 = y.astype(np.float64)
        cr = np.float32(np.float32(img[..., ri].astype(np.float64) - y64).astype(np.float64)
                        * float(np.float32(0.713)) + 0.5)
        cb = np.float32(np.float32(img[..., bi].astype(np.float64) - y64).astype(np.float64)
                        * float(np.float32(0.564)) + 0.5)
        return np.stack([y, cr, cb], axis=-1)
    r, g, b = (img[..., i].astype(np.int64) for i in (ri, gi, bi))
    half = 1 << (p["sh"] - 1)
    y = (r * p["cR"] + g * p["cG"] + b * p["cB"] + half) >> p["sh"]
    d = 128 if kind == "u8" else 32768
    cr = ((r - y) * p["c713"] + half >> p["sh"]) + d
    cb = ((b - y) * p["c564"] + half >> p["sh"]) + d
    maxv = 2 * d - 1
    return np.stack(
        [np.clip(v, 0, maxv) for v in (y, cr, cb)], axis=-1
    ).astype(img.dtype)


def ycrcb_to_rgb(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(COLOR_YCrCb2{RGB,BGR})`` — exact (u8/u16; f32 on
    cv2's vector body)."""
    kind = _img_kind(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    if order not in ("rgb", "bgr"):
        raise ValueError(f"order must be 'rgb' or 'bgr', got {order!r}")
    c1, c2, c3, c4 = _YCRCB["inv"]
    if kind == "f32":
        y = img[..., 0].astype(np.float64)
        dcr = np.float32(img[..., 1] - np.float32(0.5)).astype(np.float64)
        dcb = np.float32(img[..., 2] - np.float32(0.5)).astype(np.float64)
        f1, f2, f3, f4 = (float(np.float32(v)) for v in (1.403, -0.714, -0.344, 1.773))
        r = np.float32(dcr * f1 + y)
        g = np.float32(dcr * f2 + np.float32(dcb * f3 + y).astype(np.float64))
        b = np.float32(dcb * f4 + y)
        out = [r, g, b]
    else:
        d = 128 if kind == "u8" else 32768
        maxv = 2 * d - 1
        half = 1 << (_YCRCB["sh"] - 1)
        y = img[..., 0].astype(np.int64)
        dcr = img[..., 1].astype(np.int64) - d
        dcb = img[..., 2].astype(np.int64) - d
        r = y + ((dcr * c1 + half) >> _YCRCB["sh"])
        g = y + ((dcr * (-c2) + dcb * (-c3) + half) >> _YCRCB["sh"])
        b = y + ((dcb * c4 + half) >> _YCRCB["sh"])
        out = [np.clip(v, 0, maxv) for v in (r, g, b)]
    if order == "bgr":
        out = out[::-1]
    return np.stack(out, axis=-1).astype(img.dtype)


def adaptive_threshold(
    img: np.ndarray,
    maxval: float = 255.0,
    method: str = "mean",
    type: str = "binary",
    block_size: int = 3,
    C: float = 0.0,
) -> np.ndarray:
    """``cv2.adaptiveThreshold`` — exact (uint8 only, like cv2).

    Pinned (probes, 0/160+ fuzz configs vs cv2): the local mean uses
    BORDER_REPLICATE; the "mean" method is the box-sum × f32-reciprocal
    model (like ``blur``); the "gaussian" method uses cv2's FLOAT σ=0
    kernel in f64 — NOT the u8 fixed-point GaussianBlur path (a pinned
    quirk); ``idelta = ceil(C)`` for binary / ``floor(C)`` for
    binary_inv; ``dst = src > mean − idelta ? sat(round(maxval)) : 0``
    (selects swapped for binary_inv).
    """
    _check_u8(img)
    if type not in ("binary", "binary_inv"):
        raise ValueError(f"type must be binary|binary_inv, got {type!r}")
    if method not in ("mean", "gaussian"):
        raise ValueError(f"method must be mean|gaussian, got {method!r}")
    bs = int(block_size)
    if bs < 3 or bs % 2 == 0:
        raise ValueError(f"block_size must be odd and >= 3, got {bs}")
    H, W = img.shape
    r = bs // 2
    if method == "mean":
        p = np.pad(img.astype(np.int64), r, mode="edge")
        S = np.zeros((H, W), np.int64)
        rows = np.zeros((H, p.shape[1]), np.int64)
        for dy in range(bs):
            rows += p[dy : dy + H, :]
        for dx in range(bs):
            S += rows[:, dx : dx + W]
        mean = np.round(
            (S.astype(np.float32) * np.float32(1.0 / (bs * bs))).astype(np.float64)
        ).astype(np.int64)
    else:
        k = gaussian_kernel(bs, 0.0)
        p = np.pad(img.astype(np.float64), r, mode="edge")
        rows = np.zeros((H, p.shape[1]))
        for dy in range(bs):
            rows += p[dy : dy + H, :] * k[dy]
        acc = np.zeros((H, W))
        for dx in range(bs):
            acc += rows[:, dx : dx + W] * k[dx]
        mean = np.round(acc).astype(np.int64)
    idelta = int(np.ceil(C)) if type == "binary" else int(np.floor(C))
    mv = int(np.clip(np.round(float(maxval)), 0, 255))
    hit = img.astype(np.int64) > mean - idelta
    out = np.where(hit, mv, 0) if type == "binary" else np.where(hit, 0, mv)
    return out.astype(np.uint8)


_MORPH_OPS = ("erode", "dilate", "open", "close", "gradient", "tophat", "blackhat")


def _minmax_filter_np(img, kh, kw, op):
    kind = _img_kind(img, allow_i16=True)
    if kind == "f32":
        pad = np.inf if op == "min" else -np.inf
    else:
        pad = _int_maxval(kind) if op == "min" else _int_minval(kind)
    p = np.pad(img.astype(np.float64 if kind == "f32" else np.int64),
               ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)),
               mode="constant", constant_values=pad)
    H, W = img.shape
    f = np.minimum if op == "min" else np.maximum
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            v = p[dy : dy + H, dx : dx + W]
            acc = v if acc is None else f(acc, v)
    return acc.astype(img.dtype)


def _morph_k2(ksize):
    if np.isscalar(ksize):
        return int(ksize), int(ksize)
    return int(ksize[0]), int(ksize[1])


def erode(img: np.ndarray, ksize=3, iterations: int = 1, kernel=None) -> np.ndarray:
    """``cv2.erode`` — exact min filter with identity border; rect by
    ``ksize`` or an arbitrary 0/1 ``kernel`` (ellipse/cross/custom —
    anchor kh//2, probe-exact vs cv2 structuring elements).  Even
    kernels supported.  Dtypes u8/u16/i16/f32."""
    if kernel is not None:
        for _ in range(max(1, int(iterations))):
            img = _minmax_filter_kernel(img, kernel, "min")
        return img
    kh, kw = _morph_k2(ksize)
    for _ in range(max(1, int(iterations))):
        img = _minmax_filter_np(img, kh, kw, "min")
    return img


def dilate(img: np.ndarray, ksize=3, iterations: int = 1, kernel=None) -> np.ndarray:
    """``cv2.dilate`` — exact max filter (see ``erode``)."""
    if kernel is not None:
        for _ in range(max(1, int(iterations))):
            img = _minmax_filter_kernel(img, kernel, "max")
        return img
    kh, kw = _morph_k2(ksize)
    for _ in range(max(1, int(iterations))):
        img = _minmax_filter_np(img, kh, kw, "max")
    return img


def morphology(img: np.ndarray, op: str = "open", ksize=3, iterations: int = 1,
               kernel=None) -> np.ndarray:
    """``cv2.morphologyEx`` (rect kernel) — exact compositions (probes):
    open = dilateⁿ∘erodeⁿ, close = erodeⁿ∘dilateⁿ, gradient =
    sat(dilate − erode), tophat = sat(src − open), blackhat =
    sat(close − src)."""
    if op not in _MORPH_OPS:
        raise ValueError(f"op must be one of {_MORPH_OPS}, got {op!r}")
    kind = _img_kind(img, allow_i16=True)

    def sat_sub(a, b):
        if kind == "f32":
            return (a - b).astype(np.float32)
        return np.clip(a.astype(np.int64) - b.astype(np.int64),
                       _int_minval(kind), _int_maxval(kind)).astype(img.dtype)

    def E(x):
        return erode(x, ksize, iterations, kernel)

    def D(x):
        return dilate(x, ksize, iterations, kernel)

    if op == "erode":
        return E(img)
    if op == "dilate":
        return D(img)
    if op == "open":
        return D(E(img))
    if op == "close":
        return E(D(img))
    if op == "gradient":
        return sat_sub(D(img), E(img))
    if op == "tophat":
        return sat_sub(img, D(E(img)))
    return sat_sub(E(D(img)), img)


def deriv_kernels(dx: int, dy: int, ksize: int = 3):
    """``cv2.getDerivKernels(dx, dy, ksize)`` (normalize=False) — exact.

    Pinned generation rule (verified against cv2 over the full grid in
    tests): each axis kernel of order ``o`` is
    ``[1] ⊛ [1,1]^(ksz−o−1) ⊛ [−1,1]^o`` with ``ksz = 3`` when
    ``ksize == 1`` and ``o > 0`` (no smoothing), else ``ksize``.
    ``ksize = -1`` selects the Scharr pair ([3,10,3] smoothing,
    [−1,0,1] derivative; requires dx+dy == 1).  Returns (kx, ky) int
    row vectors (x = columns axis, like cv2).
    """
    if ksize == -1:
        if dx + dy != 1 or min(dx, dy) != 0:
            raise ValueError("Scharr (ksize=-1) needs (dx,dy) in {(1,0),(0,1)}")
        d = np.array([-1, 0, 1], np.int64)
        s = np.array([3, 10, 3], np.int64)
        return (d, s) if dx == 1 else (s, d)
    if ksize % 2 == 0 or ksize < 1 or ksize > 27:
        # cv2 allows up to 31 but returns FLOAT kernels whose binomials
        # round in f32 beyond k=27 (C(28,14) > 2^24); we keep the exact
        # integer domain
        raise ValueError(f"ksize must be -1 or odd in [1, 27], got {ksize}")

    def one(order):
        ksz = 3 if (ksize == 1 and order > 0) else ksize
        if order >= ksz:
            raise ValueError(f"derivative order {order} needs ksize > {order}")
        k = np.array([1], np.int64)
        for _ in range(ksz - order - 1):
            k = np.convolve(k, [1, 1])
        for _ in range(order):
            k = np.convolve(k, [-1, 1])
        return k

    return one(dx), one(dy)


def sobel(
    img: np.ndarray, dx: int = 1, dy: int = 0, ksize: int = 3,
    scale: float = 1.0, delta: float = 0.0,
) -> np.ndarray:
    """``cv2.Sobel`` / ``cv2.Scharr`` (``ksize=-1``) — REFLECT_101 border.

    Integer inputs widen like our Laplacian (u8→i16 saturating,
    u16/i16→i32); f32→f32.  ``scale == 1``: exact integer separable conv
    + ``cvRound(delta)`` (probes: 0 mismatches).  ``scale ≠ 1``: cv2
    folds the scale into a float kernel and its SIMD accumulation order
    leaves scattered ±1 (documented budget, like the i16 Gaussian float
    path); the oracle uses the f64 fold.  f32 inputs follow cv2's float
    path at ULP-level (accumulation-order) tolerance.
    """
    kind = _img_kind(img, allow_i16=True)
    kx, ky = deriv_kernels(dx, dy, ksize)
    H, W = img.shape
    ph, pw = len(ky) // 2, len(kx) // 2
    if kind == "f32" or scale != 1.0:
        p = np.pad(img.astype(np.float64), ((ph, ph), (pw, pw)), mode="reflect")
        kxf = kx.astype(np.float64) * float(scale)
        v = np.zeros((H, p.shape[1]))
        for i, t in enumerate(ky):
            v += float(t) * p[i : i + H, :]
        acc = np.zeros((H, W))
        for i, t in enumerate(kxf):
            acc += t * v[:, i : i + W]
        if kind == "f32":
            return (acc + float(delta)).astype(np.float32)
        out = np.round(acc + float(delta))
    else:
        p = np.pad(img.astype(np.int64), ((ph, ph), (pw, pw)), mode="reflect")
        v = np.zeros((H, p.shape[1]), np.int64)
        for i, t in enumerate(ky):
            v += int(t) * p[i : i + H, :]
        acc = np.zeros((H, W), np.int64)
        for i, t in enumerate(kx):
            acc += int(t) * v[:, i : i + W]
        out = acc + int(np.round(float(delta)))
    if kind == "u8":
        return np.clip(out, -32768, 32767).astype(np.int16)
    return np.clip(out, -(2**31), 2**31 - 1).astype(np.int32)


# cv2 u8 HSV (probes): forward is 12-bit fixed point — EXACT:
#   sdiv[i] = cvRound((255<<12)/i), hdiv[i] = cvRound((180<<12)/(6i));
#   V = max, diff = V−min, S = (diff·sdiv[V] + 2^11) >> 12,
#   Hraw = g−b | b−r+2·diff | r−g+4·diff by argmax branch (r-first),
#   H = ((Hraw·hdiv[diff] + 2^11) >> 12) (+180 if negative).
# The inverse is cv2's f32 sector chain, whose 32-pixel SIMD body
# TRUNCATES the final ·255 while its scalar tail ROUNDS (probed; the
# build-dependent tail is ±1 — docs/PARITY.md).  We implement the body.
_HSV_SHIFT = 12
_HSV_SECTOR = ((0, 3, 1), (2, 0, 1), (1, 0, 3), (1, 2, 0), (3, 1, 0), (0, 1, 2))


def _hsv_tables():
    i = np.arange(256, dtype=np.float64)
    with np.errstate(divide="ignore"):
        sdiv = np.where(i == 0, 0, np.round((255 << _HSV_SHIFT) / i)).astype(np.int64)
        hdiv = np.where(i == 0, 0, np.round((180 << _HSV_SHIFT) / (6.0 * i))).astype(np.int64)
    return sdiv, hdiv


def rgb_to_hsv(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(COLOR_{RGB,BGR}2HSV)`` — exact (uint8; H ∈ 0..179)."""
    _check_u8(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    if order not in ("rgb", "bgr"):
        raise ValueError(f"order must be 'rgb' or 'bgr', got {order!r}")
    ri, gi, bi = (0, 1, 2) if order == "rgb" else (2, 1, 0)
    r, g, b = (img[..., i].astype(np.int64) for i in (ri, gi, bi))
    sdiv, hdiv = _hsv_tables()
    v = np.maximum(np.maximum(r, g), b)
    vmin = np.minimum(np.minimum(r, g), b)
    diff = v - vmin
    half = 1 << (_HSV_SHIFT - 1)
    s = (diff * sdiv[v] + half) >> _HSV_SHIFT
    h_raw = np.where(v == r, g - b,
                     np.where(v == g, b - r + 2 * diff, r - g + 4 * diff))
    h = (h_raw * hdiv[diff] + half) >> _HSV_SHIFT
    h = np.where(h < 0, h + 180, h)
    return np.stack([h, s, v], axis=-1).astype(np.uint8)


def hsv_to_rgb(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(COLOR_HSV2{RGB,BGR})`` — cv2's SIMD-body model
    (uint8).  cv2's own scalar row tail ROUNDS where its 32-pixel SIMD
    body TRUNCATES, so full-row bit identity is build-dependent; parity
    is exact on the body and ±1 on cv2's tail (docs/PARITY.md)."""
    _check_u8(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    if order not in ("rgb", "bgr"):
        raise ValueError(f"order must be 'rgb' or 'bgr', got {order!r}")
    f32 = np.float32
    h = (img[..., 0].astype(f32) * f32(6.0 / 180.0)).astype(f32)
    s = (img[..., 1].astype(f32) * f32(1.0 / 255.0)).astype(f32)
    v = (img[..., 2].astype(f32) * f32(1.0 / 255.0)).astype(f32)
    sector = np.floor(h).astype(np.int64) % 6
    f = (h - np.floor(h)).astype(f32)
    tab = [v,
           (v * (f32(1) - s)).astype(f32),
           (v * (f32(1) - (s * f).astype(f32))).astype(f32),
           (v * (f32(1) - (s * (f32(1) - f)).astype(f32))).astype(f32)]
    out = []
    for comp in range(3):
        val = np.select([sector == k for k in range(6)],
                        [tab[_HSV_SECTOR[k][comp]] for k in range(6)])
        out.append(np.clip(np.floor((val.astype(f32) * f32(255.0)).astype(np.float64)),
                           0, 255))
    if order == "bgr":
        out = out[::-1]
    return np.stack(out, axis=-1).astype(np.uint8)


# cv2 u8 HLS (pinned EXHAUSTIVELY, all 2^24 inputs both directions,
# probes 2026-08-17): the u8 path runs cv2's FLOAT body on 1/255-scaled
# f32 values.  Forward (SIMD-body model): L=(v+vmin)/2;
# S=diff/(v+vmin) if L<0.5 else diff/(2-(v+vmin)) — the body subtracts
# the PRE-SUMMED v+vmin where the scalar tail computes (2-v)-vmin; hue
# h = FMA(X, 60/diff, C) with X the branch numerator (g-b | b-r | r-g,
# r-first ties) and C in {0,120,240} — the FMA is SINGLE-rounded
# (hardware fma in cv2's SIMD body; the double-rounded mul+add model
# misses 1744/2^24 tie pixels in BOTH directions, the folded
# +2diff/+4diff HSV-style numerator misses ~850); a negative hue is
# re-FMA'd with +360 (the tail double-rounds h+360 instead).  Outputs
# cvRound(h/2), cvRound(L*255), cvRound(S*255) — half-to-even.
# Inverse: cv2's p1/p2 sector chain in plain f32 (exhaustively
# identical for body AND tail, insensitive to FMA contraction).
_HLS_SECTOR = ((1, 3, 0), (1, 0, 2), (3, 0, 1), (0, 2, 1), (0, 1, 3), (2, 1, 0))


def _hls_fwd_tables():
    """Device-side tables keyed by raw u8 pairs (idx = a*256 + b):
    d60[v,vmin] = f32 60/(f32(v/255)-f32(vmin/255)); X[a,b] = f32 scaled
    difference; L8/S8[v,vmin] = the final rounded L and S bytes.  Every
    f32 rounding the cv2 body performs is frozen into the tables, so
    the device op needs only gathers + one emulated FMA."""
    f32 = np.float32
    c = f32(1.0 / 255.0)
    s = (np.arange(256, dtype=f32) * c).astype(f32)          # scaled channel
    a = s[:, None]
    b = s[None, :]
    X = (a - b).astype(f32)                                   # [256,256]
    diff = X                                                  # v rows, vmin cols
    with np.errstate(divide="ignore"):
        d60 = (f32(60.0) / np.where(diff > 0, diff, f32(1))).astype(f32)
    vsum = (a + b).astype(f32)
    l = (vsum * f32(0.5)).astype(f32)
    denom = np.where(l < f32(0.5), vsum, (f32(2.0) - vsum).astype(f32)).astype(f32)
    sval = np.where(diff > 0,
                    (diff / np.where(denom == 0, f32(1), denom)).astype(f32),
                    f32(0.0))
    L8 = np.round((l * f32(255.0)).astype(np.float64)).astype(np.uint8)
    S8 = np.clip(np.round((sval * f32(255.0)).astype(np.float64)),
                 0, 255).astype(np.uint8)
    return d60, X, L8, S8


def _hls_inv_tables():
    """Inverse tables: p2/p1[l,s] (f32, idx = L*256 + S) and the per-H
    sector/fraction tables for h = H * 6/180."""
    f32 = np.float32
    c = f32(1.0 / 255.0)
    L = (np.arange(256, dtype=f32) * c).astype(f32)[:, None]
    S = (np.arange(256, dtype=f32) * c).astype(f32)[None, :]
    p2a = (L * (f32(1.0) + S).astype(f32)).astype(f32)
    p2b = ((L + S).astype(f32) - (L * S).astype(f32)).astype(f32)
    p2 = np.where(L <= f32(0.5), p2a, p2b).astype(f32)
    p1 = ((f32(2.0) * L).astype(f32) - p2).astype(f32)
    h = (np.arange(256, dtype=f32) * f32(6.0 / 180.0)).astype(f32)
    h = np.where(h >= 6, (h - f32(6.0)).astype(f32), h)
    sec = np.floor(h).astype(np.int32)
    hf = (h - sec.astype(f32)).astype(f32)
    return p2, p1, sec, hf


def rgb_to_hls(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(COLOR_{RGB,BGR}2HLS)`` — the SIMD-BODY model,
    EXHAUSTIVELY bit-exact on it (uint8; H ∈ 0..180; all 2^24 inputs in
    wide rows, 0 LSB).  cv2's own scalar row TAIL (the last
    width-mod-vecwidth pixels of each row) differs from its body in two
    spots — S's denominator association ((2−v)−vmin vs 2−(v+vmin)) and
    the negative-hue wrap (+360 double-rounded vs single FMA) — so
    parity on tail pixels is ±1 and build-dependent, exactly like
    HSV2RGB (docs/PARITY.md)."""
    _check_u8(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    if order not in ("rgb", "bgr"):
        raise ValueError(f"order must be 'rgb' or 'bgr', got {order!r}")
    f32 = np.float32
    ri, gi, bi = (0, 1, 2) if order == "rgb" else (2, 1, 0)
    f = (img.astype(f32) * f32(1.0 / 255.0)).astype(f32)
    R, G, B = f[..., ri], f[..., gi], f[..., bi]
    v = np.maximum(np.maximum(R, G), B).astype(f32)
    vmin = np.minimum(np.minimum(R, G), B).astype(f32)
    diff = (v - vmin).astype(f32)
    live = diff > np.float32(np.finfo(np.float32).eps)
    vsum = (v + vmin).astype(f32)
    l = (vsum * f32(0.5)).astype(f32)
    denom = np.where(l < f32(0.5), vsum, (f32(2.0) - vsum).astype(f32)).astype(f32)
    s = np.where(live, (diff / np.where(denom == 0, f32(1), denom)).astype(f32),
                 f32(0.0))
    d60 = (f32(60.0) / np.where(live, diff, f32(1))).astype(f32)
    X = np.where(v == R, (G - B).astype(f32),
                 np.where(v == G, (B - R).astype(f32), (R - G).astype(f32)))
    C = np.where(v == R, f32(0.0), np.where(v == G, f32(120.0), f32(240.0)))
    # cv2's SIMD body computes h with a SINGLE-rounded fma (f64 product
    # + add is exact to well past f32, so one final cast reproduces it);
    # a negative hue is re-FMA'd with +360, again single-rounded
    X64, d64 = X.astype(np.float64), d60.astype(np.float64)
    h = (X64 * d64 + C.astype(np.float64)).astype(f32)
    h = np.where(h < 0, (X64 * d64 + 360.0).astype(f32), h)
    h = np.where(live, h, f32(0.0))
    H8 = np.round((h * f32(0.5)).astype(np.float64)).astype(np.int64)
    L8 = np.round((l * f32(255.0)).astype(np.float64)).astype(np.int64)
    S8 = np.round((s * f32(255.0)).astype(np.float64)).astype(np.int64)
    return np.stack([np.clip(H8, 0, 255), np.clip(L8, 0, 255),
                     np.clip(S8, 0, 255)], -1).astype(np.uint8)


def hls_to_rgb(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(COLOR_HLS2{RGB,BGR})`` — EXHAUSTIVELY bit-exact
    (uint8; all 2^24 inputs, 0 LSB; unlike HSV2RGB the tie profile is
    insensitive to FMA contraction, so plain f32 suffices)."""
    _check_u8(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    if order not in ("rgb", "bgr"):
        raise ValueError(f"order must be 'rgb' or 'bgr', got {order!r}")
    f32 = np.float32
    Hc = img[..., 0].astype(f32)
    L = (img[..., 1].astype(f32) * f32(1.0 / 255.0)).astype(f32)
    S = (img[..., 2].astype(f32) * f32(1.0 / 255.0)).astype(f32)
    p2 = np.where(L <= f32(0.5), (L * (f32(1.0) + S).astype(f32)).astype(f32),
                  ((L + S).astype(f32) - (L * S).astype(f32)).astype(f32))
    p1 = ((f32(2.0) * L).astype(f32) - p2).astype(f32)
    h = (Hc * f32(6.0 / 180.0)).astype(f32)
    h = np.where(h < 0, (h + f32(6.0)).astype(f32), h)
    h = np.where(h >= 6, (h - f32(6.0)).astype(f32), h)
    sec = np.floor(h).astype(np.int64)
    hf = (h - sec.astype(f32)).astype(f32)
    d = (p2 - p1).astype(f32)
    tab = [p2, p1,
           (p1 + (d * (f32(1.0) - hf).astype(f32)).astype(f32)).astype(f32),
           (p1 + (d * hf).astype(f32)).astype(f32)]
    gray = img[..., 2] == 0
    out = np.empty(img.shape, np.uint8)
    bgr = [None, None, None]
    for comp in range(3):  # b, g, r per cv2's sector table
        val = np.select([sec % 6 == k for k in range(6)],
                        [tab[_HLS_SECTOR[k][comp]] for k in range(6)])
        val = np.where(gray, L, val).astype(f32)
        bgr[comp] = np.clip(np.round((val * f32(255.0)).astype(np.float64)),
                            0, 255).astype(np.uint8)
    rgb = [bgr[2], bgr[1], bgr[0]]
    if order == "bgr":
        rgb = rgb[::-1]
    for i in range(3):
        out[..., i] = rgb[i]
    return out


_PYR_K = (1, 4, 6, 4, 1)


def pyr_down(img: np.ndarray) -> np.ndarray:
    """``cv2.pyrDown`` — exact for integer dtypes (u8/u16/i16).

    Pinned (probes, 0 mismatches over 60 fuzz configs incl. odd sizes):
    REFLECT_101 pad-2, separable [1,4,6,4,1] integer conv, DESCALE
    ``(acc + 128) >> 8``, then take the even rows/columns (output
    ``ceil(H/2) × ceil(W/2)``).  float32 uses the same conv in float
    (f64 oracle; cv2's f32 accumulation is within ULP tolerance).
    """
    kind = _img_kind(img, allow_i16=True)
    H, W = img.shape
    k = _PYR_K
    if kind == "f32":
        p = np.pad(img.astype(np.float64), 2, mode="reflect")
        v = sum(float(k[i]) * p[i : i + H, :] for i in range(5))
        a = sum(float(k[i]) * v[:, i : i + W] for i in range(5))
        return (a[::2, ::2] / 256.0).astype(np.float32)
    p = np.pad(img.astype(np.int64), 2, mode="reflect")
    v = sum(k[i] * p[i : i + H, :] for i in range(5))
    a = sum(k[i] * v[:, i : i + W] for i in range(5))
    return (((a + 128) >> 8)[::2, ::2]).astype(img.dtype)


def pyr_up(img: np.ndarray) -> np.ndarray:
    """``cv2.pyrUp`` — exact for integer dtypes (u8/u16/i16).

    Pinned: zero-stuff to ``2H × 2W`` at even indices, REFLECT_101 pad-2
    of the STUFFED image, separable [1,4,6,4,1] conv, DESCALE
    ``(acc + 32) >> 6`` (each axis's live taps sum to 8).
    """
    kind = _img_kind(img, allow_i16=True)
    H, W = img.shape
    k = _PYR_K
    if kind == "f32":
        up = np.zeros((2 * H, 2 * W))
        up[::2, ::2] = img
        p = np.pad(up, 2, mode="reflect")
        v = sum(float(k[i]) * p[i : i + 2 * H, :] for i in range(5))
        a = sum(float(k[i]) * v[:, i : i + 2 * W] for i in range(5))
        return (a / 64.0).astype(np.float32)
    up = np.zeros((2 * H, 2 * W), np.int64)
    up[::2, ::2] = img
    p = np.pad(up, 2, mode="reflect")
    v = sum(k[i] * p[i : i + 2 * H, :] for i in range(5))
    a = sum(k[i] * v[:, i : i + 2 * W] for i in range(5))
    return ((a + 32) >> 6).astype(img.dtype)


def filter2d(img: np.ndarray, kernel: np.ndarray, delta: float = 0.0) -> np.ndarray:
    """``cv2.filter2D(img, -1, kernel, delta=δ)`` — custom-kernel
    correlation (no flip), anchor ``(kh//2, kw//2)``, REFLECT_101.

    Pinned (probes/fuzz): f64 accumulation + ``cvRound(acc + δ)`` +
    saturate.  Integer-valued kernels are exact on every dtype (0/40
    fuzz per dtype); float kernels are exact on u8 and within ±1 on
    u16/i16 (cv2 accumulates those in f32 — scattered boundary flips);
    float32 images follow cv2's float path at ULP tolerance.
    """
    kind = _img_kind(img, allow_i16=True)
    kernel = np.asarray(kernel, np.float64)
    if kernel.ndim != 2:
        raise ValueError(f"kernel must be 2-D, got shape {kernel.shape}")
    kh, kw = kernel.shape
    H, W = img.shape
    p = np.pad(img.astype(np.float64),
               ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)),
               mode="reflect")
    acc = np.zeros((H, W))
    for dy in range(kh):
        for dx in range(kw):
            t = kernel[dy, dx]
            if t != 0.0:
                acc += t * p[dy : dy + H, dx : dx + W]
    if kind == "f32":
        return (acc + float(delta)).astype(np.float32)
    return np.clip(
        np.round(acc + float(delta)), _int_minval(kind), _int_maxval(kind)
    ).astype(img.dtype)


# ---------------------------------------------------------------------------
# geometric resize (cv2.resize)
# ---------------------------------------------------------------------------

_RESIZE_SHIFT = 11                       # INTER_RESIZE_COEF_BITS
_RESIZE_SCALE = 1 << _RESIZE_SHIFT


def resize_lin_tables(n: int, on: int, area: bool = False):
    """Per-axis linear-resize tables: ``(i0, i1, frac)``.

    Pinned empirically (docs/PARITY.md): cv2 computes the source
    coordinate ``(dx+0.5)*n/on - 0.5`` in double, stores it as FLOAT32,
    splits floor/frac, and clamps only the INDICES at the borders — the
    fractional part keeps its out-of-range value (e.g. -0.3 at the top
    edge), which changes the fixed-point coefficients vs a clamped
    model.  ``area=True`` gives INTER_AREA's upscale coordinates:
    ``sx = floor(dx*scale)``, ``fx = (dx+1) - (sx+1)*on/n`` clamped at
    0 (exact on the probe grids W2->5/7, W3->7, W4->9).
    """
    scale = n / on
    if area:
        # NOTE boundary caveat: when dx*scale sits within ~1 ulp of an
        # integer, cv2's table construction snaps inconsistently (probed
        # 18->66 dx=55 vs 45->50 dx=30: the two cases demand OPPOSITE
        # roundings, and the latter samples outside its own area cell),
        # so ONE row/column may sample the adjacent source line there
        # (~3 % of random size pairs).  docs/PARITY.md.
        i = np.floor(np.arange(on) * scale).astype(np.int64)
        f = (((np.arange(on) + 1) - (i + 1) * (on / n))).astype(np.float32)
        f = np.where(f <= 0, np.float32(0), f - np.floor(f)).astype(np.float32)
    else:
        f = ((np.arange(on) + 0.5) * scale - 0.5).astype(np.float32)
        i = np.floor(f.astype(np.float64)).astype(np.int64)
        f = (f - i).astype(np.float32)
    i0 = np.clip(i, 0, n - 1)
    i1 = np.clip(i + 1, 0, n - 1)
    return i0, i1, f


def _resize_linear_u8(img, oh, ow, area=False):
    """cv2's u8 bilinear: 2^11 fixed-point horizontal at full int
    precision, then the SIMD vertical stage ``((S>>4)*b) >> 16`` per
    row and ``(t0+t1+2)>>2`` — pinned bit-exact (0/111069 px over a
    129-case corpus; the truncating mul-high makes the vertical pass
    NONLINEAR in (S0, S1), so no scalar-rounding model can match)."""
    H, W = img.shape
    iy0, iy1, ry = resize_lin_tables(H, oh, area)
    ix0, ix1, rx = resize_lin_tables(W, ow, area)
    cx1 = _RESIZE_SCALE - np.round(rx.astype(np.float64) * _RESIZE_SCALE).astype(np.int64)
    cx2 = _RESIZE_SCALE - cx1
    cy1 = _RESIZE_SCALE - np.round(ry.astype(np.float64) * _RESIZE_SCALE).astype(np.int64)
    cy2 = _RESIZE_SCALE - cy1
    a = img.astype(np.int64)
    sh = a[:, ix0] * cx1 + a[:, ix1] * cx2          # (H, ow), scale 2^11
    x0, x1 = sh[iy0] >> 4, sh[iy1] >> 4             # int16 range, scale 2^7
    t = ((x0 * cy1[:, None]) >> 16) + ((x1 * cy2[:, None]) >> 16)
    return np.clip((t + 2) >> 2, 0, 255).astype(np.uint8)


def _resize_linear_float(img, oh, ow, area=False):
    """cv2's float linear path (u16/i16/f32 sources): f32 coefficients
    ``(1-r, r)``, f32 accumulation ``v0*c0 + v1*c1`` per axis."""
    H, W = img.shape
    iy0, iy1, ry = resize_lin_tables(H, oh, area)
    ix0, ix1, rx = resize_lin_tables(W, ow, area)
    a = img.astype(np.float32)
    one = np.float32(1)
    h0 = (a[:, ix0] * (one - rx) + a[:, ix1] * rx).astype(np.float32)
    v = (h0[iy0] * (one - ry)[:, None] + h0[iy1] * ry[:, None]).astype(np.float32)
    return v


def resize(img: np.ndarray, dsize, interpolation: str = "linear") -> np.ndarray:
    """``cv2.resize(img, (ow, oh), interpolation=...)`` — NOTE ``dsize``
    here is ``(oh, ow)`` row-major like the rest of this library.

    * ``nearest``: ``min(floor(dx*scale), n-1)`` gather (f64), all
      dtypes.  Exact except when ``dx*scale`` sits within ~1 ulp of an
      integer: cv2's internal table snaps those NON-MONOTONICALLY (a
      dense (n, on) sweep proves no floor/round/ceil/fixed-point/DDA
      model reproduces it — e.g. 36->44 keeps the exact hit at dy=11
      but drops it at dy=33), so there one output row/column picks the
      adjacent source line (~3 % of random size pairs, never more than
      one source pixel away).
    * ``linear``: u8 bit-exact (see ``_resize_linear_u8``); u16/i16
      follow cv2's f32 path within the documented ±1 (build-dependent
      SIMD/FMA splits); float32 at 1-ULP.
    * ``area``: integer-factor downscale is ``cvRound(sum·f32(1/area))``
      (half-even on the f32 product) EXCEPT the 2x2 fast path which is
      ``(sum+2)>>2`` (half-up — cv2's ``v_rshr_pack`` SIMD, pinned
      0/100 vs 30/400 for half-even); non-integer downscale uses f32
      area weights (±1 on rare boundary pixels); any upscale axis
      switches to the bilinear machinery with AREA coordinates.
    """
    kind = _img_kind(img, allow_i16=True)
    oh, ow = int(dsize[0]), int(dsize[1])
    if oh < 1 or ow < 1:
        raise ValueError(f"invalid output size {(oh, ow)}")
    H, W = img.shape
    if interpolation == "cubic":
        return resize_cubic(img, (oh, ow))
    if interpolation == "lanczos4":
        return resize_lanczos(img, (oh, ow))
    if interpolation == "nearest":
        ys = np.minimum((np.arange(oh) * (H / oh)).astype(np.int64), H - 1)
        xs = np.minimum((np.arange(ow) * (W / ow)).astype(np.int64), W - 1)
        return img[np.ix_(ys, xs)]
    if interpolation == "linear":
        if kind == "u8":
            return _resize_linear_u8(img, oh, ow)
        v = _resize_linear_float(img, oh, ow)
        if kind == "f32":
            return v
        lo, hi = _int_minval(kind), _int_maxval(kind)
        return np.clip(np.round(v.astype(np.float64)), lo, hi).astype(img.dtype)
    if interpolation == "area":
        if H % oh == 0 and W % ow == 0 and H >= oh and W >= ow:
            f1, f2 = H // oh, W // ow
            s = img.reshape(oh, f1, ow, f2).astype(np.float64).sum((1, 3))
            if kind == "f32":
                return (s.astype(np.float32) * np.float32(1.0 / (f1 * f2))).astype(np.float32)
            lo, hi = _int_minval(kind), _int_maxval(kind)
            si = s.astype(np.int64)
            if (f1, f2) == (2, 2):
                out = (si + 2) >> 2
            else:
                out = np.round(si.astype(np.float32) * np.float32(1.0 / (f1 * f2)))
            return np.clip(out, lo, hi).astype(img.dtype)
        if H >= oh and W >= ow:
            sy, sx = H / oh, W / ow
            cell = np.float32(1.0 / (sy * sx))
            out = np.zeros((oh, ow), np.float64)
            for dy in range(oh):
                y0, y1 = dy * sy, min((dy + 1) * sy, H)
                ys = np.arange(int(np.floor(y0)), min(int(np.ceil(y1)), H))
                wy = np.minimum(ys + 1, y1) - np.maximum(ys, y0)
                for dx in range(ow):
                    x0, x1 = dx * sx, min((dx + 1) * sx, W)
                    xs = np.arange(int(np.floor(x0)), min(int(np.ceil(x1)), W))
                    wx = np.minimum(xs + 1, x1) - np.maximum(xs, x0)
                    out[dy, dx] = (img[np.ix_(ys, xs)].astype(np.float64)
                                   * np.outer(wy, wx)).sum() * cell
            if kind == "f32":
                return out.astype(np.float32)
            lo, hi = _int_minval(kind), _int_maxval(kind)
            return np.clip(np.round(out), lo, hi).astype(img.dtype)
        # at least one upscale axis: bilinear machinery with AREA coords
        if kind == "u8":
            return _resize_linear_u8(img, oh, ow, area=True)
        v = _resize_linear_float(img, oh, ow, area=True)
        if kind == "f32":
            return v
        lo, hi = _int_minval(kind), _int_maxval(kind)
        return np.clip(np.round(v.astype(np.float64)), lo, hi).astype(img.dtype)
    raise ValueError(f"unknown interpolation {interpolation!r}")


_CUBIC_A = -0.75  # cv2's bicubic sharpness constant


def cubic_weights(t: float) -> np.ndarray:
    """cv2's 4-tap bicubic weights at fraction ``t`` (A = -0.75), in
    cv2's own evaluation order (w3 closes the partition of unity)."""
    A = _CUBIC_A
    w = np.empty(4)
    w[0] = ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A
    w[1] = ((A + 2) * t - (A + 3)) * t * t + 1
    w[2] = ((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1
    w[3] = 1.0 - w[0] - w[1] - w[2]
    return w


def resize_cubic_tables(n: int, on: int):
    """Per-axis bicubic tables ``(idx[on,4], frac[on])`` — center-aligned
    f32 coordinates (same convention as linear), indices clamped
    (border replicate)."""
    f = ((np.arange(on) + 0.5) * (n / on) - 0.5).astype(np.float32)
    i = np.floor(f.astype(np.float64)).astype(np.int64)
    r = (f - i).astype(np.float32)
    idx = np.clip(i[:, None] + np.arange(-1, 3)[None, :], 0, n - 1)
    return idx, r


_L4_S45 = 0.70710678118654752440084436210485
_L4_CS = ((1, 0), (-_L4_S45, -_L4_S45), (0, 1), (_L4_S45, -_L4_S45),
          (-1, 0), (_L4_S45, _L4_S45), (0, -1), (-_L4_S45, _L4_S45))


def lanczos4_weights(t: float) -> np.ndarray:
    """cv2's 8-tap Lanczos-4 weights at fraction ``t`` — the
    angle-addition table form: ``w_i = (cs_i0·sin(y0) + cs_i1·cos(y0))
    / y_i²`` with ``y_i = −(t+3−i)·π/4``, each cast f32, then
    normalized by the f32 running sum (pinned; t below f32 eps snaps to
    the exact center tap)."""
    f32 = np.float32
    if t < np.finfo(np.float32).eps:
        w = np.zeros(8, f32)
        w[3] = 1
        return w
    y0 = -(t + 3) * np.pi * 0.25
    s0, c0 = np.sin(y0), np.cos(y0)
    co = np.empty(8, f32)
    for i in range(8):
        y = -(t + 3 - i) * np.pi * 0.25
        co[i] = f32((_L4_CS[i][0] * s0 + _L4_CS[i][1] * c0) / (y * y))
    ssum = f32(0.0)
    for i in range(8):
        ssum = f32(ssum + co[i])
    return (co * f32(f32(1.0) / ssum)).astype(f32)


def resize_lanczos_tables(n: int, on: int):
    """Per-axis Lanczos-4 tables ``(idx[on,8], frac[on])`` —
    center-aligned f32 coordinates, indices clamped (replicate)."""
    f = ((np.arange(on) + 0.5) * (n / on) - 0.5).astype(np.float32)
    i = np.floor(f.astype(np.float64)).astype(np.int64)
    r = (f - i).astype(np.float32)
    idx = np.clip(i[:, None] + np.arange(-3, 5)[None, :], 0, n - 1)
    return idx, r


def resize_lanczos(img: np.ndarray, dsize) -> np.ndarray:
    """``cv2.resize(..., INTER_LANCZOS4)`` — ``dsize`` is (oh, ow).

    u8: 2^11 fixed-point taps (``round(w·2048)``), full integer
    accumulation both axes, one ``(v + 2^21) >> 22`` — BIT-EXACT
    (0/85 fuzz incl. adversarial checkerboards; unlike bicubic, cv2's
    u8 Lanczos vertical agrees with the exact integer sum everywhere
    tested).  u16/i16: cv2's f32 path — ±1 on rare accumulation-order
    ties at full range (the same build-dependent class as u16 linear;
    low-range data is exact).  f32: few-ulp (≤5e-7 on [0,1] data)."""
    kind = _img_kind(img, allow_i16=True)
    oh, ow = int(dsize[0]), int(dsize[1])
    if oh < 1 or ow < 1:
        raise ValueError(f"invalid output size {(oh, ow)}")
    H, W = img.shape
    xi, rx = resize_lanczos_tables(W, ow)
    yi, ry = resize_lanczos_tables(H, oh)
    if kind == "u8":
        xc = np.stack([np.round(lanczos4_weights(float(t)).astype(np.float64)
                                * 2048).astype(np.int64) for t in rx])
        yc = np.stack([np.round(lanczos4_weights(float(t)).astype(np.float64)
                                * 2048).astype(np.int64) for t in ry])
        a = img.astype(np.int64)
        S = np.zeros((H, ow), np.int64)
        for k in range(8):
            S += a[:, xi[:, k]] * xc[:, k]              # scale 2^11
        v = np.zeros((oh, ow), np.int64)
        for k in range(8):
            v += yc[:, k][:, None] * S[yi[:, k]]        # scale 2^22
        return np.clip((v + (1 << 21)) >> 22, 0, 255).astype(np.uint8)
    xc = np.stack([lanczos4_weights(float(t)) for t in rx]).astype(np.float32)
    yc = np.stack([lanczos4_weights(float(t)) for t in ry]).astype(np.float32)
    a = img.astype(np.float32)
    S = np.zeros((H, ow), np.float32)
    for k in range(8):
        S = (S + a[:, xi[:, k]] * xc[:, k]).astype(np.float32)
    v = np.zeros((oh, ow), np.float32)
    for k in range(8):
        v = (v + yc[:, k][:, None] * S[yi[:, k]]).astype(np.float32)
    if kind == "f32":
        return v
    lo, hi = _int_minval(kind), _int_maxval(kind)
    return np.clip(np.round(v.astype(np.float64)), lo, hi).astype(img.dtype)


def resize_cubic(img: np.ndarray, dsize) -> np.ndarray:
    """``cv2.resize(..., INTER_CUBIC)`` — ``dsize`` is (oh, ow).

    u8: 2^11 fixed-point taps (``cvRound(w·2048)``), full-precision
    integer accumulation both axes, single ``(v + 2^21) >> 22`` cast.
    cv2's u8 vertical stage runs in f32 with build-dependent lane order
    (no accumulation-order variant matches a fuzz sweep exactly), so
    the budget vs cv2 is ±1 on ~3 % of pixels — same class as the u16
    linear path.  u16/i16: f32 weights/accumulation, ±1; f32: 1-ulp.
    """
    kind = _img_kind(img, allow_i16=True)
    oh, ow = int(dsize[0]), int(dsize[1])
    if oh < 1 or ow < 1:
        raise ValueError(f"invalid output size {(oh, ow)}")
    H, W = img.shape
    xi, rx = resize_cubic_tables(W, ow)
    yi, ry = resize_cubic_tables(H, oh)
    if kind == "u8":
        xc = np.stack([np.round(cubic_weights(float(t)) * 2048).astype(np.int64)
                       for t in rx])
        yc = np.stack([np.round(cubic_weights(float(t)) * 2048).astype(np.int64)
                       for t in ry])
        a = img.astype(np.int64)
        S = np.zeros((H, ow), np.int64)
        for k in range(4):
            S += a[:, xi[:, k]] * xc[:, k]              # scale 2^11
        v = np.zeros((oh, ow), np.int64)
        for k in range(4):
            v += yc[:, k][:, None] * S[yi[:, k]]        # scale 2^22
        return np.clip((v + (1 << 21)) >> 22, 0, 255).astype(np.uint8)
    xc = np.stack([cubic_weights(float(t)) for t in rx]).astype(np.float32)
    yc = np.stack([cubic_weights(float(t)) for t in ry]).astype(np.float32)
    a = img.astype(np.float32)
    S = np.zeros((H, ow), np.float32)
    for k in range(4):
        S = (S + a[:, xi[:, k]] * xc[:, k]).astype(np.float32)
    v = np.zeros((oh, ow), np.float32)
    for k in range(4):
        v = (v + yc[:, k][:, None] * S[yi[:, k]]).astype(np.float32)
    if kind == "f32":
        return v
    lo, hi = _int_minval(kind), _int_maxval(kind)
    return np.clip(np.round(v.astype(np.float64)), lo, hi).astype(img.dtype)


def flip(img: np.ndarray, code: int = 0) -> np.ndarray:
    """``cv2.flip``: 0 = vertical (rows), 1/positive = horizontal
    (cols), negative = both.  Pure index reversal — exact, any dtype."""
    if code == 0:
        return img[::-1].copy()
    if code > 0:
        return img[:, ::-1].copy()
    return img[::-1, ::-1].copy()


def transpose(img: np.ndarray) -> np.ndarray:
    """``cv2.transpose`` — exact, any dtype."""
    return img.T.copy()


def rotate(img: np.ndarray, code: str = "90cw") -> np.ndarray:
    """``cv2.rotate``: ``90cw`` | ``180`` | ``90ccw`` (pinned against
    cv2.ROTATE_* on probe grids) — exact, any dtype."""
    if code == "90cw":
        return img.T[:, ::-1].copy()
    if code == "180":
        return img[::-1, ::-1].copy()
    if code == "90ccw":
        return img.T[::-1].copy()
    raise ValueError(f"unknown rotation {code!r} (90cw|180|90ccw)")


# ---------------------------------------------------------------------------
# affine warps (cv2.warpAffine + helpers)
# ---------------------------------------------------------------------------

_WARP_AB_BITS = 10          # cv2 AB_BITS (coordinate fixed point, i16 path)
_WARP_INTER_BITS = 5        # cv2 INTER_BITS (32 subpixel positions)
_WARP_REMAP_BITS = 15       # cv2 INTER_REMAP_COEF_BITS (tab scale)


def invert_affine(M: np.ndarray) -> np.ndarray:
    """``cv2.invertAffineTransform`` (f64, exact formula)."""
    M = np.asarray(M, np.float64).reshape(2, 3)
    d = M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
    d = 1.0 / d if d != 0 else 0.0
    out = np.empty((2, 3))
    out[0, 0] = M[1, 1] * d
    out[0, 1] = -M[0, 1] * d
    out[1, 0] = -M[1, 0] * d
    out[1, 1] = M[0, 0] * d
    out[0, 2] = -out[0, 0] * M[0, 2] - out[0, 1] * M[1, 2]
    out[1, 2] = -out[1, 0] * M[0, 2] - out[1, 1] * M[1, 2]
    return out


def get_rotation_matrix_2d(center, angle_deg: float, scale: float = 1.0) -> np.ndarray:
    """``cv2.getRotationMatrix2D`` (f64; center is (cx, cy) like cv2)."""
    a = np.deg2rad(angle_deg)
    al, be = scale * np.cos(a), scale * np.sin(a)
    cx, cy = float(center[0]), float(center[1])
    return np.array([[al, be, (1 - al) * cx - be * cy],
                     [-be, al, be * cx + (1 - al) * cy]])


def _fma32(a, b, c) -> np.ndarray:
    """Single-rounded f32 FMA ``RN_f32(a*b + c)`` (exact: the f64 product
    of two f32 values is exact, the add rounds once in f64, and the final
    f32 cast is the single rounding — ties are >29 bits away)."""
    return (np.asarray(a, np.float64) * np.asarray(b, np.float64)
            + np.asarray(c, np.float64)).astype(np.float32)


def _bilinear_f32_fma(p00, p01, p10, p11, tx, ty) -> np.ndarray:
    """cv2 5.0's float bilinear kernel: lerp the two rows then the
    columns, each step ``fma(t, hi - lo, lo)`` with a single f32 FMA
    (pinned by probe — 133.5-exact razor ties reproduce only under this
    order; 0/6000 u8 + 0/3000 u16/f32 fuzz vs cv2)."""
    top = _fma32(tx, p01 - p00, p00)
    bot = _fma32(tx, p11 - p10, p10)
    return _fma32(ty, bot - top, top)


def _bilinear_tab_f32_seq(sample, iy, ix, fx, fy) -> np.ndarray:
    """cv2's legacy 16S bilinear: FLOAT tab weights from the 1/32
    fraction, sequential f32 accumulation (pinned 0/3000 fuzz; the
    pairwise order is ±1 on ~1 % of configs)."""
    one = np.float32(1)
    w0 = (one - fx) * (one - fy)
    w1 = fx * (one - fy)
    w2 = (one - fx) * fy
    w3 = fx * fy
    acc = sample(iy, ix) * w0 + sample(iy, ix + 1) * w1
    acc = acc + sample(iy + 1, ix) * w2
    return acc + sample(iy + 1, ix + 1) * w3


_WARP_TAB_CACHE = None


def warp_tab_int() -> np.ndarray:
    """cv2's 32x32 bilinear remap tab at 2^15 (initInterTab2D): weights
    rounded independently, then the sum fixed to exactly 2^15 by
    adjusting the max element (deficit) or min element (excess).
    Memoized — the Python build loop is 1024 iterations."""
    global _WARP_TAB_CACHE
    if _WARP_TAB_CACHE is not None:
        return _WARP_TAB_CACHE
    S = 1 << _WARP_REMAP_BITS
    T = 1 << _WARP_INTER_BITS
    tab = np.zeros((T, T, 2, 2), np.int64)
    for ty in range(T):
        for tx in range(T):
            vy, vx = ty / T, tx / T
            w = np.array([[(1 - vy) * (1 - vx), (1 - vy) * vx],
                          [vy * (1 - vx), vy * vx]])
            iw = np.round(w * S).astype(np.int64)
            diff = int(iw.sum() - S)
            if diff:
                mx = np.unravel_index(w.argmax(), (2, 2))
                mn = np.unravel_index(w.argmin(), (2, 2))
                iw[mx if diff < 0 else mn] -= diff
            tab[ty, tx] = iw
    _WARP_TAB_CACHE = tab
    return tab


def warp_affine_coords_int(Mi: np.ndarray, oh: int, ow: int):
    """cv2's fixed-point dst→src coordinate tables for the i16 path:
    ``X = (round(Mi01·y + Mi02)·2^10 + 2^4 + round(Mi00·x·2^10)) >> 5``
    at scale 2^5 (adelta per column, X0 per row)."""
    AB = 1 << _WARP_AB_BITS
    RD = 1 << (_WARP_AB_BITS - _WARP_INTER_BITS - 1)
    adelta = np.round(Mi[0, 0] * np.arange(ow) * AB).astype(np.int64)
    bdelta = np.round(Mi[1, 0] * np.arange(ow) * AB).astype(np.int64)
    X0 = (np.round((Mi[0, 1] * np.arange(oh) + Mi[0, 2]) * AB).astype(np.int64) + RD)
    Y0 = (np.round((Mi[1, 1] * np.arange(oh) + Mi[1, 2]) * AB).astype(np.int64) + RD)
    X = (X0[:, None] + adelta[None, :]) >> (_WARP_AB_BITS - _WARP_INTER_BITS)
    Y = (Y0[:, None] + bdelta[None, :]) >> (_WARP_AB_BITS - _WARP_INTER_BITS)
    return X, Y


def warp_affine_nn_coords_int(Mi: np.ndarray, oh: int, ow: int):
    """cv2's i16 NEAREST coordinate maps: AB fixed point rounded at
    scale 2^10 (shared by the oracle and the device op)."""
    AB = 1 << _WARP_AB_BITS
    ad = np.round(Mi[0, 0] * np.arange(ow) * AB).astype(np.int64)
    bd = np.round(Mi[1, 0] * np.arange(ow) * AB).astype(np.int64)
    X0 = np.round((Mi[0, 1] * np.arange(oh) + Mi[0, 2]) * AB).astype(np.int64)
    Y0 = np.round((Mi[1, 1] * np.arange(oh) + Mi[1, 2]) * AB).astype(np.int64)
    ix = (X0[:, None] + ad[None, :] + (AB >> 1)) >> _WARP_AB_BITS
    iy = (Y0[:, None] + bd[None, :] + (AB >> 1)) >> _WARP_AB_BITS
    return iy, ix


def warp_affine_coords_f32(Mi: np.ndarray, oh: int, ow: int):
    """cv2 5.0's f32 destination->source coordinate field for the float
    warp path, pinned EXACTLY (ramp-image coordinate extraction, then
    0/2500-per-dtype end-to-end fuzz):

    * SIMD body (columns ``x < ow - ow % 16``):
      ``s = fma(a, x, f32(b·y + c))`` — one FMA onto a per-row constant
      that was itself computed mul-then-add in f32.
    * scalar tail (the last ``ow % 16`` columns):
      ``s = f32(fma(a, x, f32(b·y)) + c)`` — the FMA runs onto the bare
      y-term and the constant is added after.

    Returns ``(sx, sy)`` f32 ``(oh, ow)`` maps."""
    Mi = np.asarray(Mi, np.float64)
    Mf = Mi.astype(np.float32)
    ys = np.arange(oh, dtype=np.float32)[:, None]
    xs = np.arange(ow, dtype=np.float32)[None, :]
    body = (np.arange(ow) < ow - (ow % 16))[None, :]
    out = []
    for r in (0, 1):
        a, b, c = Mf[r]
        crow = (b * ys + c).astype(np.float32)
        sb = _fma32(a, xs, crow)
        st = (_fma32(a, xs, (b * ys).astype(np.float32)) + c).astype(np.float32)
        out.append(np.where(body, sb, st).astype(np.float32))
    return out[0], out[1]


def warp_affine(img: np.ndarray, M, dsize, interpolation: str = "linear",
                border: str = "constant", border_value: float = 0.0,
                inverse_map: bool = False) -> np.ndarray:
    """``cv2.warpAffine(img, M, (ow, oh), ...)`` — ``dsize`` is (oh, ow).

    Pinned BIT-EXACT per dtype (deterministic fuzz, 2000-2500 configs
    each): u8/u16/f32 LINEAR = the f32 hybrid coordinate field
    (``warp_affine_coords_f32``) + the FMA row-column lerp
    (``_bilinear_f32_fma``); NEAREST (u8/u16/f32) = cvRound of the same
    f32 coords (the old f64-coord model was ±1 on 2/2000); int16 LINEAR
    = cv2's legacy fixed-point coords (AB_BITS=10, 1/32 subpixel) with
    FLOAT tab weights and sequential f32 accumulation
    (``_bilinear_tab_f32_seq``, 0/2000 — the int-tab 2^15 model was
    ±1); int16 NEAREST = the AB fixed-point rounding.
    ``border``: ``constant`` (with ``border_value``) or ``replicate``.
    """
    kind = _img_kind(img, allow_i16=True)
    oh, ow = int(dsize[0]), int(dsize[1])
    if oh < 1 or ow < 1:
        raise ValueError(f"invalid output size {(oh, ow)}")
    if border not in ("constant", "replicate"):
        raise ValueError(f"unknown border {border!r} (constant|replicate)")
    H, W = img.shape
    Mi = np.asarray(M, np.float64).reshape(2, 3) if inverse_map else invert_affine(M)
    lo, hi = (None, None) if kind == "f32" else (_int_minval(kind), _int_maxval(kind))
    # cv2 saturates borderValue into the image dtype BEFORE blending
    # (the constant-border buffer is stored at the work type)
    fill = (float(border_value) if kind == "f32"
            else float(np.clip(np.round(float(border_value)), lo, hi)))

    def sample(iy, ix):
        inside = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        v = img[np.clip(iy, 0, H - 1), np.clip(ix, 0, W - 1)].astype(np.float32)
        if border == "constant":
            v = np.where(inside, v, np.float32(fill))
        return v

    if interpolation == "nearest":
        if kind == "i16":
            # i16 keeps cv2's AB fixed-point maps: round at scale 2^10
            # (40/40 fuzz; the f64-round model fails 8/60)
            iy, ix = warp_affine_nn_coords_int(Mi, oh, ow)
            v = sample(iy, ix)
            return np.clip(np.round(v.astype(np.float64)), lo, hi).astype(img.dtype)
        sx, sy = warp_affine_coords_f32(Mi, oh, ow)
        v = sample(np.rint(sy).astype(np.int64), np.rint(sx).astype(np.int64))
        if kind == "f32":
            return v.astype(np.float32)
        return np.clip(np.round(v.astype(np.float64)), lo, hi).astype(img.dtype)
    if interpolation == "cubic":
        sx, sy = warp_affine_coords_cubic_f32(Mi, oh, ow)
        acc = _warp_cubic_sample(img, sx, sy, border, fill)
        if kind == "f32":
            return acc
        return np.clip(np.rint(acc.astype(np.float64)), lo, hi).astype(img.dtype)
    if interpolation == "lanczos4":
        # the legacy quantized path (cv2 5.0's new kernels cover
        # linear/cubic only): AB fixed-point coords at 1/32 subpixels
        X, Y = warp_affine_coords_int(Mi, oh, ow)
        return _warp_lanczos4_sample(img, X, Y, border, fill)
    if interpolation != "linear":
        raise ValueError(f"unknown interpolation {interpolation!r} "
                         "(nearest|linear|cubic|lanczos4)")
    if kind == "i16":
        X, Y = warp_affine_coords_int(Mi, oh, ow)
        T = (1 << _WARP_INTER_BITS) - 1
        ix, iy = X >> _WARP_INTER_BITS, Y >> _WARP_INTER_BITS
        fx = (X & T).astype(np.float32) / np.float32(32)
        fy = (Y & T).astype(np.float32) / np.float32(32)
        acc = _bilinear_tab_f32_seq(sample, iy, ix, fx, fy)
        return np.clip(np.rint(acc), lo, hi).astype(img.dtype)
    sx, sy = warp_affine_coords_f32(Mi, oh, ow)
    ixf, iyf = np.floor(sx), np.floor(sy)
    ix, iy = ixf.astype(np.int64), iyf.astype(np.int64)
    tx = (sx - ixf).astype(np.float32)
    ty = (sy - iyf).astype(np.float32)
    acc = _bilinear_f32_fma(sample(iy, ix), sample(iy, ix + 1),
                            sample(iy + 1, ix), sample(iy + 1, ix + 1), tx, ty)
    if kind == "f32":
        return acc
    return np.clip(np.rint(acc), lo, hi).astype(img.dtype)




def _cubic_w_keys_f32(t):
    """cv2 5.0's NEW warp-kernel bicubic weights (warpAffine /
    warpPerspective INTER_CUBIC; A=-0.75) — pinned bitwise by translation
    probes (400/400 exact (t, weight-vector) samples): the FACTORED
    forms with a single-rounded FMA, NOT the legacy Horner of
    ``_cubic_w_f32`` (remap's float-map path keeps the old law):

    * u = 1-t, tt = t*t, uu = u*u (each one f32 rounding)
    * w0 = A*(t*uu)               (two roundings, right-assoc)
    * w1 = fma(tt, fma(t, A+2, -(A+3)), 1)
    * w3 = A*(u*tt)
    * w2 = ((1 - w0) - w1) - w3   (sequential closure)
    """
    f32 = np.float32
    A = f32(_CUBIC_A)
    A2, A3 = A + f32(2), A + f32(3)
    t = t.astype(f32)
    u = (f32(1) - t).astype(f32)
    tt = (t * t).astype(f32)
    uu = (u * u).astype(f32)
    w0 = (A * (t * uu)).astype(f32)
    w1 = _fma32(tt, _fma32(t, A2, -A3), f32(1))
    w3 = (A * (u * tt)).astype(f32)
    w2 = (((f32(1) - w0).astype(f32) - w1).astype(f32) - w3).astype(f32)
    return [w0, w1, w2, w3]


def _warp_cubic_sample(img, sx, sy, border, fill):
    """cv2 5.0's new warp INTER_CUBIC sampler at f32 coordinate fields:
    floor coords, f32 fractions, ``_cubic_w_keys_f32`` weights, then the
    fma row chains pinned bitwise on every all-taps-inside and partial
    border pixel (0/312k body + 0/9.4k partial, both border modes):
    ``row = fma(wx_b, v, row)`` inner, ``acc = fma(wy_a, row, acc)``
    outer.  Fully-outside pixels go through cv2's block fill paths whose
    arithmetic is SIMD-layout-dependent — they land within 1 ulp (f32)
    and are bit-exact after integer rounding (u8/u16 0 LSB measured).
    Returns the f32 accumulator (caller rounds/saturates)."""
    f32 = np.float32
    H, W = img.shape
    ixm = np.floor(sx).astype(np.int64)
    iym = np.floor(sy).astype(np.int64)
    tx = (sx - ixm).astype(f32)
    ty = (sy - iym).astype(f32)
    wx = _cubic_w_keys_f32(tx)
    wy = _cubic_w_keys_f32(ty)

    def samp(a, b):
        yy, xx = iym + a - 1, ixm + b - 1
        v = img[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)].astype(f32)
        if border == "constant":
            inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            v = np.where(inside, v, f32(fill)).astype(f32)
        return v

    acc = None
    for a in range(4):
        r = (wx[0] * samp(a, 0)).astype(f32)
        for b in range(1, 4):
            r = _fma32(wx[b], samp(a, b), r)
        acc = (wy[a] * r).astype(f32) if acc is None else _fma32(wy[a], r, acc)
    return acc


def warp_affine_coords_cubic_f32(Mi: np.ndarray, oh: int, ow: int):
    """cv2 5.0's new warp-kernel coordinate field (INTER_CUBIC path) —
    plain f32 row-constant law, NO fma and NO SIMD body/tail split
    (unlike the linear path's hybrid ``warp_affine_coords_f32``):
    ``s = f32(f32(a*x) + f32(f32(b*y) + c))``.  Pinned bitwise through
    the end-to-end cubic kernel (0 mismatches on all interior pixels
    over 30 random warps x 2 border modes)."""
    f32 = np.float32
    Mf = np.asarray(Mi, np.float64).astype(f32)
    xs = np.arange(ow, dtype=f32)
    ys = np.arange(oh, dtype=f32)
    out = []
    for r in (0, 1):
        a, b, c = Mf[r]
        rc = ((b * ys).astype(f32) + c).astype(f32)
        s = ((a * xs)[None, :].astype(f32) + rc[:, None]).astype(f32)
        out.append(np.clip(s, -2e9, 2e9))
    return out[0], out[1]


def warp_perspective_coords_cubic_f32(Mi: np.ndarray, oh: int, ow: int):
    """cv2 5.0's new warp-kernel perspective coordinates (INTER_CUBIC):
    numerators/denominator via ``fma(m0, x, f32(f32(m1*y) + m2))`` and
    an f32 division.  cv2's own division is a SIMD reciprocal +
    Newton refinement (hardware-dependent, like log32f) — the IEEE f32
    divide here lands within ~3 coordinate ulps, giving the measured
    budgets: u8 +-1 on ~0.01% px, u16/i16 +-1 on ~1.5% px, f32 <=6e-3
    absolute at 655-scale (~1e-5 relative)."""
    f32 = np.float32
    Mf = np.asarray(Mi, np.float64).reshape(3, 3).astype(f32)
    xs = np.arange(ow, dtype=f32)
    ys = np.arange(oh, dtype=f32)
    planes = []
    for r in range(3):
        a, b, c = Mf[r]
        rc = ((b * ys).astype(f32) + c).astype(f32)
        planes.append(_fma32(xs[None, :], a, rc[:, None] * np.ones((1, ow), f32)))
    nx, ny, dd = planes
    with np.errstate(divide="ignore", invalid="ignore"):
        sx = np.nan_to_num((nx / dd).astype(f32))
        sy = np.nan_to_num((ny / dd).astype(f32))
    return np.clip(sx, -2e9, 2e9), np.clip(sy, -2e9, 2e9)




def invert_perspective(M: np.ndarray) -> np.ndarray:
    """cv2's 3x3 inversion as used by ``warpPerspective`` (f64 cofactor
    expansion; singular -> zeros like cv2's ``invert`` failure path)."""
    M = np.asarray(M, np.float64).reshape(3, 3)
    d = (M[0, 0] * (M[1, 1] * M[2, 2] - M[1, 2] * M[2, 1])
         - M[0, 1] * (M[1, 0] * M[2, 2] - M[1, 2] * M[2, 0])
         + M[0, 2] * (M[1, 0] * M[2, 1] - M[1, 1] * M[2, 0]))
    d = 1.0 / d if d != 0 else 0.0
    A = np.empty((3, 3))
    A[0, 0] = (M[1, 1] * M[2, 2] - M[1, 2] * M[2, 1]) * d
    A[0, 1] = -(M[0, 1] * M[2, 2] - M[0, 2] * M[2, 1]) * d
    A[0, 2] = (M[0, 1] * M[1, 2] - M[0, 2] * M[1, 1]) * d
    A[1, 0] = -(M[1, 0] * M[2, 2] - M[1, 2] * M[2, 0]) * d
    A[1, 1] = (M[0, 0] * M[2, 2] - M[0, 2] * M[2, 0]) * d
    A[1, 2] = -(M[0, 0] * M[1, 2] - M[0, 2] * M[1, 0]) * d
    A[2, 0] = (M[1, 0] * M[2, 1] - M[1, 1] * M[2, 0]) * d
    A[2, 1] = -(M[0, 0] * M[2, 1] - M[0, 1] * M[2, 0]) * d
    A[2, 2] = (M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]) * d
    return A


_HAL_LU_EPS = np.finfo(np.float64).eps * 100  # DBL_EPSILON*100, probed exactly


def _hal_lu_solve(A: np.ndarray, b: np.ndarray, eps: float = _HAL_LU_EPS):
    """OpenCV's ``hal::LU64f`` in its exact scalar arithmetic order:
    partial pivot by |column max|, eliminate with ``alpha = A[j,i] *
    (-1/A[i,i])``, then back-substitution ``(b[i] - sum) / A[i,i]``.
    Returns ``None`` when a pivot's magnitude drops below ``eps`` —
    probed bitwise at ``DBL_EPSILON*100`` (the boundary bisected to
    2.220446e-14 on diagonal systems), cv2's failure path."""
    A = A.copy()
    b = b.copy()
    m = A.shape[0]
    for i in range(m):
        k = i
        for j in range(i + 1, m):
            if abs(A[j, i]) > abs(A[k, i]):
                k = j
        if abs(A[k, i]) < eps:
            return None
        if k != i:
            A[[i, k]] = A[[k, i]]
            b[[i, k]] = b[[k, i]]
        d = -1.0 / A[i, i]
        for j in range(i + 1, m):
            alpha = A[j, i] * d
            for k2 in range(i + 1, m):
                A[j, k2] += alpha * A[i, k2]
            b[j] += alpha * b[i]
    for i in range(m - 1, -1, -1):
        s = b[i]
        for k2 in range(i + 1, m):
            s -= A[i, k2] * b[k2]
        b[i] = s / A[i, i]
    return b


def get_perspective_transform(src, dst) -> np.ndarray:
    """``cv2.getPerspectiveTransform`` (4 point pairs -> 3x3).

    BIT-EXACT vs cv2 5.0 on every quad that takes the LU path — i.e.
    all normally-conditioned inputs (0/300 + 1999/2000 deterministic
    fuzz incl. 1e4-scale and negative coords; the single non-LU config
    was a degenerate near-collinear quad).  Pinned model (probe
    2026-08-17):

    * the system-matrix cross products ``-x*u``/``-y*u``/``-x*v``/
      ``-y*v`` are computed in FLOAT32 (``Point2f`` arithmetic rounds
      before the f64 widening) — this is why cv2's own matrix maps
      src->dst with residual ~1e-4 on ~100-scale quads and why no
      f64-product model can match it;
    * the 8x8 solve is a direct f64 ``hal::LU64f`` with pivot
      tolerance ``DBL_EPSILON*100`` (every ``solveMethod`` agrees to
      ~1e-13 — the construction dominates, there is no
      normal-equations/SVD variance on this path);
    * DEGENERATE inputs (LU pivot underflow, or an LU solution whose
      residual ``|Ah-b|_inf`` exceeds ~2^-27 — boundary cases sit
      exactly 1 ulp of the ~1e6 product scale apart, so the last bit
      is unpinnable) fall back to cv2 5.0's homogeneous rescue: the
      unit-Frobenius-norm null vector of the 8x9 DLT system.  We
      return the same structural object via ``numpy.linalg.svd``; on
      rank-deficient systems cv2's Jacobi SVD picks a different basis
      of the (multi-dimensional) null space, so the fallback matches
      in norm and residual, not bitwise."""
    src = np.asarray(src, np.float32).reshape(4, 2)
    dst = np.asarray(dst, np.float32).reshape(4, 2)
    A = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        A[i] = [x, y, 1, 0, 0, 0,
                np.float32(-x * u), np.float32(-y * u)]
        A[i + 4] = [0, 0, 0, x, y, 1,
                    np.float32(-x * v), np.float32(-y * v)]
        b[i], b[i + 4] = u, v
    h = _hal_lu_solve(A, b)
    if h is not None and np.abs(A @ h - b).max() <= 2.0 ** -27:
        return np.append(h, 1.0).reshape(3, 3)
    A9 = np.concatenate([A, -b[:, None]], axis=1)
    v9 = np.linalg.svd(A9)[2][-1]
    return v9.reshape(3, 3)


def get_affine_transform(src, dst) -> np.ndarray:
    """``cv2.getAffineTransform`` (3 point pairs -> 2x3).

    BIT-EXACT vs cv2 5.0 (0/500 deterministic fuzz): a direct f64
    ``hal::LU64f`` solve of the 6x6 system in cv2's exact scalar
    arithmetic order (``_hal_lu_solve``) — this system has no product
    entries, so unlike ``get_perspective_transform`` there is no f32
    rounding anywhere in its construction."""
    src = np.asarray(src, np.float64).reshape(3, 2)
    dst = np.asarray(dst, np.float64).reshape(3, 2)
    A = np.zeros((6, 6))
    b = np.zeros(6)
    for i in range(3):
        x, y = src[i]
        A[i] = [x, y, 1, 0, 0, 0]
        A[i + 3] = [0, 0, 0, x, y, 1]
        b[i], b[i + 3] = dst[i]
    h = _hal_lu_solve(A, b)
    if h is None:
        return np.zeros((2, 3))
    return h.reshape(2, 3)


def warp_perspective_coords_f32(Mi: np.ndarray, oh: int, ow: int):
    """cv2 5.0's f32 coordinate field for the float ``warpPerspective``
    path, pinned EXACTLY (ramp extraction + 800-config-per-dtype fuzz,
    all 0 LSB): the three linear forms (x-numerator, y-numerator,
    denominator) each use the SAME body/tail hybrid as ``warpAffine``
    (``warp_affine_coords_f32``), then one f32 division per axis; a zero
    denominator maps to coordinate 0 (cv2's guard)."""
    Mi = np.asarray(Mi, np.float64).reshape(3, 3)
    Mf = Mi.astype(np.float32)
    ys = np.arange(oh, dtype=np.float32)[:, None]
    xs = np.arange(ow, dtype=np.float32)[None, :]
    body = (np.arange(ow) < ow - (ow % 16))[None, :]
    chans = []
    for r in (0, 1, 2):
        a, b, c = Mf[r]
        sb = _fma32(a, xs, (b * ys + c).astype(np.float32))
        st = (_fma32(a, xs, (b * ys).astype(np.float32)) + c).astype(np.float32)
        chans.append(np.where(body, sb, st).astype(np.float32))
    nx, ny, den = chans
    with np.errstate(divide="ignore", invalid="ignore"):
        sx = np.where(den != 0, nx / den, np.float32(0)).astype(np.float32)
        sy = np.where(den != 0, ny / den, np.float32(0)).astype(np.float32)
    return sx, sy


def warp_perspective_coords_int(Mi: np.ndarray, oh: int, ow: int):
    """cv2's legacy 16S ``warpPerspective`` coordinates: per-pixel f64
    homography, ``W = 32/w`` (0 if w == 0), clamp, ``cvRound`` into the
    1/32 subpixel grid (0/800 fuzz for the downstream float-tab path)."""
    Mi = np.asarray(Mi, np.float64).reshape(3, 3)
    ys, xs = np.mgrid[0:oh, 0:ow]
    w = Mi[2, 0] * xs + Mi[2, 1] * ys + Mi[2, 2]
    lim = float(1 << 30)
    with np.errstate(divide="ignore", invalid="ignore"):
        Wt = np.where(w != 0, 32.0 / w, 0.0)
    X = np.rint(np.clip((Mi[0, 0] * xs + Mi[0, 1] * ys + Mi[0, 2]) * Wt,
                        -lim, lim)).astype(np.int64)
    Y = np.rint(np.clip((Mi[1, 0] * xs + Mi[1, 1] * ys + Mi[1, 2]) * Wt,
                        -lim, lim)).astype(np.int64)
    return X, Y


def warp_perspective_nn_coords_int(Mi: np.ndarray, oh: int, ow: int):
    """i16 NEAREST ``warpPerspective``: cvRound of the per-pixel f64
    homography coordinates (0/800 fuzz)."""
    Mi = np.asarray(Mi, np.float64).reshape(3, 3)
    ys, xs = np.mgrid[0:oh, 0:ow]
    w = Mi[2, 0] * xs + Mi[2, 1] * ys + Mi[2, 2]
    lim = float(1 << 30)
    with np.errstate(divide="ignore", invalid="ignore"):
        Wt = np.where(w != 0, 1.0 / w, 0.0)
    iy = np.rint(np.clip((Mi[1, 0] * xs + Mi[1, 1] * ys + Mi[1, 2]) * Wt,
                         -lim, lim)).astype(np.int64)
    ix = np.rint(np.clip((Mi[0, 0] * xs + Mi[0, 1] * ys + Mi[0, 2]) * Wt,
                         -lim, lim)).astype(np.int64)
    return iy, ix


def warp_perspective(img: np.ndarray, M, dsize, interpolation: str = "linear",
                     border: str = "constant", border_value: float = 0.0,
                     inverse_map: bool = False) -> np.ndarray:
    """``cv2.warpPerspective(img, M, (ow, oh), ...)`` — ``dsize`` is
    (oh, ow).  Pinned BIT-EXACT per dtype (800-config deterministic
    fuzz each, all 0 LSB): u8/u16/f32 use the hybrid-f32 perspective
    coordinate field (``warp_perspective_coords_f32``) with the same
    FMA lerp / cvRound-of-coords as ``warp_affine``; int16 uses the
    legacy per-pixel f64 quantized path with float tab weights and
    sequential f32 accumulation.  Matrix inversion is cv2's f64
    cofactor expansion (``invert_perspective``)."""
    kind = _img_kind(img, allow_i16=True)
    oh, ow = int(dsize[0]), int(dsize[1])
    if oh < 1 or ow < 1:
        raise ValueError(f"invalid output size {(oh, ow)}")
    if border not in ("constant", "replicate"):
        raise ValueError(f"unknown border {border!r} (constant|replicate)")
    if interpolation not in ("nearest", "linear", "cubic", "lanczos4"):
        raise ValueError(f"unknown interpolation {interpolation!r} "
                         "(nearest|linear|cubic|lanczos4)")
    H, W = img.shape
    Mi = (np.asarray(M, np.float64).reshape(3, 3) if inverse_map
          else invert_perspective(M))
    lo, hi = (None, None) if kind == "f32" else (_int_minval(kind), _int_maxval(kind))
    fill = (float(border_value) if kind == "f32"
            else float(np.clip(np.round(float(border_value)), lo, hi)))

    def sample(iy, ix):
        inside = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        v = img[np.clip(iy, 0, H - 1), np.clip(ix, 0, W - 1)].astype(np.float32)
        if border == "constant":
            v = np.where(inside, v, np.float32(fill))
        return v

    if interpolation == "cubic":
        # cv2 5.0's new cubic kernel runs the SAME f32 path for every
        # dtype (i16 included) — budgets in warp_perspective_coords_cubic_f32
        sx, sy = warp_perspective_coords_cubic_f32(Mi, oh, ow)
        acc = _warp_cubic_sample(img, sx, sy, border, fill)
        if kind == "f32":
            return acc
        return np.clip(np.rint(acc.astype(np.float64)), lo, hi).astype(img.dtype)
    if interpolation == "lanczos4":
        # legacy quantized path: per-pixel f64 homography rounded to
        # 1/32 subpixels (the i16-linear coords), shared lanczos tabs
        X, Y = warp_perspective_coords_int(Mi, oh, ow)
        return _warp_lanczos4_sample(img, X, Y, border, fill)
    if kind == "i16":
        if interpolation == "nearest":
            iy, ix = warp_perspective_nn_coords_int(Mi, oh, ow)
            v = sample(iy, ix)
            return np.clip(np.round(v.astype(np.float64)), lo, hi).astype(img.dtype)
        X, Y = warp_perspective_coords_int(Mi, oh, ow)
        T = (1 << _WARP_INTER_BITS) - 1
        ix, iy = X >> _WARP_INTER_BITS, Y >> _WARP_INTER_BITS
        fx = (X & T).astype(np.float32) / np.float32(32)
        fy = (Y & T).astype(np.float32) / np.float32(32)
        acc = _bilinear_tab_f32_seq(sample, iy, ix, fx, fy)
        return np.clip(np.rint(acc), lo, hi).astype(img.dtype)
    sx, sy = warp_perspective_coords_f32(Mi, oh, ow)
    if interpolation == "nearest":
        v = sample(np.rint(sy).astype(np.int64), np.rint(sx).astype(np.int64))
        if kind == "f32":
            return v.astype(np.float32)
        return np.clip(np.round(v.astype(np.float64)), lo, hi).astype(img.dtype)
    ixf, iyf = np.floor(sx), np.floor(sy)
    ix, iy = ixf.astype(np.int64), iyf.astype(np.int64)
    tx = (sx - ixf).astype(np.float32)
    ty = (sy - iyf).astype(np.float32)
    acc = _bilinear_f32_fma(sample(iy, ix), sample(iy, ix + 1),
                            sample(iy + 1, ix), sample(iy + 1, ix + 1), tx, ty)
    if kind == "f32":
        return acc
    return np.clip(np.rint(acc), lo, hi).astype(img.dtype)


# ---------------------------------------------------------------------------
# Canny edge detection (cv2.Canny)
# ---------------------------------------------------------------------------

_CANNY_TG22 = 13573          # round(tan(22.5deg) * 2^15), cv2's constant
_CANNY_SHIFT = 15


def _sobel_replicate(img: np.ndarray, dx: int, dy: int, ksize: int) -> np.ndarray:
    """Raw integer Sobel with BORDER_REPLICATE (Canny's internal call —
    cv2.Canny pads with replicate, NOT the default REFLECT_101)."""
    kx, ky = deriv_kernels(dx, dy, ksize)
    kxi = np.round(kx).astype(np.int64)
    kyi = np.round(ky).astype(np.int64)
    r = ksize // 2
    p = np.pad(img.astype(np.int64), r, mode="edge")
    t = sum(kyi[i] * p[i:i + img.shape[0]] for i in range(ksize))
    raw = sum(kxi[j] * t[:, j:j + img.shape[1]] for j in range(ksize))
    if ksize == 7:
        # cv2.Canny scales aperture-7 Sobel by 1/16 (and the thresholds
        # with it) so the gradients fit CV_16S; /16 is exact in binary,
        # the round is cvRound (half-even)
        raw = np.round(raw / 16.0)
    return np.clip(raw, -32768, 32767).astype(np.int64)


def canny(img: np.ndarray, threshold1: float, threshold2: float,
          aperture_size: int = 3, l2_gradient: bool = False) -> np.ndarray:
    """``cv2.Canny`` — pinned bit-exact (0/100 fuzz over L1/L2 ×
    aperture 3/5/7; uint8 input like cv2; aperture-7 gradients
    saturate to int16 like cv2's CV_16S Sobel).

    Pipeline: replicate-border Sobel (CV_16S), magnitude |dx|+|dy| (L1)
    or dx²+dy² (L2 — cv2 squares the thresholds; the int16-saturated
    gradients keep the square inside int32), cv2's fixed-point NMS
    (TG22 = 13573/2^15,
    strict/non-strict comparisons exactly as cv2 orders them, BOTH
    strict on the diagonal), then 8-connected hysteresis flood from
    strong pixels.  Thresholds floor to int (squared first for L2)."""
    if img.dtype != np.uint8:
        raise TypeError(f"cv2.Canny requires uint8 input, got {img.dtype}")
    if aperture_size not in (3, 5, 7):
        raise ValueError(f"aperture_size must be 3, 5 or 7, got {aperture_size}")
    H, W = img.shape
    gx = _sobel_replicate(img, 1, 0, aperture_size)
    gy = _sobel_replicate(img, 0, 1, aperture_size)
    lo_t, hi_t = sorted((float(threshold1), float(threshold2)))
    if aperture_size == 7:
        lo_t, hi_t = lo_t / 16.0, hi_t / 16.0     # paired with the 1/16 scale
    if l2_gradient:
        # gradients are int16-saturated, so dx²+dy² <= 2·32767² fits
        # int32 — no wrap in cv2's int storage
        mag = gx * gx + gy * gy
        lo_i, hi_i = int(np.floor(lo_t * lo_t)), int(np.floor(hi_t * hi_t))
    else:
        mag = np.abs(gx) + np.abs(gy)
        lo_i, hi_i = int(np.floor(lo_t)), int(np.floor(hi_t))
    # --- non-maximum suppression (vectorized transcription of cv2's) ---
    mp = np.pad(mag, 1)                               # zero border, like cv2
    c = mp[1:-1, 1:-1]
    left, right = mp[1:-1, :-2], mp[1:-1, 2:]
    up, down = mp[:-2, 1:-1], mp[2:, 1:-1]
    ul, ur = mp[:-2, :-2], mp[:-2, 2:]
    dl, dr = mp[2:, :-2], mp[2:, 2:]
    ax = np.abs(gx)
    ay = np.abs(gy) << _CANNY_SHIFT
    tg22x = ax * _CANNY_TG22
    tg67x = tg22x + ((ax + ax) << _CANNY_SHIFT)
    s_neg = (gx ^ gy) < 0                             # diagonal orientation
    horiz = ay < tg22x
    vert = ay > tg67x
    diag1 = np.where(s_neg, ur, ul)                   # prev row, col -s
    diag2 = np.where(s_neg, dl, dr)                   # next row, col +s
    keep = np.where(
        horiz, (c > left) & (c >= right),
        np.where(vert, (c > up) & (c >= down), (c > diag1) & (c > diag2)))
    keep &= mag > lo_i
    strong = keep & (mag > hi_i)
    # --- hysteresis: 8-connected flood from strong through weak -------
    out = strong.copy()
    while True:
        op = np.pad(out, 1)
        grown = keep & (
            op[:-2, :-2] | op[:-2, 1:-1] | op[:-2, 2:]
            | op[1:-1, :-2] | op[1:-1, 2:]
            | op[2:, :-2] | op[2:, 1:-1] | op[2:, 2:])
        new = out | grown
        if (new == out).all():
            break
        out = new
    return np.where(out, np.uint8(255), np.uint8(0))


def _cubic_w_f32(t: np.ndarray):
    """cv2's 4-tap bicubic weights at f32 fraction arrays (A=-0.75),
    in cv2's evaluation order (w3 closes the partition of unity)."""
    f32 = np.float32
    A = f32(_CUBIC_A)
    t = t.astype(f32)
    w0 = (((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A).astype(f32)
    w1 = (((A + 2) * t - (A + 3)) * t * t + 1).astype(f32)
    w2 = (((A + 2) * (1 - t) - (A + 3)) * (1 - t) * (1 - t) + 1).astype(f32)
    w3 = (f32(1.0) - w0 - w1 - w2).astype(f32)
    return [w0, w1, w2, w3]


def _remap_cubic(img, map_x, map_y, border, border_value):
    """cv2.remap INTER_CUBIC with float maps — the continuous-f32 path
    (like LINEAR): f32 fractional coords, cv2's cubic weights, f32
    accumulation.  u8 bit-exact (razor-tie ±1 class), u16/i16 ±1,
    f32 ~1 ulp (48-config matrix vs cv2)."""
    f32 = np.float32
    H, W = img.shape
    kind = _img_kind(img, allow_i16=True)
    ix = np.floor(map_x).astype(np.int64)
    iy = np.floor(map_y).astype(np.int64)
    fx = (map_x - ix).astype(f32)
    fy = (map_y - iy).astype(f32)
    wx = _cubic_w_f32(fx)
    wy = _cubic_w_f32(fy)
    acc = np.zeros(map_x.shape, f32)
    for a in range(4):
        row = np.zeros(map_x.shape, f32)
        for b in range(4):
            yy = iy + a - 1
            xx = ix + b - 1
            if border == "replicate":
                v = img[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)].astype(f32)
            else:
                inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
                v = np.where(inside, img[np.clip(yy, 0, H - 1),
                                         np.clip(xx, 0, W - 1)],
                             f32(border_value)).astype(f32)
            row = (row + wx[b] * v).astype(f32)
        acc = (acc + wy[a] * row).astype(f32)
    if kind == "f32":
        return acc
    lo, hi = _int_minval(kind), _int_maxval(kind)
    return np.clip(np.round(acc.astype(np.float64)), lo, hi).astype(img.dtype)


_LANCZOS4_REMAP_TABS = None


def _lanczos4_remap_tabs():
    """cv2's 32-cell lanczos4 remap tabs (initInterTab1D/2D), pinned
    BITWISE by f32 delta-probe extraction (0/256 1-D entries):

    * 1-D: ``interpolateLanczos4(i/32)`` — f64 sin/cos off one phase,
      per-tap f64 ``(cs0*s0 + cs1*c0)/y²`` cast f32, then an f32
      SEQUENTIAL sum whose f32 reciprocal scales every tap; fraction 0
      short-circuits to the tap-3 delta.
    * u8 int tab: ``saturate16(cvRound(wy*wx * 2^15))`` with the cell
      sum corrected to 2^15 on ONE center-2x2 extremum — the corrected
      ENTRY cv2 picks is ambiguous on ~10 % of cells (probe-measured),
      worth ±1 LSB on ~0.3 % of output pixels (the documented budget).
    Returns ``(w1, itab)``: f32 ``(32, 8)`` and int32 ``(32, 32, 8, 8)``.
    """
    global _LANCZOS4_REMAP_TABS
    if _LANCZOS4_REMAP_TABS is not None:
        return _LANCZOS4_REMAP_TABS
    f32, f64 = np.float32, np.float64
    T = 32
    x = (np.arange(T) / f32(T)).astype(f32)
    s45 = 0.70710678118654752440084436210485
    cs = np.array([[1, 0], [-s45, -s45], [0, 1], [s45, -s45],
                   [-1, 0], [s45, s45], [0, -1], [-s45, s45]], f64)
    w1 = np.empty((T, 8), f32)
    xd = x.astype(f64)
    y0 = -(xd + 3) * np.pi * 0.25
    s0, c0 = np.sin(y0), np.cos(y0)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(8):
            y = -(xd + 3 - i) * np.pi * 0.25
            w1[:, i] = ((cs[i, 0] * s0 + cs[i, 1] * c0) / (y * y)).astype(f32)
    ssum = np.zeros(T, f32)
    for i in range(8):
        ssum = (ssum + w1[:, i]).astype(f32)
    with np.errstate(invalid="ignore", divide="ignore"):
        w1 = (w1 * (f32(1.0) / ssum)[:, None]).astype(f32)
    w1[0] = 0
    w1[0, 3] = 1
    w2d = (w1[:, None, :, None] * w1[None, :, None, :]).astype(f32)
    S = 1 << _WARP_REMAP_BITS
    itab = np.clip(np.rint(w2d * f32(S)), -32768, 32767).astype(np.int64)
    for fy in range(T):
        for fx in range(T):
            cell = itab[fy, fx]
            diff = int(cell.sum()) - S
            if diff:
                mk = Mk = (3, 3)
                for k1 in (3, 4):
                    for k2 in (3, 4):
                        if cell[k1, k2] < cell[mk]:
                            mk = (k1, k2)
                        elif cell[k1, k2] > cell[Mk]:
                            Mk = (k1, k2)
                if diff < 0:
                    cell[Mk] -= diff
                else:
                    cell[mk] -= diff
    _LANCZOS4_REMAP_TABS = (w1, itab.astype(np.int32))
    return _LANCZOS4_REMAP_TABS


def _remap_lanczos4(img, map_x, map_y, border, fill):
    """cv2.remap INTER_LANCZOS4 with float maps — the QUANTIZED path
    (cvRound(map*32) coords, 1/32 fraction cells, pinned tabs).  u8
    runs the 2^15 int tab (``(Σ w·v + 2^14) >> 15``, saturate); other
    dtypes the f32 factored row chains.  Budgets (8-run fuzz per
    dtype x border): u8/u16/i16 ±1 on ≲0.3 % px, f32 ≤4e-4 at
    655-scale (~1 ulp; cv2's SIMD accumulation order)."""
    f32, f64 = np.float32, np.float64
    H, W = img.shape
    kind = _img_kind(img, allow_i16=True)
    w1, itab = _lanczos4_remap_tabs()
    X = np.rint(np.clip(map_x, -6e7, 6e7).astype(f64) * 32).astype(np.int64)
    Y = np.rint(np.clip(map_y, -6e7, 6e7).astype(f64) * 32).astype(np.int64)
    ix, iy = X >> 5, Y >> 5
    fx, fy = (X & 31).astype(int), (Y & 31).astype(int)

    def samp(a, b, asdt):
        yy, xx = iy + a - 3, ix + b - 3
        v = img[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)].astype(asdt)
        if border == "constant":
            inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            v = np.where(inside, v, asdt(fill)).astype(asdt)
        return v

    if kind == "u8":
        acc = np.zeros(map_x.shape, np.int64)
        for a in range(8):
            for b in range(8):
                acc += samp(a, b, np.int64) * itab[fy, fx, a, b]
        return np.clip((acc + (1 << 14)) >> 15, 0, 255).astype(img.dtype)
    acc = np.zeros(map_x.shape, f32)
    for a in range(8):
        row = np.zeros(map_x.shape, f32)
        for b in range(8):
            row = (row + w1[fx, b] * samp(a, b, f32)).astype(f32)
        acc = (acc + w1[fy, a] * row).astype(f32)
    if kind == "f32":
        return acc
    lo, hi = _int_minval(kind), _int_maxval(kind)
    return np.clip(np.rint(acc.astype(f64)), lo, hi).astype(img.dtype)


def _warp_lanczos4_sample(img, X, Y, border, fill):
    """Shared INTER_LANCZOS4 sampler for warpAffine/warpPerspective:
    quantized 1/32 coords (``X = coords·32`` fixed point, any source)
    through the pinned remap tabs (``_lanczos4_remap_tabs``).  u8 via
    the 2^15 int tab; u16/i16/f32 via f32 factored row chains.
    Budgets (8-run fuzz per dtype x border, affine + perspective):
    u8/u16/i16 ±1 on ≲0.3 % px, f32 ~1 ulp (4e-4 at 655-scale)."""
    f32, f64 = np.float32, np.float64
    H, W = img.shape
    kind = _img_kind(img, allow_i16=True)
    w1, itab = _lanczos4_remap_tabs()
    ix, iy = X >> 5, Y >> 5
    fx, fy = (X & 31).astype(int), (Y & 31).astype(int)

    def samp(a, b, asdt):
        yy, xx = iy + a - 3, ix + b - 3
        v = img[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)].astype(asdt)
        if border == "constant":
            inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            v = np.where(inside, v, asdt(fill)).astype(asdt)
        return v

    if kind == "u8":
        acc = np.zeros(X.shape, np.int64)
        for a in range(8):
            for b in range(8):
                acc += samp(a, b, np.int64) * itab[fy, fx, a, b]
        return np.clip((acc + (1 << 14)) >> 15, 0, 255).astype(img.dtype)
    acc = np.zeros(X.shape, f32)
    for a in range(8):
        row = np.zeros(X.shape, f32)
        for b in range(8):
            row = (row + w1[fx, b] * samp(a, b, f32)).astype(f32)
        acc = (acc + w1[fy, a] * row).astype(f32)
    if kind == "f32":
        return acc
    lo, hi = _int_minval(kind), _int_maxval(kind)
    return np.clip(np.rint(acc.astype(f64)), lo, hi).astype(img.dtype)


def remap(img: np.ndarray, map_x: np.ndarray, map_y: np.ndarray,
          interpolation: str = "linear", border: str = "constant",
          border_value: float = 0.0) -> np.ndarray:
    """``cv2.remap(img, map_x, map_y, ...)`` with float32 maps.

    Pinned BIT-EXACT for every dtype (deterministic fuzz, 3000+ configs
    per dtype incl. border-straddling coords):

    * LINEAR u8/u16/f32 — cv2 5.0's float path: continuous f32
      subpixels taken straight from the maps (``t = f32(s - floor(s))``),
      then the row-column FMA lerp (``_bilinear_f32_fma``), cvRound
      (half-to-even), saturate.  The round-2 f64 model was ±1 on ~1 % of
      configs (razor 133.5 ties that only f32 arithmetic hits exactly).
    * LINEAR i16 — the legacy path cv2 keeps for 16S: quantize
      ``cvRound(map·32)``, split into index + 1/32 fraction, FLOAT tab
      weights ``(1-fx)(1-fy)…`` and sequential f32 accumulation
      ``((p00·w0 + p01·w1) + p10·w2) + p11·w3``, cvRound.  (The int-tab
      2^15 model was ±1 on ~1 % of configs; the float tab is 0/3000.)
    * NEAREST — ``cvRound(map)`` gather (exact).

    borderValue saturates into the dtype before blending, like cv2."""
    kind = _img_kind(img, allow_i16=True)
    if border not in ("constant", "replicate"):
        raise ValueError(f"unknown border {border!r} (constant|replicate)")
    map_x = np.asarray(map_x, np.float32)
    map_y = np.asarray(map_y, np.float32)
    if map_x.shape != map_y.shape or map_x.ndim != 2:
        raise ValueError("map_x/map_y must be equal-shape 2-D float maps")
    H, W = img.shape
    lo, hi = (None, None) if kind == "f32" else (_int_minval(kind), _int_maxval(kind))
    fill = (float(border_value) if kind == "f32"
            else float(np.clip(np.round(float(border_value)), lo, hi)))

    def sample(iy, ix):
        inside = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        v = img[np.clip(iy, 0, H - 1), np.clip(ix, 0, W - 1)].astype(np.float32)
        if border == "constant":
            v = np.where(inside, v, np.float32(fill))
        return v

    if interpolation == "nearest":
        v = sample(np.round(map_y.astype(np.float64)).astype(np.int64),
                   np.round(map_x.astype(np.float64)).astype(np.int64))
        if kind == "f32":
            return v.astype(np.float32)
        return np.clip(np.round(v.astype(np.float64)), lo, hi).astype(img.dtype)
    if interpolation == "cubic":
        return _remap_cubic(img, map_x, map_y, border, fill)
    if interpolation == "lanczos4":
        return _remap_lanczos4(img, map_x, map_y, border, fill)
    if interpolation != "linear":
        raise ValueError(f"unknown interpolation {interpolation!r} "
                         "(nearest|linear|cubic|lanczos4)")
    if kind == "i16":
        X = np.round(map_x.astype(np.float64) * 32).astype(np.int64)
        Y = np.round(map_y.astype(np.float64) * 32).astype(np.int64)
        ix, iy = X >> _WARP_INTER_BITS, Y >> _WARP_INTER_BITS
        T = (1 << _WARP_INTER_BITS) - 1
        fx = (X & T).astype(np.float32) / np.float32(32)
        fy = (Y & T).astype(np.float32) / np.float32(32)
        acc = _bilinear_tab_f32_seq(sample, iy, ix, fx, fy)
        return np.clip(np.rint(acc), lo, hi).astype(img.dtype)
    ixf, iyf = np.floor(map_x), np.floor(map_y)
    ix, iy = ixf.astype(np.int64), iyf.astype(np.int64)
    tx = (map_x - ixf).astype(np.float32)
    ty = (map_y - iyf).astype(np.float32)
    acc = _bilinear_f32_fma(sample(iy, ix), sample(iy, ix + 1),
                            sample(iy + 1, ix), sample(iy + 1, ix + 1), tx, ty)
    if kind == "f32":
        return acc
    return np.clip(np.rint(acc), lo, hi).astype(img.dtype)


def _decolor_gradvec(ch: np.ndarray) -> np.ndarray:
    """cv2 Decolor::gradvector — [1,-1] correlations (x then y), last
    col/row zeroed, flattened via the TRANSPOSE (column-major), x block
    then y block."""
    f32 = np.float32
    dx = np.zeros_like(ch, f32)
    dx[:, :-1] = ch[:, :-1] - ch[:, 1:]
    dy = np.zeros_like(ch, f32)
    dy[:-1, :] = ch[:-1, :] - ch[1:, :]
    return np.concatenate([dx.T.ravel(), dy.T.ravel()]).astype(np.float64)


def decolor_weights(img_rgb01: np.ndarray):
    """The Lu/Xu/Jia contrast-preserving decolorization solver exactly
    as cv2.decolor runs it (pinned: with cv2's own f32 Lab the gray
    output matches at ±1 on ~1e-4 of pixels):

    * work image capped so h+w <= 800 (INTER_LINEAR resize);
    * color contrast Cg = |∇Lab|/100 (f32 Lab legs — this repo's
      ANALYTIC f32 Lab gives the documented ±1-on-≲4 % gray tier);
    * 9 degree-≤2 monomials of (R,G,B); Mt = (PPᵀ)⁻¹(P·diag(Cg));
    * weak order alf from per-channel gradient signs at level 0.05;
    * EM loop: G-step gaussians at σ² = 4e-4, but the STOPPING energy
      uses exp(−t²/σ) with σ = 0.02 and the MEAN over terms (pinned —
      the σ²-energy variant runs to maxIter and mis-weights ~9 % of
      pixels); tol 1e-4, maxIter 15.

    Returns (wei, combs): 9 f64 weights and their (r,g,b) exponents."""
    f32, f64 = np.float32, np.float64
    img = np.asarray(img_rgb01, f32)
    h, w = img.shape[:2]
    if h + w > 800:
        sf = 800.0 / (h + w)
        img = resize(img, (int(round(h * sf)), int(round(w * sf))), "linear")
    lab = rgb_to_lab(img.astype(f32))
    Cgp = [_decolor_gradvec(np.ascontiguousarray(lab[..., c])) for c in range(3)]
    Cg = np.sqrt(Cgp[0] ** 2 + Cgp[1] ** 2 + Cgp[2] ** 2) / 100.0
    R_, G_, B_ = img[..., 0], img[..., 1], img[..., 2]
    combs, pg = [], []
    for r in range(3):
        for g in range(3):
            for b in range(3):
                if 0 < r + g + b <= 2:
                    pg.append(_decolor_gradvec(((R_ ** r) * (G_ ** g) * (B_ ** b)).astype(f32)))
                    combs.append((r, g, b))
    P = np.array(pg, f32)
    A = (P @ P.T).astype(f32)
    Bm = (P.astype(f64) * Cg[None, :]).astype(f32)
    Mt = np.linalg.solve(A.astype(f64), Bm.astype(f64))
    Rg = _decolor_gradvec(R_.astype(f32))
    Gg = _decolor_gradvec(G_.astype(f32))
    Bg = _decolor_gradvec(B_.astype(f32))
    lv = 0.05
    alf = (((Rg > lv) & (Gg > lv) & (Bg > lv)).astype(f64)
           - ((Rg < -lv) & (Gg < -lv) & (Bg < -lv)).astype(f64))
    wei = np.array([0.33 if sum(c) == 1 else 0.0 for c in combs], f64)
    sigma = 0.02
    E = 0.0
    pre_E = np.inf
    it = 0
    Pd = P.astype(f64)
    while abs(E - pre_E) > 1e-4:
        it += 1
        pre_E = E
        val = wei @ Pd
        Gp = ((1 + alf) / 2) * np.exp(-0.5 * (val - Cg) ** 2 / sigma ** 2)
        Gn = ((1 - alf) / 2) * np.exp(-0.5 * (val + Cg) ** 2 / sigma ** 2)
        s = Gp + Gn
        expterm = (Gp - Gn) / (s + (s == 0))
        wei = Mt @ expterm
        val = wei @ Pd
        en = -np.log(np.maximum(np.exp(-(val - Cg) ** 2 / sigma)
                                + np.exp(-(val + Cg) ** 2 / sigma), 1e-300))
        E = float(en.mean())
        if it > 15:
            break
    return wei, combs


def decolor(img: np.ndarray, order: str = "rgb"):
    """``cv2.decolor(img)`` → (grayscale u8, color_boost u8).

    Gray = the solved degree-2 polynomial of the channels, min-max
    normalized — ±1 LSB on ≲4 % px vs cv2 (the analytic-vs-interpolated
    f32 Lab leg feeding Cg; with cv2's own f32 Lab the law is exact to
    ±1 on ~1e-4).  color_boost = the u8 Lab L-replacement roundtrip —
    bit-exact GIVEN the gray (exhaustive u8 Lab tables)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise TypeError("decolor expects a uint8 [H,W,3] image")
    if order not in ("rgb", "bgr"):
        raise ValueError(f"unknown channel order {order!r}")
    rgb = img[..., ::-1] if order == "bgr" else img
    # NOTE cv2 interprets its input as BGR; its "R" is our channel 2
    # when fed RGB bytes.  The solver below works on true-RGB planes,
    # which reproduces cv2.decolor run on the matching BGR bytes.
    x = rgb.astype(np.float32) / np.float32(255.0)
    wei, combs = decolor_weights(x[..., ::-1][..., ::-1])  # identity; clarity
    R_, G_, B_ = (x[..., 0].astype(np.float64), x[..., 1].astype(np.float64),
                  x[..., 2].astype(np.float64))
    Gray = np.zeros(R_.shape, np.float64)
    for w_, (r, g, b) in zip(wei, combs):
        Gray += w_ * (R_ ** r) * (G_ ** g) * (B_ ** b)
    mn, mx = float(Gray.min()), float(Gray.max())
    if mx > mn:
        Gray = (Gray - mn) / (mx - mn)
    else:
        Gray = Gray * 0
    gray = np.clip(np.round(Gray * 255.0), 0, 255).astype(np.uint8)
    lab = rgb_to_lab(rgb)
    lab2 = lab.copy()
    lab2[..., 0] = gray
    boost = lab_to_rgb(lab2)
    boost = boost[..., ::-1] if order == "bgr" else boost
    return gray, boost


def denoise_tvl1(observations, lam: float = 1.0, niters: int = 30) -> np.ndarray:
    """``cv2.denoise_TVL1(observations, result, lam, niters)`` — the
    Chambolle-Pock primal-dual TV-L1 denoiser, pinned BIT-EXACT modulo
    a razor-tie class (28/30 exact configs; the rest ±1 on a single
    pixel at an exact .5 output boundary):

    * f64 working precision, X init = observations[0]/255;
    * dual step at ``currsigma = 1+σ`` on the FIRST iteration only,
      but the residual fields Rs always update at PLAIN σ (pinned by a
      1x3 two-observation probe — the 1+σ-everywhere variant is ±3);
    * forward-diff gradients with REPLICATE rows / zero last column;
      the LAST COLUMN of the dual field P normalizes its y component
      ALONE (x forced 0) — cv2's per-row loop tail;
    * divergence with clamped prev indices (first row/col terms drop);
    * conflated over-relaxation: X = X1 + θ(X1 − X) is both the next
      primal AND dual iterate (cv2 stores the relaxed value back).
    """
    if niters < 1 or lam <= 0:
        raise ValueError("niters must be >= 1 and lam > 0")
    obs = [np.asarray(o) for o in observations]
    if not obs or any(o.dtype != np.uint8 or o.ndim != 2 for o in obs):
        raise TypeError("denoise_tvl1 expects uint8 [H,W] observations")
    if any(o.shape != obs[0].shape for o in obs):
        raise ValueError("observations must share one shape")
    L2, tau, theta = 8.0, 0.02, 1.0
    sigma = 1.0 / (L2 * tau)
    ob = [o.astype(np.float64) / 255.0 for o in obs]
    X = ob[0].copy()
    rows, cols = X.shape
    Px = np.zeros((rows, cols)); Py = np.zeros((rows, cols))
    Rs = [np.zeros((rows, cols)) for _ in ob]
    lam = float(lam)
    for i in range(int(niters)):
        cs = 1 + sigma if i == 0 else sigma
        Xnext = X[np.minimum(np.arange(rows) + 1, rows - 1), :]
        dx = np.zeros_like(X)
        dx[:, :-1] = (X[:, 1:] - X[:, :-1]) * cs + Px[:, :-1]
        dy = (Xnext - X) * cs + Py
        m = 1.0 / np.maximum(np.sqrt(dx[:, :-1] ** 2 + dy[:, :-1] ** 2), 1.0)
        Px[:, :-1] = dx[:, :-1] * m
        Py[:, :-1] = dy[:, :-1] * m
        ml = 1.0 / np.maximum(np.abs(dy[:, -1]), 1.0)
        Px[:, -1] = 0.0
        Py[:, -1] = dy[:, -1] * ml
        for k in range(len(Rs)):
            Rs[k] = np.clip(Rs[k] + sigma * (X - ob[k]), -lam, lam)
        div = np.zeros_like(X)
        div[:, 1:] += Px[:, 1:] - Px[:, :-1]
        div[1:, :] += Py[1:, :] - Py[:-1, :]
        Xold = X.copy()
        X1 = X + tau * div - tau * sum(Rs)
        X = X1 + theta * (X1 - Xold)
    return np.clip(np.round(X * 255.0), 0, 255).astype(np.uint8)


_MT_METHODS = ("sqdiff", "sqdiff_normed", "ccorr", "ccorr_normed",
               "ccoeff", "ccoeff_normed")


def match_template(img: np.ndarray, templ: np.ndarray, method: str = "ccoeff_normed") -> np.ndarray:
    """``cv2.matchTemplate`` — float32 result ``(H-th+1, W-tw+1)``.

    Pinned (20-config fuzz per method): cv2's six methods reproduce at
    float tolerance (cv2 mixes FFT and direct paths; worst observed
    2e-6 relative).  Quirk: SQDIFF_NORMED is CLAMPED to [0, 1] — cv2
    returns exactly 1.0 wherever the ratio exceeds it (mismatch
    windows), 0.29 relative off an unclamped model."""
    kind = _img_kind(img, allow_i16=True)
    if _img_kind(templ, allow_i16=True) != kind:
        raise TypeError("image and template dtypes must match")
    if method not in _MT_METHODS:
        raise ValueError(f"unknown method {method!r}; one of {_MT_METHODS}")
    th, tw = templ.shape
    H, W = img.shape
    if th > H or tw > W:
        raise ValueError("template larger than image")
    from numpy.lib.stride_tricks import sliding_window_view

    I = img.astype(np.float64)
    T = templ.astype(np.float64)
    win = sliding_window_view(I, (th, tw))
    ccorr = np.einsum("ijkl,kl->ij", win, T)
    n = th * tw
    sT, sT2 = T.sum(), (T * T).sum()
    if method == "ccorr":
        return ccorr.astype(np.float32)
    sI = win.sum((2, 3))
    sI2 = (win * win).sum((2, 3))
    if method == "sqdiff":
        return (sT2 - 2 * ccorr + sI2).astype(np.float32)
    if method == "sqdiff_normed":
        den = np.sqrt(sT2 * sI2)
        r = np.divide(sT2 - 2 * ccorr + sI2, den,
                      out=np.ones_like(ccorr), where=den > 0)
        return np.clip(r, 0.0, 1.0).astype(np.float32)
    if method == "ccorr_normed":
        den = np.sqrt(sT2 * sI2)
        return np.divide(ccorr, den, out=np.ones_like(ccorr),
                         where=den > 0).astype(np.float32)
    num = ccorr - sI * (sT / n)
    if method == "ccoeff":
        return num.astype(np.float32)
    den = np.sqrt(np.maximum(sT2 - sT * sT / n, 0.0)
                  * np.maximum(sI2 - sI * sI / n, 0.0))
    return np.where(den > 0, np.divide(num, np.maximum(den, 1e-300)),
                    0.0).astype(np.float32)


def min_max_loc(arr: np.ndarray):
    """``cv2.minMaxLoc``: (min_val, max_val, (min_x, min_y), (max_x, max_y))
    — note cv2 returns (x, y) point order."""
    a = np.asarray(arr)
    mn, mx = int(a.argmin()), int(a.argmax())
    miy, mix = divmod(mn, a.shape[1])
    may, max_ = divmod(mx, a.shape[1])
    return (float(a.flat[mn]), float(a.flat[mx]), (mix, miy), (max_, may))


# ---------------------------------------------------------------------------
# core per-element arithmetic (cv2.add / subtract / multiply / divide /
# absdiff / bitwise / min / max / compare)
# ---------------------------------------------------------------------------

_CMP_OPS = ("eq", "gt", "ge", "lt", "le", "ne")


def _sat_cast(v: np.ndarray, dtype) -> np.ndarray:
    """saturate_cast<T>(double): cvRound half-even, then the x86
    cvtsd2si overflow quirk (values beyond int32 become INT_MIN before
    the clamp — pinned on cv2.multiply u16: 60000·60000 → 0, NOT
    65535), then clamp to the dtype."""
    if dtype == np.float32:
        return v.astype(np.float32)
    info = np.iinfo(dtype)
    r = np.round(v)
    r = np.where((v >= 2.0 ** 31) | (v < -(2.0 ** 31)), -(2.0 ** 31), r)
    return np.clip(r, info.min, info.max).astype(dtype)


def _arith_pair(a, b):
    ka = _img_kind(a, allow_i16=True)
    if _img_kind(b, allow_i16=True) != ka or a.shape != b.shape:
        raise ValueError("inputs must share dtype and shape")
    return ka


def add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``cv2.add`` — saturating elementwise sum (exact, 0/120 fuzz
    per dtype; f32 plain IEEE)."""
    _arith_pair(a, b)
    return _sat_cast(a.astype(np.float64) + b.astype(np.float64), a.dtype.type)


def subtract(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``cv2.subtract`` — saturating elementwise difference (exact)."""
    _arith_pair(a, b)
    return _sat_cast(a.astype(np.float64) - b.astype(np.float64), a.dtype.type)


def absdiff(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``cv2.absdiff`` — |a−b| saturated (exact)."""
    _arith_pair(a, b)
    return _sat_cast(np.abs(a.astype(np.float64) - b.astype(np.float64)), a.dtype.type)


def multiply(a: np.ndarray, b: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """``cv2.multiply(a, b, scale)`` — pinned (0/300 fuzz per dtype):
    ``saturate_cast(cvRound(a·b·scale))`` in f64, where the cvRound of
    an out-of-int32 value yields INT_MIN (x86 cvtsd2si) so huge
    positive products saturate to ZERO, not the dtype max.  f32 is
    ``(a*b)*scale`` in f32 — cv2 mixes SIMD/scalar lane orderings for
    fractional scales ((a*scale)*b on some lanes), so f32 carries a
    1-ulp budget; scale=1 is bitwise."""
    _arith_pair(a, b)
    if a.dtype == np.float32:
        return ((a * b) * np.float32(scale)).astype(np.float32)
    return _sat_cast(a.astype(np.float64) * b.astype(np.float64) * float(scale),
                     a.dtype.type)


def divide(a: np.ndarray, b: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """``cv2.divide(a, b, scale)`` — integer dtypes round half-even on
    ``a·scale/b`` with b==0 → 0 (0/120 fuzz per dtype); f32 is cv2's
    ``(a*scale)/b`` in f32, true IEEE ±inf/nan on zero denominators."""
    _arith_pair(a, b)
    if a.dtype == np.float32:
        return ((a * np.float32(scale)) / b).astype(np.float32)
    b64 = b.astype(np.float64)
    v = np.where(b64 != 0,
                 a.astype(np.float64) * float(scale) / np.where(b64 == 0, 1, b64),
                 0.0)
    return _sat_cast(v, a.dtype.type)


def bitwise_and(a, b):
    """``cv2.bitwise_and`` (integer dtypes) — exact."""
    if _arith_pair(a, b) == "f32":
        raise TypeError("bitwise ops support integer dtypes")
    return a & b


def bitwise_or(a, b):
    """``cv2.bitwise_or`` — exact."""
    if _arith_pair(a, b) == "f32":
        raise TypeError("bitwise ops support integer dtypes")
    return a | b


def bitwise_xor(a, b):
    """``cv2.bitwise_xor`` — exact."""
    if _arith_pair(a, b) == "f32":
        raise TypeError("bitwise ops support integer dtypes")
    return a ^ b


def bitwise_not(a):
    """``cv2.bitwise_not`` — exact."""
    if _img_kind(a, allow_i16=True) == "f32":
        raise TypeError("bitwise ops support integer dtypes")
    return ~a


def minimum(a, b):
    """``cv2.min`` — exact."""
    _arith_pair(a, b)
    return np.minimum(a, b)


def maximum(a, b):
    """``cv2.max`` — exact."""
    _arith_pair(a, b)
    return np.maximum(a, b)


def compare(a: np.ndarray, b: np.ndarray, op: str = "gt") -> np.ndarray:
    """``cv2.compare`` — uint8 0/255 mask (exact; ``op`` one of
    eq/gt/ge/lt/le/ne)."""
    _arith_pair(a, b)
    if op not in _CMP_OPS:
        raise ValueError(f"unknown compare op {op!r}; one of {_CMP_OPS}")
    f = {"eq": np.equal, "gt": np.greater, "ge": np.greater_equal,
         "lt": np.less, "le": np.less_equal, "ne": np.not_equal}[op]
    return np.where(f(a, b), np.uint8(255), np.uint8(0))


# ---------------------------------------------------------------------------
# integral images, statistics, histogram comparison, colormaps
# ---------------------------------------------------------------------------

def integral(img: np.ndarray, sq: bool = False):
    """``cv2.integral`` / ``cv2.integral2`` — (H+1, W+1) zero-padded
    cumulative sums, exact: int32 sums for u8 (cv2's CV_32S default),
    f64 for u16/i16/f32 (cv2's CV_64F); squared sums always f64."""
    _img_kind(img, allow_i16=True)
    H, W = img.shape
    u8 = img.dtype == np.uint8
    s = np.zeros((H + 1, W + 1), np.int32 if u8 else np.float64)
    s[1:, 1:] = img.astype(np.int64 if u8 else np.float64).cumsum(0).cumsum(1)
    if not sq:
        return s
    s2 = np.zeros((H + 1, W + 1), np.float64)
    s2[1:, 1:] = (img.astype(np.float64) ** 2).cumsum(0).cumsum(1)
    return s, s2


def mean_std_dev(img: np.ndarray):
    """``cv2.meanStdDev`` — (mean, POPULATION std) in f64, exact."""
    _img_kind(img, allow_i16=True)
    a = img.astype(np.float64)
    return float(a.mean()), float(a.std())


_HIST_CMP = ("correl", "chisqr", "intersect", "bhattacharyya")


def compare_hist(h1: np.ndarray, h2: np.ndarray, method: str = "correl") -> float:
    """``cv2.compareHist`` — cv2's four formulas in f64 (fuzz ≤1e-12
    relative): correlation, chi-square, intersection, Bhattacharyya."""
    a = np.asarray(h1, np.float64).ravel()
    b = np.asarray(h2, np.float64).ravel()
    if a.shape != b.shape:
        raise ValueError("histograms must share shape")
    if method == "correl":
        da, db = a - a.mean(), b - b.mean()
        den = np.sqrt((da * da).sum() * (db * db).sum())
        return float((da * db).sum() / den) if den else 1.0
    if method == "chisqr":
        m = a > 0
        return float((((a - b) ** 2)[m] / a[m]).sum())
    if method == "intersect":
        return float(np.minimum(a, b).sum())
    if method == "bhattacharyya":
        den = a.sum() * b.sum()
        if den <= 0:
            return 1.0
        bc = np.sqrt(a * b).sum() / np.sqrt(den)
        return float(np.sqrt(max(1.0 - bc, 0.0)))
    raise ValueError(f"unknown method {method!r}; one of {_HIST_CMP}")


def apply_color_map(img: np.ndarray, colormap: str = "jet") -> np.ndarray:
    """``cv2.applyColorMap`` — uint8 gray → RGB via cv2's 256-entry
    tables (extracted empirically from cv2 5.0 — ref/colormaps.py;
    bitwise).  NOTE: returns RGB order (this library's convention);
    cv2 returns BGR."""
    if img.dtype != np.uint8:
        raise TypeError("applyColorMap requires uint8 input")
    from imageenhancement_mp_tpu.ref.colormaps import colormap_table

    return colormap_table(colormap)[img]


def connected_components(mask: np.ndarray, connectivity: int = 8) -> np.ndarray:
    """``cv2.connectedComponents`` labels (int32; 0 = background) —
    numbering BIT-EXACT vs cv2 for BOTH connectivities (round 3).

    Pinned: 4-connectivity — cv2's SAUF scan labels components in
    raster order of their first pixel == ranking by minimum flat index
    (0/40 fuzz).  8-connectivity — cv2's BBDT scans 2x2 BLOCKS in
    raster order and a block's foreground pixels are always mutually
    8-connected, so each block belongs to ONE component and cv2's
    numbering equals ranking components by their minimum block index
    ``(y>>1)·ceil(W/2) + (x>>1)`` (0/400 fuzz; the round-2 first-PIXEL
    order differed on 9/40).
    """
    if connectivity not in (4, 8):
        raise ValueError(f"connectivity must be 4 or 8, got {connectivity}")
    m = np.asarray(mask) != 0
    H, W = m.shape
    INF = H * W
    lbl = np.where(m, np.arange(H * W).reshape(H, W), INF)

    def mins(l):
        p = np.pad(l, 1, constant_values=INF)
        n = [p[1:-1, 1:-1], p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:]]
        if connectivity == 8:
            n += [p[:-2, :-2], p[:-2, 2:], p[2:, :-2], p[2:, 2:]]
        return np.minimum.reduce(n)

    while True:
        new = np.where(m, mins(lbl), INF)
        # path compression: jump to the label's own label
        flat = np.minimum(new.reshape(-1), INF - 1)
        new = np.where(m, new.reshape(-1)[flat].reshape(H, W), INF)
        if (new == lbl).all():
            break
        lbl = new
    flat = lbl.reshape(-1)
    is_root = m.reshape(-1) & (flat == np.arange(H * W))
    if connectivity == 4:
        rank = np.cumsum(is_root)
        out = np.where(m.reshape(-1), rank[np.minimum(flat, INF - 1)], 0)
        return out.reshape(H, W).astype(np.int32)
    # 8-conn: rank roots by the component's minimum 2x2-BLOCK index
    nbw = (W + 1) // 2
    ys, xs = np.divmod(np.arange(H * W), W)
    blk = (ys >> 1) * nbw + (xs >> 1)
    minblk = np.full(H * W, INF, np.int64)
    np.minimum.at(minblk, np.minimum(flat, INF - 1), np.where(m.reshape(-1), blk, INF))
    key = np.where(is_root, minblk, INF)
    order = np.argsort(key, kind="stable")
    rank = np.empty(H * W, np.int64)
    rank[order] = np.arange(H * W)
    out = np.where(m.reshape(-1), rank[np.minimum(flat, INF - 1)] + 1, 0)
    return out.reshape(H, W).astype(np.int32)


def init_undistort_rectify_map(K, dist, size, new_K=None):
    """``cv2.initUndistortRectifyMap`` (CV_32FC1 maps) — bit-exact
    (probe: 0 abs diff over random intrinsics): the standard radial
    (k1,k2,k3) + tangential (p1,p2) model evaluated in f64, cast f32.
    ``size`` is (H, W) row-major."""
    K = np.asarray(K, np.float64).reshape(3, 3)
    d = list(np.asarray(dist, np.float64).ravel()) + [0.0] * 5
    k1, k2, p1, p2, k3 = d[:5]
    H, W = int(size[0]), int(size[1])
    nK = K if new_K is None else np.asarray(new_K, np.float64).reshape(3, 3)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    x = (u - nK[0, 2]) / nK[0, 0]
    y = (v - nK[1, 2]) / nK[1, 1]
    r2 = x * x + y * y
    rad = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return ((K[0, 0] * xd + K[0, 2]).astype(np.float32),
            (K[1, 1] * yd + K[1, 2]).astype(np.float32))


def _undistort_maps64(K, dist, size, new_K=None):
    """The f64 (pre-f32-cast) maps — cv2.undistort quantizes THESE."""
    K = np.asarray(K, np.float64).reshape(3, 3)
    d = list(np.asarray(dist, np.float64).ravel()) + [0.0] * 5
    k1, k2, p1, p2, k3 = d[:5]
    H, W = int(size[0]), int(size[1])
    nK = K if new_K is None else np.asarray(new_K, np.float64).reshape(3, 3)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    x = (u - nK[0, 2]) / nK[0, 0]
    y = (v - nK[1, 2]) / nK[1, 1]
    r2 = x * x + y * y
    rad = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return K[0, 0] * xd + K[0, 2], K[1, 1] * yd + K[1, 2]


def undistort(img: np.ndarray, K, dist, new_K=None) -> np.ndarray:
    """``cv2.undistort`` — BIT-EXACT for u8/u16/i16: cv2 quantizes the
    f64 distortion maps to CV_16SC2 (``round(map·32)``) and runs the
    fixed-point remap — u8 through the 32x32 INT tab at 2^15, u16/i16
    through the FLOAT tab with sequential f32 accumulation
    (``_bilinear_tab_f32_seq``, 0/300 fuzz each — the int-tab model was
    ±1 for 16-bit); f32 uses the quantized coordinates with float
    bilinear weights."""
    kind = _img_kind(img, allow_i16=True)
    H, W = img.shape
    mx, my = _undistort_maps64(K, dist, (H, W), new_K)
    X = np.round(mx * 32).astype(np.int64)
    Y = np.round(my * 32).astype(np.int64)
    ix, iy = X >> _WARP_INTER_BITS, Y >> _WARP_INTER_BITS
    T = (1 << _WARP_INTER_BITS) - 1

    def sample(yy, xx):
        inside = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        return np.where(inside,
                        img[np.clip(yy, 0, H - 1), np.clip(xx, 0, W - 1)
                            ].astype(np.float32), np.float32(0))

    if kind == "f32":
        fx = (X & T).astype(np.float32) / np.float32(32)
        fy = (Y & T).astype(np.float32) / np.float32(32)
        return _bilinear_tab_f32_seq(sample, iy, ix, fx, fy)
    if kind in ("u16", "i16"):
        fx = (X & T).astype(np.float32) / np.float32(32)
        fy = (Y & T).astype(np.float32) / np.float32(32)
        acc = _bilinear_tab_f32_seq(sample, iy, ix, fx, fy)
        return np.clip(np.rint(acc),
                       _int_minval(kind), _int_maxval(kind)).astype(img.dtype)
    w = warp_tab_int()[Y & T, X & T]
    acc = np.zeros(mx.shape, np.int64)
    for dy in range(2):
        for dx in range(2):
            acc += np.rint(sample(iy + dy, ix + dx)).astype(np.int64) * w[:, :, dy, dx]
    out = (acc + (1 << (_WARP_REMAP_BITS - 1))) >> _WARP_REMAP_BITS
    return np.clip(out, _int_minval(kind), _int_maxval(kind)).astype(img.dtype)


def _fast_atan2_deg(y: np.ndarray, x: np.ndarray) -> np.ndarray:
    """cv2's ``fastAtan2`` (degrees, f32) — BIT-EXACT vs
    ``cv2.cartToPolar`` (0/262k random values incl. axes/origin, both
    angle units; probes 2026-08-17).  The pinned law: coefficients are
    the f32×f32 products ``f32(p_k)·f32(180/π)`` (NOT the once-rounded
    f64 product), the octant ratio guard is +DBL_EPSILON (an f32 no-op
    except at 0/0), and the odd polynomial is evaluated with
    SINGLE-ROUNDED FMAs; quadrant fixups subtract from exact 90/180/360
    and radians are a final ×f32(π/180)."""
    f32 = np.float32
    deg = f32(180 / np.pi)
    P1 = f32(f32(0.9997878412794807) * deg)
    P3 = f32(f32(-0.3258083974640975) * deg)
    P5 = f32(f32(0.1555786518463281) * deg)
    P7 = f32(f32(-0.04432655554792128) * deg)
    eps = np.float32(2.2204460492503131e-16)  # (float)DBL_EPSILON
    ax, ay = np.abs(x).astype(f32), np.abs(y).astype(f32)
    swap = ax < ay
    num = np.minimum(ax, ay).astype(f32)
    den = np.maximum(ax, ay).astype(f32)
    c = (num / (den + eps).astype(f32)).astype(f32)
    c2 = (c * c).astype(f32)

    def _fma(a, b, cc):
        return (a.astype(np.float64) * b.astype(np.float64)
                + cc.astype(np.float64)).astype(f32)

    a = _fma(_fma(_fma(np.full_like(c2, P7), c2, np.full_like(c2, P5)),
                  c2, np.full_like(c2, P3)), c2, np.full_like(c2, P1))
    a = (a * c).astype(f32)
    a = np.where(swap, (f32(90.0) - a).astype(f32), a)
    a = np.where(x < 0, (f32(180.0) - a).astype(f32), a)
    a = np.where(y < 0, (f32(360.0) - a).astype(f32), a)
    return a


def cart_to_polar(x: np.ndarray, y: np.ndarray, angle_in_degrees: bool = False):
    """``cv2.cartToPolar`` — BIT-EXACT f32 (0/262k fuzz): magnitude is
    ``sqrt(fma(x, x, y·y))`` (the fma argument order matters — x first),
    angle is the pinned fastAtan2 (optionally ×f32(π/180))."""
    f32 = np.float32
    x = np.asarray(x, f32)
    y = np.asarray(y, f32)
    mag = np.sqrt((x.astype(np.float64) * x.astype(np.float64)
                   + ((y * y).astype(f32)).astype(np.float64)).astype(f32)
                  ).astype(f32)
    ang = _fast_atan2_deg(y, x)
    if not angle_in_degrees:
        ang = (ang * f32(np.pi / 180)).astype(f32)
    return mag, ang


def _warp_polar_maps(src_hw, dsize, center, max_radius: float,
                     log: bool, inverse: bool):
    """cv2.warpPolar's coordinate maps (pinned bitwise, probes
    2026-08-17).  Forward: per-column radius table computed in f64,
    STORED f32 (cv2 keeps bufRhos as float), then f64 cos/sin rays +
    center, cast f32.  Inverse: f32 cartToPolar (f32 magnitude sqrt +
    fastAtan2 polynomial in degrees ×π/180), rho/phi descaled in f64,
    +1 on phi for the one-row BORDER_WRAP pad cv2 adds to the polar
    source.  Returns (map_x, map_y) f32 for ``remap``."""
    H, W = src_hw
    dw, dh = int(dsize[0]), int(dsize[1])
    f32 = np.float32
    # cv2's API takes center as Point2f — the coordinates are f32
    cx, cy = float(f32(center[0])), float(f32(center[1]))
    mr = float(max_radius)
    if not inverse:
        rho = np.arange(dw, dtype=np.float64)
        if log:
            buf = np.exp(rho * (np.log(mr) / dw)) - 1.0
        else:
            buf = rho * (mr / dw)
        buf = buf.astype(f32).astype(np.float64)
        phi = np.arange(dh, dtype=np.float64) * (2 * np.pi / dh)
        mapx = (buf[None, :] * np.cos(phi)[:, None] + cx).astype(f32)
        mapy = (buf[None, :] * np.sin(phi)[:, None] + cy).astype(f32)
        return mapx, mapy
    Kangle = 2 * np.pi / H
    Kmag = (np.log(mr) / W) if log else (mr / W)
    xs = (np.arange(dw, dtype=f32) - f32(cx)).astype(f32)
    ys = (np.arange(dh, dtype=f32) - f32(cy)).astype(f32)
    X = np.broadcast_to(xs[None, :], (dh, dw)).astype(f32)
    Y = np.broadcast_to(ys[:, None], (dh, dw)).astype(f32)
    mag, ang = cart_to_polar(X, Y)
    if log:
        # cv2 adds 1.f in f32, then runs its own log32f.  That log is
        # BUILD-DEPENDENT (the IPP and universal-intrinsic paths differ
        # from each other by 1 ulp on ~20 % of inputs — measured); we
        # use the correctly-rounded f32 log, giving ≤1-ulp map
        # coordinates vs either cv2 build (docstring budget).
        lg = np.log((mag + f32(1.0)).astype(f32).astype(np.float64)).astype(f32)
        rho = lg.astype(np.float64) / Kmag
    else:
        rho = mag.astype(np.float64) / Kmag
    mapx = rho.astype(f32)
    # cv2 casts the f64 angle quotient to f32 FIRST, then adds the +1
    # BORDER_WRAP row offset in f32 (pinned: adding before the cast
    # flips 15/1845 interpolation cells on f32 frames)
    mapy = ((ang.astype(np.float64) / Kangle).astype(f32)
            + f32(1.0)).astype(f32)
    return mapx, mapy


def warp_polar(img: np.ndarray, dsize, center, max_radius: float,
               log: bool = False, inverse: bool = False,
               interpolation: str = "linear") -> np.ndarray:
    """``cv2.warpPolar(..., WARP_FILL_OUTLIERS [| WARP_POLAR_LOG |
    WARP_INVERSE_MAP])`` — BIT-EXACT via the pinned coordinate maps
    (_warp_polar_maps) + the bit-exact ``remap`` (border constant 0),
    with ONE documented exception: the semilog INVERSE runs cv2's own
    ``log32f``, whose bits are build-dependent (IPP vs
    universal-intrinsic builds differ by 1 ulp on ~20 % of inputs —
    measured); we use the correctly-rounded f32 log, which keeps u8
    frames bit-exact in all fuzz, u16 within ±1 on ~0.1 % px (finer
    quantization exposes the log ulp) and f32-linear frames within
    6e-6 absolute (~1 % px).  Forward maps
    cartesian→polar (dsize = (rho_bins, angle_bins)); inverse maps a
    polar image back to cartesian, reproducing cv2's one-row angular
    BORDER_WRAP pad."""
    maps = _warp_polar_maps(img.shape[:2], dsize, center, float(max_radius),
                            bool(log), bool(inverse))
    src = img
    if inverse:
        src = np.concatenate([img[-1:], img, img[:1]], axis=0)
    return remap(src, maps[0], maps[1], interpolation, "constant", 0.0)


def _nlm_weight_lut(h: float, t: int, s: int, cn: int = 1, temporal: int = 1,
                    norm: str = "l2", maxval: int = 255):
    """cv2 fastNlMeans weight LUT (cn = pixel channels, SSD summed over
    channels; temporal = frames searched, 1 for the single-image API):
    index = SSD >> bin_shift where 2^bin_shift is the nearest pow-2 >=
    t²; w = round(FPM·exp(−dist/(h²·cn))) with
    FPM = INT_MAX // (temporal·s²·255) — the fixed-point multiplier
    scales with the SEARCH-SET size (temporal·s² candidates), NOT with
    cn (pinned by differential probe 2026-08-17: the /cn and
    plain-INT_MAX variants each leave ~1e-4-relative residue flipping
    rare quotients; this one is 0-LSB over 216 deterministic configs
    cn∈{1,2,3,4} + 108 temporal configs) — and the 0.001·FPM cutoff.
    Only the exp's variance normalisation sees cn."""
    tsq = t * t
    bs = 0
    while (1 << bs) < tsq:
        bs += 1
    mult = (1 << bs) / tsq
    if maxval > 255:
        # 16-bit path: cv2 dispatches int64 accumulators, so the
        # multiplier caps at INT_MAX itself (pinned 0/10 u16-L1 fuzz)
        fpm = np.iinfo(np.int32).max
    else:
        fpm = np.iinfo(np.int32).max // (temporal * (s * s) * 255)
    if norm == "l1":
        # NORM_L1: the template distance is a SAD, squared in the exp
        # (pinned: the h^2*cn^2 and linear-exp variants fail at h>=10)
        amd = int(maxval * cn * tsq / mult + 1)
        i = np.arange(amd + 1)
        dist = i * mult
        w = np.round(fpm * np.exp(-(dist * dist) / (h * h * cn))).astype(np.int64)
    else:
        amd = int(maxval * maxval * cn * tsq / mult + 1)
        i = np.arange(amd + 1)
        w = np.round(fpm * np.exp(-(i * mult) / (h * h * cn))).astype(np.int64)
    w[w < 0.001 * fpm] = 0
    # the LUT is zero beyond the cutoff — keep only the live prefix
    nz = np.nonzero(w)[0]
    cut = int(nz[-1]) + 1 if nz.size else 1
    return w[:cut + 1], bs, amd


def fast_nl_means_denoising(img: np.ndarray, h: float = 10.0,
                            template_window: int = 7,
                            search_window: int = 21,
                            norm_type: str = "l2") -> np.ndarray:
    """``cv2.fastNlMeansDenoising`` — BIT-EXACT (0/24 fuzz gray over
    h∈[3,25], t∈{3,5,7}, s∈{9,15,21} on realistic noisy images; 0-LSB
    multichannel fuzz for cn∈{2,3,4} in tests/test_nlmeans.py).

    ``img`` is ``[H,W]`` or ``[H,W,C]`` with C∈{1,2,3,4} — cv2 treats
    the channels as VECTOR pixels: one joint SSD (summed over channels)
    drives a shared weight applied to every channel.  Pinned model:
    REFLECT_101 pad by (s+t)//2·…; integer patch SSD over the t×t
    template; index = SSD >> bin_shift (2^bin_shift = nearest pow-2 ≥
    t²); weight LUT ``round(FPM·exp(−SSD·scale/(h²·cn)))`` — the
    denominator is h²·cn, NOT h²·t² — with FPM = INT_MAX//(s²·255)
    (no cn factor; see _nlm_weight_lut) and weights below 0.001·FPM
    zeroed; result per channel
    ``(Σw·v + Σw/2) // Σw``."""
    if img.dtype == np.uint16 and norm_type != "l1":
        raise TypeError("16-bit fastNlMeansDenoising requires norm_type='l1' (like cv2)")
    if img.dtype not in (np.uint8, np.uint16):
        raise TypeError("fastNlMeansDenoising requires uint8 (or uint16 with L1) input")
    t, s = int(template_window), int(search_window)
    if t % 2 == 0 or s % 2 == 0:
        raise ValueError("window sizes must be odd")
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    cn = img.shape[2]
    if cn not in (1, 2, 3, 4):
        raise ValueError(f"fastNlMeansDenoising supports 1-4 channels, got {cn}")
    H, W = img.shape[:2]
    th, sh = t // 2, s // 2
    border = sh + th
    p = np.pad(img.astype(np.int64), ((border, border), (border, border), (0, 0)),
               mode="reflect")
    if norm_type not in ("l1", "l2"):
        raise ValueError(f"norm_type must be 'l1' or 'l2', got {norm_type!r}")
    maxval = 65535 if img.dtype == np.uint16 else 255
    w, bs, _ = _nlm_weight_lut(float(h), t, s, cn, norm=norm_type,
                               maxval=maxval)
    cut = len(w) - 1
    est = np.zeros((H, W, cn), np.int64)
    wsum = np.zeros((H, W), np.int64)
    for dy in range(-sh, sh + 1):
        for dx in range(-sh, sh + 1):
            a = p[border - th:border + H + th, border - th:border + W + th]
            b = p[border - th + dy:border + H + th + dy,
                  border - th + dx:border + W + th + dx]
            if norm_type == "l1":
                d2 = np.abs(a - b).sum(axis=2)
            else:
                d2 = ((a - b) ** 2).sum(axis=2)
            c = np.pad(d2.cumsum(0).cumsum(1), ((1, 0), (1, 0)))
            ssd = c[t:, t:] - c[:-t, t:] - c[t:, :-t] + c[:-t, :-t]
            ww = w[np.minimum(ssd >> bs, cut)]
            v = p[border + dy:border + H + dy, border + dx:border + W + dx]
            est += ww[..., None] * v
            wsum += ww
    out = (est + (wsum // 2)[..., None]) // np.maximum(wsum, 1)[..., None]
    out = np.clip(out, 0, maxval).astype(img.dtype)
    return out[..., 0] if squeeze else out


def fast_nl_means_denoising_multi(frames, img_to_denoise_index: int,
                                  temporal_window_size: int,
                                  h: float = 3.0,
                                  template_window: int = 7,
                                  search_window: int = 21) -> np.ndarray:
    """``cv2.fastNlMeansDenoisingMulti`` — BIT-EXACT (0/108 deterministic
    fuzz over h, t, s, cn∈{1,2,3}, window sizes 3/5 in probes +
    tests/test_nlmeans.py).

    Temporal NLMeans: the search set is every spatial offset in EVERY
    frame of the temporal window (``temporal_window_size`` frames
    centred on ``img_to_denoise_index``); the template patch always
    comes from the TARGET frame, candidates from each window frame.
    Same weight LUT as the single-image op except
    FPM = INT_MAX//(T·s²·255) (search set is T·s² candidates)."""
    frames = [np.asarray(f) for f in frames]
    tw = int(temporal_window_size)
    idx = int(img_to_denoise_index)
    if tw % 2 == 0:
        raise ValueError("temporalWindowSize must be odd")
    lo = idx - tw // 2
    if lo < 0 or idx + tw // 2 >= len(frames):
        raise ValueError("temporal window exceeds the frame list")
    stack = np.stack(frames[lo:lo + tw])
    if stack.dtype != np.uint8:
        raise TypeError("fastNlMeansDenoisingMulti requires uint8 frames")
    t, s = int(template_window), int(search_window)
    if t % 2 == 0 or s % 2 == 0:
        raise ValueError("window sizes must be odd")
    squeeze = stack.ndim == 3
    if squeeze:
        stack = stack[..., None]
    T, H, W, cn = stack.shape
    if cn not in (1, 2, 3, 4):
        raise ValueError(f"supports 1-4 channels, got {cn}")
    th, sh = t // 2, s // 2
    border = sh + th
    p = np.pad(stack.astype(np.int64),
               ((0, 0), (border, border), (border, border), (0, 0)),
               mode="reflect")
    w, bs, _ = _nlm_weight_lut(float(h), t, s, cn, temporal=T)
    cut = len(w) - 1
    est = np.zeros((H, W, cn), np.int64)
    wsum = np.zeros((H, W), np.int64)
    a = p[T // 2, border - th:border + H + th, border - th:border + W + th]
    for f in range(T):
        for dy in range(-sh, sh + 1):
            for dx in range(-sh, sh + 1):
                b = p[f, border - th + dy:border + H + th + dy,
                      border - th + dx:border + W + th + dx]
                d2 = ((a - b) ** 2).sum(axis=2)
                c = np.pad(d2.cumsum(0).cumsum(1), ((1, 0), (1, 0)))
                ssd = c[t:, t:] - c[:-t, t:] - c[t:, :-t] + c[:-t, :-t]
                ww = w[np.minimum(ssd >> bs, cut)]
                v = p[f, border + dy:border + H + dy,
                      border + dx:border + W + dx]
                est += ww[..., None] * v
                wsum += ww
    out = (est + (wsum // 2)[..., None]) // np.maximum(wsum, 1)[..., None]
    out = np.clip(out, 0, 255).astype(np.uint8)
    return out[..., 0] if squeeze else out


def fast_nl_means_denoising_colored_multi(frames, img_to_denoise_index: int,
                                          temporal_window_size: int,
                                          h: float = 3.0,
                                          h_color: float = 3.0,
                                          template_window: int = 7,
                                          search_window: int = 21,
                                          order: str = "rgb") -> np.ndarray:
    """``cv2.fastNlMeansDenoisingColoredMulti`` — BIT-EXACT: every frame
    converted with the LINEAR-RGB Lab variant, temporal-multi on L with
    ``h``, temporal-multi on the (a,b) 2-channel vector pairs with
    ``h_color``, target converted back (same composition as the
    single-image Colored op, fuzz-pinned in tests/test_nlmeans.py)."""
    labs = [rgb_to_lab(np.asarray(f), order=order, srgb=False) for f in frames]
    l = fast_nl_means_denoising_multi(
        [x[..., 0] for x in labs], img_to_denoise_index, temporal_window_size,
        h, template_window, search_window)
    ab = fast_nl_means_denoising_multi(
        [np.ascontiguousarray(x[..., 1:3]) for x in labs],
        img_to_denoise_index, temporal_window_size,
        h_color, template_window, search_window)
    return lab_to_rgb(np.dstack([l, ab]), order=order, srgb=False)


def fast_nl_means_denoising_colored(img: np.ndarray, h: float = 3.0,
                                    h_color: float = 3.0,
                                    template_window: int = 7,
                                    search_window: int = 21,
                                    order: str = "rgb") -> np.ndarray:
    """``cv2.fastNlMeansDenoisingColored`` — BIT-EXACT (pinned
    decomposition, 0-LSB fuzz in tests/test_nlmeans.py).

    cv2's exact composition (probed 2026-08-17): convert with the
    LINEAR-RGB Lab variant (COLOR_LBGR2Lab — no sRGB gamma stage),
    denoise L alone with ``h``, denoise the (a,b) pair as one
    2-channel vector image with ``h_color`` (joint SSD, shared
    weights), then COLOR_Lab2LBGR back.  All three stages reuse this
    module's exhaustively-pinned primitives."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[-1] != 3:
        raise TypeError("fastNlMeansDenoisingColored requires uint8 [H,W,3]")
    lab = rgb_to_lab(img, order=order, srgb=False)
    l = fast_nl_means_denoising(lab[..., 0], h, template_window, search_window)
    ab = fast_nl_means_denoising(np.ascontiguousarray(lab[..., 1:3]), h_color,
                                 template_window, search_window)
    return lab_to_rgb(np.dstack([l, ab]), order=order, srgb=False)


def sep_filter2d(img: np.ndarray, kernel_x, kernel_y, delta: float = 0.0) -> np.ndarray:
    """``cv2.sepFilter2D(img, -1, kx, ky, delta)`` ≡ ``filter2d`` with
    the outer product ``ky⊗kx`` (probe: 27/40 bitwise across dtypes,
    rest within one f32 ulp / ±1 — cv2's separable two-pass rounds the
    same way up to association)."""
    kx = np.asarray(kernel_x, np.float64).ravel()
    ky = np.asarray(kernel_y, np.float64).ravel()
    return filter2d(img, np.outer(ky, kx), delta)


def calc_back_project(img: np.ndarray, hist, scale: float = 1.0) -> np.ndarray:
    """``cv2.calcBackProject([img],[0],hist,[0,256],scale)`` — exact:
    bin = v·bins/256 (integer), out = saturate(round(hist[bin]·scale))."""
    if img.dtype != np.uint8:
        raise TypeError("calcBackProject (this port) requires uint8 input")
    h = np.asarray(hist, np.float64).ravel()
    bins = len(h)
    idx = (img.astype(np.int64) * bins) // 256
    return np.clip(np.round(h[idx] * float(scale)), 0, 255).astype(np.uint8)


def box_filter(img: np.ndarray, ksize=3, normalize: bool = True) -> np.ndarray:
    """``cv2.boxFilter``: ``normalize=True`` is exactly ``box_blur``;
    ``normalize=False`` returns the RAW window sums (cv2's CV_32S for
    integer inputs, f32 for float — exact; REFLECT_101 border)."""
    if normalize:
        return box_blur(img, ksize)
    kind = _img_kind(img, allow_i16=True)
    kh, kw = (int(ksize[0]), int(ksize[1])) if isinstance(ksize, (tuple, list)) \
        else (int(ksize), int(ksize))
    p = np.pad(img.astype(np.float64 if kind == "f32" else np.int64),
               ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)),
               mode="reflect")
    H, W = img.shape
    s = sum(p[i:i + H] for i in range(kh))
    s = sum(s[:, j:j + W] for j in range(kw))
    return s.astype(np.float32 if kind == "f32" else np.int32)


def get_structuring_element(shape: str, ksize) -> np.ndarray:
    """``cv2.getStructuringElement`` — bit-exact over a 15x15 size
    sweep.  ``shape``: rect | ellipse | cross; ``ksize`` = (rows, cols)
    row-major; default anchor (rows//2, cols//2).  Degenerate rows=1
    ellipse keeps only the anchor column (r=0 → dx=0), like cv2."""
    rows, cols = (int(ksize[0]), int(ksize[1])) if isinstance(ksize, (tuple, list)) \
        else (int(ksize), int(ksize))
    if shape == "rect":
        return np.ones((rows, cols), np.uint8)
    if shape == "cross":
        k = np.zeros((rows, cols), np.uint8)
        k[rows // 2, :] = 1
        k[:, cols // 2] = 1
        return k
    if shape == "ellipse":
        r, c = rows // 2, cols // 2
        inv = 1.0 / (r * r) if r > 0 else 0.0
        k = np.zeros((rows, cols), np.uint8)
        for i in range(rows):
            dy = i - r
            if abs(dy) <= r:
                dx = int(np.round(c * np.sqrt(max(r * r - dy * dy, 0) * inv)))
                k[i, max(c - dx, 0):min(c + dx + 1, cols)] = 1
        return k
    raise ValueError(f"unknown shape {shape!r} (rect|ellipse|cross)")


def _minmax_filter_kernel(img, kernel, op):
    """min/max filter over an arbitrary 0/1 kernel (replicate border,
    anchor kh//2 — matches cv2.erode/dilate with custom elements)."""
    kernel = np.asarray(kernel)
    kh, kw = kernel.shape
    ay, ax = kh // 2, kw // 2
    H, W = img.shape
    p = np.pad(img, ((ay, kh - 1 - ay), (ax, kw - 1 - ax)), mode="edge")
    red = np.minimum if op == "min" else np.maximum
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            if kernel[dy, dx]:
                v = p[dy:dy + H, dx:dx + W]
                acc = v.copy() if acc is None else red(acc, v)
    if acc is None:
        return img.copy()
    return acc


def gabor_kernel(ksize, sigma: float, theta: float, lambd: float,
                 gamma: float = 1.0, psi: float = np.pi / 2) -> np.ndarray:
    """``cv2.getGaborKernel`` (f64) — the standard Gabor formula;
    ``ksize`` = (rows, cols) row-major."""
    rows, cols = (int(ksize[0]), int(ksize[1])) if isinstance(ksize, (tuple, list)) \
        else (int(ksize), int(ksize))
    # cv2 bumps even sizes to the enclosing odd kernel (2*(k//2)+1) and
    # writes kernel[ymax−y, xmax−x] — i.e. the grid runs POSITIVE→
    # NEGATIVE (the cosine phase is odd in xr, so the flip matters)
    ymax, xmax = rows // 2, cols // 2
    y, x = np.mgrid[ymax:-ymax - 1:-1, xmax:-xmax - 1:-1]
    xr = x * np.cos(theta) + y * np.sin(theta)
    yr = -x * np.sin(theta) + y * np.cos(theta)
    ex = np.exp(-(xr * xr + gamma * gamma * yr * yr) / (2 * sigma * sigma))
    return (ex * np.cos(2 * np.pi * xr / lambd + psi)).astype(np.float64)


def corner_harris(img: np.ndarray, block_size: int = 2, ksize: int = 3,
                  k: float = 0.04) -> np.ndarray:
    """``cv2.cornerHarris`` — float32 response at f32-ulp tolerance
    (3e-7 rel): Sobel dx/dy scaled by ``1/(2^(ksize-1)·block·255)``,
    unnormalized block sums of the products, ``det − k·trace²``."""
    if img.dtype != np.uint8:
        raise TypeError("cornerHarris (this port) requires uint8 input")
    dx = sobel(img.astype(np.float32), 1, 0, ksize).astype(np.float64)
    dy = sobel(img.astype(np.float32), 0, 1, ksize).astype(np.float64)
    sc = 1.0 / ((1 << (ksize - 1)) * block_size * 255)
    dx *= sc
    dy *= sc
    cxx = box_filter(((dx * dx).astype(np.float32)), block_size, normalize=False).astype(np.float64)
    cyy = box_filter(((dy * dy).astype(np.float32)), block_size, normalize=False).astype(np.float64)
    cxy = box_filter(((dx * dy).astype(np.float32)), block_size, normalize=False).astype(np.float64)
    return (cxx * cyy - cxy * cxy - k * (cxx + cyy) ** 2).astype(np.float32)


def psnr(a: np.ndarray, b: np.ndarray, max_val: float = 255.0) -> float:
    """``cv2.PSNR`` — 10·log10(R²/MSE) in f64 (inf on identical
    inputs, like cv2)."""
    if a.shape != b.shape:
        raise ValueError("inputs must share shape")
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float((d * d).mean())
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val * max_val / mse))


def norm(a: np.ndarray, norm_type: str = "l2", b: np.ndarray = None) -> float:
    """``cv2.norm(a[, b])`` — L1 | L2 | inf in f64, exact (pairwise
    form computes the norm of a−b)."""
    x = a.astype(np.float64)
    if b is not None:
        if a.shape != b.shape:
            raise ValueError("inputs must share shape")
        x = x - b.astype(np.float64)
    if norm_type == "l1":
        return float(np.abs(x).sum())
    if norm_type == "l2":
        return float(np.sqrt((x * x).sum()))
    if norm_type == "inf":
        return float(np.abs(x).max())
    raise ValueError(f"unknown norm {norm_type!r} (l1|l2|inf)")


# ---------------------------------------------------------------------------
# XYZ / Lab color spaces (cv2.cvtColor extensions)
# ---------------------------------------------------------------------------

_XYZ_FWD = np.array([[0.412453, 0.357580, 0.180423],
                     [0.212671, 0.715160, 0.072169],
                     [0.019334, 0.119193, 0.950227]])
_XYZ_INV = np.array([[3.240479, -1.537150, -0.498535],
                     [-0.969256, 1.875992, 0.041556],
                     [0.055648, -0.204043, 1.057311]])
_LAB_WHITE = np.array([0.950456, 1.0, 1.088754])


def rgb_to_xyz(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(RGB2XYZ)`` — u8 bit-exact (coefficients at 2^12,
    half-up shift; probe 0 diff); f32 = the plain matrix product."""
    if img.shape[-1] != 3:
        raise ValueError("expected [..,3] color image")
    rgb = img[..., ::-1] if order == "bgr" else img
    if img.dtype == np.float32:
        return (rgb.astype(np.float64) @ _XYZ_FWD.T).astype(np.float32)
    if img.dtype != np.uint8:
        raise TypeError("rgb_to_xyz supports uint8/float32")
    C = np.round(_XYZ_FWD * 4096).astype(np.int64)
    r = rgb.astype(np.int64)
    out = np.stack([(r[..., 0] * C[k, 0] + r[..., 1] * C[k, 1]
                     + r[..., 2] * C[k, 2] + 2048) >> 12 for k in range(3)], -1)
    return np.clip(out, 0, 255).astype(np.uint8)


def xyz_to_rgb(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(XYZ2RGB)`` — u8 bit-exact (2^12 fixed point)."""
    if img.shape[-1] != 3:
        raise ValueError("expected [..,3] color image")
    if img.dtype == np.float32:
        out = (img.astype(np.float64) @ _XYZ_INV.T).astype(np.float32)
    elif img.dtype == np.uint8:
        C = np.round(_XYZ_INV * 4096).astype(np.int64)
        r = img.astype(np.int64)
        out = np.stack([(r[..., 0] * C[k, 0] + r[..., 1] * C[k, 1]
                         + r[..., 2] * C[k, 2] + 2048) >> 12 for k in range(3)], -1)
        out = np.clip(out, 0, 255).astype(np.uint8)
    else:
        raise TypeError("xyz_to_rgb supports uint8/float32")
    return out[..., ::-1] if order == "bgr" else out


# cv2's RGB<->Lab u8 fixed point (color_lab.cpp semantics), pinned
# EXHAUSTIVELY bit-exact against cv2 5.0 — every one of the 256^3 inputs
# in BOTH directions measures 0 LSB (round-3 probes).  Scales:
# gamma tab at 255*2^3 = 2040, cube-root tab at 2^15 over 3072 entries,
# XYZ coeffs at 2^12 whitepoint-folded, inverse at BASE = 2^14.
_LAB_C_FWD = np.array([[1777, 1541, 778],     # round(M/WP[:,None] * 4096)
                       [871, 2929, 296],
                       [73, 448, 3575]], np.int64)
_LAB_C_INV = np.array([[12615, -6296, -2223],  # round(inv(M)*WP[None,:]*4096)
                       [-3773, 7684, 185],
                       [217, -836, 4715]], np.int64)
_LAB_TABS = None


def _trunc_div(a, b):
    """C-style truncating integer division (negative dividends)."""
    q = np.abs(a) // b
    return np.where(a < 0, -q, q)


def _lab_tabs():
    global _LAB_TABS
    if _LAB_TABS is not None:
        return _LAB_TABS
    BASE = 1 << 14
    # sRGB gamma-expand table at scale 2040 (f64 build matches cv2's
    # softdouble build on every entry — exhaustive sweep)
    i = np.arange(256) / 255.0
    g = np.where(i <= 0.04045, i / 12.92, ((i + 0.055) / 1.055) ** 2.4)
    gamma_b = np.round(g * 2040).astype(np.int64)
    # cube-root tab at 2^15; entries 49/628 sit ~1e-4 from a .5 tie and
    # cv2's softdouble cbrt lands on the other side — pinned empirically
    # (the ONLY two of 3072 entries where f64 disagrees; flipping them
    # takes the exhaustive LRGB2Lab sweep from 541 bad pixels to 0)
    x = np.arange(3072) / 2040.0
    f = np.where(x > 0.008856, np.cbrt(x), 7.787 * x + 16.0 / 116.0)
    cbrt_b = np.round(f * (1 << 15)).astype(np.int64)
    cbrt_b[49] -= 1
    cbrt_b[628] += 1
    # inverse: y and f(y) per L (LabToYF_b)
    L = np.arange(256) * 100.0 / 255.0
    lth = 0.008856 * 903.3
    y_t = np.where(L <= lth, L / 903.3, ((L + 16.0) / 116.0) ** 3)
    ify_t = np.where(L <= lth, 7.787 * (L / 903.3) + 16.0 / 116.0,
                     (L + 16.0) / 116.0)
    y_b = np.round(y_t * BASE).astype(np.int64)
    ify_b = np.round(ify_t * BASE).astype(np.int64)
    # a/b offsets at BASE scale (cv2's shift-multiply approximations)
    ab = np.arange(256, dtype=np.int64)
    adiv = ((5 * ab * 53687 + (1 << 7)) >> 13) - 128 * BASE // 500
    bdiv = ((ab * 41943 + (1 << 4)) >> 9) - 128 * BASE // 200 + 1
    # f^-1 tab over ifxz in [-8145, -8145 + 9*BASE/4): linear branch is
    # TRUNCATING i*108/841 (not rounded!), cube is ((i*i)/B)*i/B truncating
    minab = -8145
    iv = np.arange(minab, minab + 9 * BASE // 4, dtype=np.int64)
    thresh = int(np.round(6.0 / 29.0 * BASE))
    lin = _trunc_div(iv * 108, 841) - (BASE * 16 * 108) // (116 * 841)
    cube = _trunc_div(_trunc_div(iv * iv, BASE) * iv, BASE)
    abxz = np.where(iv <= thresh, lin, cube)
    # inverse sRGB gamma table: 4096 entries -> u8
    u = np.arange(4096) / 4096.0
    ig = np.where(u <= 0.0031308, 12.92 * u, 1.055 * u ** (1 / 2.4) - 0.055)
    invg = np.clip(np.round(ig * 255.0), 0, 255).astype(np.int64)
    _LAB_TABS = (gamma_b, cbrt_b, y_b, ify_b, adiv, bdiv, minab, abxz, invg)
    return _LAB_TABS


_LUV_TABS = None
# cv2's D65 whitepoint (color_lab.cpp softfloat constants)
_LUV_XN, _LUV_ZN = 0.950456, 1.088754
_LUV_UN = 4 * _LUV_XN / (_LUV_XN + 15 + 3 * _LUV_ZN)
_LUV_VN = 9 / (_LUV_XN + 15 + 3 * _LUV_ZN)


def _luv_fwd_f64(rgb01):
    """Exact f64 sRGB->Luv (cv2's formulas/whitepoint): L in [0,100],
    u in [-134,220], v in [-140,122]."""
    x = np.asarray(rgb01, np.float64)
    g = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    r_, g_, b_ = g[..., 0], g[..., 1], g[..., 2]
    X = 0.412453 * r_ + 0.357580 * g_ + 0.180423 * b_
    Y = 0.212671 * r_ + 0.715160 * g_ + 0.072169 * b_
    Z = 0.019334 * r_ + 0.119193 * g_ + 0.950227 * b_
    L = np.where(Y > 0.008856, 116 * np.cbrt(Y) - 16, 903.3 * Y)
    d = X + 15 * Y + 3 * Z
    with np.errstate(divide="ignore", invalid="ignore"):
        up = np.where(d > 0, 4 * X / d, 0.0)
        vp = np.where(d > 0, 9 * Y / d, 0.0)
    return np.stack([L, 13 * L * (up - _LUV_UN), 13 * L * (vp - _LUV_VN)], -1)


# in-gamut u'/v' ranges over the sRGB cube (computed from the forward
# grid; clamping here reproduces the saturation cv2's integer inverse
# tables apply to out-of-gamut dark pixels)
_LUV_UP_RANGE = (0.1250000109241298, 0.4507042715242644)
_LUV_VP_RANGE = (0.15789450654274712, 0.5625000491585843)


def _luv_inv_f64(luv, clamp_gamut: bool = False):
    """Exact f64 Luv->sRGB (cv2's inverse matrix and gamma).
    ``clamp_gamut`` clips u'/v' into the sRGB gamut range — the u8 path
    uses it to mirror cv2's saturating integer inverse tables."""
    luv = np.asarray(luv, np.float64)
    L, u, v = luv[..., 0], luv[..., 1], luv[..., 2]
    Y = np.where(L > 8.0, ((L + 16) / 116) ** 3, L / 903.3)
    with np.errstate(divide="ignore", invalid="ignore"):
        up = np.nan_to_num(u / (13 * L)) + _LUV_UN
        vp = np.nan_to_num(v / (13 * L)) + _LUV_VN
        if clamp_gamut:
            up = np.clip(up, *_LUV_UP_RANGE)
            vp = np.clip(vp, *_LUV_VP_RANGE)
        X = 2.25 * Y * up / vp
        Z = Y * (3 - 0.75 * up - 5 * vp) / vp
    X = np.nan_to_num(X)
    Z = np.nan_to_num(Z)
    r_ = 3.240479 * X - 1.53715 * Y - 0.498535 * Z
    g_ = -0.969256 * X + 1.875991 * Y + 0.041556 * Z
    b_ = 0.055648 * X - 0.204043 * Y + 1.057311 * Z
    rgb = np.stack([r_, g_, b_], -1)
    rgb = np.clip(rgb, 0.0, None)
    return np.where(rgb <= 0.0031308, 12.92 * rgb,
                    1.055 * np.maximum(rgb, 1e-12) ** (1 / 2.4) - 0.055)


def _luv_u8_tabs():
    """cv2's packed RGB2Luv_b trilinear machinery, structure pinned by
    constraint recovery (docs/PARITY.md "Luv"):

    * input tab ``cx = round(v*16384/255)`` (linear in v — the 33-cube
      grid lives in sRGB space, gamma is INSIDE the grid values);
    * cell = cx>>9, fraction = cx & 511 (9-bit, NOT the 16-level
      trilinearLUT granularity);
    * staged per-axis interpolation ``((512-f)*a + f*b + r) >> 9``;
    * per-channel post: L truncates (``val >> 6``), u/v round
      (``(val+32) >> 6``).

    Grid = round(packed_f64 * 64) + per-channel calibration offsets
    (+2, -7, +3) pinned against cv2 (the softfloat LUT build's
    per-entry residue remains: +-1 LSB on <=3.5 % / 1.1 % / 1.5 % px).
    Returns (tab, T) with T int32 ``(33, 33, 33, 3)``."""
    global _LUV_TABS
    if _LUV_TABS is not None:
        return _LUV_TABS
    g1 = np.arange(33) / 32.0
    R, G, B = np.meshgrid(g1, g1, g1, indexing="ij")
    luv = _luv_fwd_f64(np.stack([R, G, B], -1))
    TL = np.round(luv[..., 0] * (255.0 / 100.0) * 64) + 2
    Tu = np.round((luv[..., 1] + 134.0) * (255.0 / 354.0) * 64) - 7
    Tv = np.round((luv[..., 2] + 140.0) * (255.0 / 262.0) * 64) + 3
    T = np.stack([TL, Tu, Tv], -1).astype(np.int32)
    tab = np.rint(np.arange(256) * 16384 / 255).astype(np.int32)
    _LUV_TABS = (tab, T)
    return _LUV_TABS


def rgb_to_luv(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(RGB2Luv)``.

    * uint8: cv2's packed trilinear path (``_luv_u8_tabs``) — +-1 LSB
      on <=3.5 % (L) / 1.1 % (u) / 1.5 % (v) of pixels, never more
      (the softfloat grid-build residue; structure pinned exactly).
    * float32: the f64-emulated float path — cv2's own f32
      transcendentals sit ~1e-4 relative away."""
    if order not in ("rgb", "bgr"):
        raise ValueError(f"unknown channel order {order!r}")
    img = img[..., ::-1] if order == "bgr" else img
    if img.dtype == np.float32:
        return _luv_fwd_f64(img).astype(np.float32)
    if img.dtype != np.uint8:
        raise TypeError("rgb_to_luv requires uint8 or float32 [..,3]")
    tab, T = _luv_u8_tabs()
    c = tab[img.astype(int)]
    t, f = c >> 9, (c & 511).astype(np.int64)
    t1 = np.minimum(t + 1, 32)
    out = np.empty(img.shape, np.uint8)
    for ch, (r, p) in enumerate(((256, 0), (0, 32), (256, 32))):
        Tch = T[..., ch].astype(np.int64)
        C = {}
        for dp, ix in ((0, t[..., 0]), (1, t1[..., 0])):
            for dq, iy in ((0, t[..., 1]), (1, t1[..., 1])):
                for dr, iz in ((0, t[..., 2]), (1, t1[..., 2])):
                    C[dp, dq, dr] = Tch[ix, iy, iz]
        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        m = {}
        for dq in (0, 1):
            for dr in (0, 1):
                m[dq, dr] = ((512 - fx) * C[0, dq, dr] + fx * C[1, dq, dr] + r) >> 9
        my0 = ((512 - fy) * m[0, 0] + fy * m[1, 0] + r) >> 9
        my1 = ((512 - fy) * m[0, 1] + fy * m[1, 1] + r) >> 9
        val = ((512 - fz) * my0 + fz * my1 + r) >> 9
        out[..., ch] = np.clip((val + p) >> 6, 0, 255).astype(np.uint8)
    return out


def luv_to_rgb(img: np.ndarray, order: str = "rgb") -> np.ndarray:
    """``cv2.cvtColor(Luv2RGB)``.

    * uint8: unpack + f64 float-path with IN-GAMUT u'/v' clamping
      (mirrors cv2's saturating integer inverse tables) + round —
      +-1 LSB with >1 on <=0.2 % px (worst ~30, at isolated dark
      out-of-gamut boundary triples where both outputs clamp garbage;
      40k-config soak calibration).
    * float32: f64-emulated float path (~1e-4 relative)."""
    if order not in ("rgb", "bgr"):
        raise ValueError(f"unknown channel order {order!r}")
    if img.dtype == np.float32:
        rgb = _luv_inv_f64(img).astype(np.float32)
    elif img.dtype == np.uint8:
        L = img[..., 0].astype(np.float64) * (100.0 / 255.0)
        u = img[..., 1].astype(np.float64) * (354.0 / 255.0) - 134.0
        v = img[..., 2].astype(np.float64) * (262.0 / 255.0) - 140.0
        rgb01 = _luv_inv_f64(np.stack([L, u, v], -1), clamp_gamut=True)
        rgb = np.clip(np.round(rgb01 * 255.0), 0, 255).astype(np.uint8)
    else:
        raise TypeError("luv_to_rgb requires uint8 or float32 [..,3]")
    return rgb[..., ::-1] if order == "bgr" else rgb


def rgb_to_lab(img: np.ndarray, order: str = "rgb", srgb: bool = True) -> np.ndarray:
    """``cv2.cvtColor(RGB2LAB)`` — u8 BIT-EXACT, verified on ALL 2^24
    inputs (0 LSB; round-3 exhaustive probe; ``srgb=False`` ==
    COLOR_LRGB2LAB, also exhaustive-exact).

    float32 input ([0,1] RGB like cv2): the analytic CIE formulas in
    f64, cast f32.  DELIBERATE deviation: cv2's f32 forward runs a
    coarsely-interpolated int16 LUT (knots every 1/512, output
    staircase ~9/64 L-units — probed) whose own error vs true Lab
    reaches ~0.6; we return the accurate value instead (≤8e-3 of
    exact, the LUT's grid-point quantum).  The u8 path matches cv2
    bitwise because there the LUT IS the contract.

    cv2's fixed point: gamma-expand through the 2040-scale table (or
    ``i*8`` linear), XYZ at 2^12 whitepoint-folded coeffs with
    half-up descale, cube-root table at 2^15, then
    ``L = (296*fY - 1336934 + 2^14) >> 15``,
    ``a/b = (500/200*(fX-fY/fY-fZ) + 128*2^15 + 2^14) >> 15``."""
    if img.shape[-1] != 3:
        raise TypeError("rgb_to_lab requires [..,3]")
    rgb = img[..., ::-1] if order == "bgr" else img
    if img.dtype == np.float32:
        r = rgb.astype(np.float64)
        if srgb:
            r = np.where(r > 0.04045, ((r + 0.055) / 1.055) ** 2.4, r / 12.92)
        xyz = (r @ _XYZ_FWD.T) / _LAB_WHITE
        f = np.where(xyz > 0.008856, np.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
        fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
        L = np.where(xyz[..., 1] > 0.008856, 116.0 * fy - 16.0,
                     903.3 * xyz[..., 1])
        return np.stack([L, 500.0 * (fx - fy), 200.0 * (fy - fz)],
                        -1).astype(np.float32)
    if img.dtype != np.uint8:
        raise TypeError("rgb_to_lab requires uint8 or float32 [..,3]")
    gamma_b, cbrt_b = _lab_tabs()[:2]
    c = rgb.astype(np.int64)
    if srgb:
        R, G, B = gamma_b[c[..., 0]], gamma_b[c[..., 1]], gamma_b[c[..., 2]]
    else:
        R, G, B = c[..., 0] << 3, c[..., 1] << 3, c[..., 2] << 3
    C = _LAB_C_FWD
    fX = cbrt_b[np.clip((R * C[0, 0] + G * C[0, 1] + B * C[0, 2] + 2048) >> 12,
                        0, 3071)]
    fY = cbrt_b[np.clip((R * C[1, 0] + G * C[1, 1] + B * C[1, 2] + 2048) >> 12,
                        0, 3071)]
    fZ = cbrt_b[np.clip((R * C[2, 0] + G * C[2, 1] + B * C[2, 2] + 2048) >> 12,
                        0, 3071)]
    Lscale = (116 * 255 + 50) // 100
    Lshift = -((16 * 255 * (1 << 15) + 50) // 100)
    L = (Lscale * fY + Lshift + (1 << 14)) >> 15
    a = (500 * (fX - fY) + 128 * (1 << 15) + (1 << 14)) >> 15
    b = (200 * (fY - fZ) + 128 * (1 << 15) + (1 << 14)) >> 15
    return np.stack([np.clip(L, 0, 255), np.clip(a, 0, 255),
                     np.clip(b, 0, 255)], -1).astype(np.uint8)


def lab_to_rgb(img: np.ndarray, order: str = "rgb", srgb: bool = True) -> np.ndarray:
    """``cv2.cvtColor(LAB2RGB)`` — u8 BIT-EXACT, verified on ALL 2^24
    inputs (0 LSB; round-3 exhaustive probe); float32 = the analytic
    float inverse (probed ≤9e-5 vs cv2, which clips to [0,1]).

    cv2's integer inverse: per-L y/f(y) tables at BASE=2^14, shift-mul
    a/b offsets, the f^-1 table (truncating linear branch i*108/841 —
    the one formula where cv2 truncates instead of rounding — and
    truncating integer cube), XYZ->RGB at 2^12, inverse-gamma through
    the 4096-entry table."""
    if img.shape[-1] != 3:
        raise TypeError("lab_to_rgb requires [..,3]")
    if img.dtype == np.float32:
        # cv2's f32 inverse is the analytic float path (probed 9e-5)
        L = img[..., 0].astype(np.float64)
        a = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        fy = (L + 16.0) / 116.0
        fx, fz = fy + a / 500.0, fy - b / 200.0

        def fi(t):
            return np.where(t ** 3 > 0.008856, t ** 3,
                            (t - 16.0 / 116.0) / 7.787)

        x = fi(fx) * _LAB_WHITE[0]
        y = np.where(L > 8.0, fy ** 3, L / 903.3)
        z = fi(fz) * _LAB_WHITE[2]
        rgb = np.clip(np.stack([x, y, z], -1) @ _XYZ_INV.T, 0, None)
        if srgb:
            rgb = np.where(rgb > 0.0031308,
                           1.055 * rgb ** (1 / 2.4) - 0.055, 12.92 * rgb)
        out = np.clip(rgb, 0, 1).astype(np.float32)
        return out[..., ::-1] if order == "bgr" else out
    if img.dtype != np.uint8:
        raise TypeError("lab_to_rgb requires uint8 or float32 [..,3]")
    (_, _, y_b, ify_b, adiv, bdiv, minab, abxz, invg) = _lab_tabs()
    LL = img[..., 0].astype(np.int64)
    aa = img[..., 1].astype(np.int64)
    bb = img[..., 2].astype(np.int64)
    y = y_b[LL]
    ify = ify_b[LL]
    n_ab = abxz.shape[0]
    x = abxz[np.clip(ify + adiv[aa] - minab, 0, n_ab - 1)]
    z = abxz[np.clip(ify - bdiv[bb] - minab, 0, n_ab - 1)]
    C = _LAB_C_INV
    out = np.empty((*img.shape[:-1], 3), np.int64)
    for k in range(3):
        v = (C[k, 0] * x + C[k, 1] * y + C[k, 2] * z + (1 << 13)) >> 14
        if srgb:
            out[..., k] = invg[np.clip(v, 0, 4095)]
        else:
            # linear output truncates: (v*255) >> 12 (exhaustive-exact)
            out[..., k] = (np.clip(v, 0, 4095) * 255) >> 12
    out = out.astype(np.uint8)
    return out[..., ::-1] if order == "bgr" else out


# ---------------------------------------------------------------------------
# cv2.photo domain-transform family (Gastal & Oliveira's domain transform;
# cv2's npr.hpp Domain_Filter) — pinned empirically 2026-08-17:
#   * edgePreservingFilter(RECURS_FILTER):  BIT-EXACT (19/20 fuzz configs
#     0 LSB; 1 config had a single ±1 px — a powf ulp amplified through
#     the recursion).  The whole chain is plain f32: I/255, L1 channel
#     sums of the forward differences, dHdx = 1 + (σs/σr)·ΣΔ,
#     a = exp(−√2/σH_i) with σH_i = σs·√3·2^(N−1−i)/√(4^N−1), V = a^dHdx,
#     and the two-direction recursion J += V·(J_prev − J) run
#     horizontally then vertically, 3 iterations.
#   * edgePreservingFilter(NORMCONV_FILTER): the transformed-domain box
#     (SAT + searchsorted bounds at radius σH·√3) matches within ±1 on
#     ~3 % px (cv2's incremental sliding sums accumulate different f32
#     rounding than our SAT differences — all bound/dtype variants
#     probed identical).
#   * detailEnhance: f32 BGR2Lab, L/255 (cv2 scales by 1/255 even
#     though L spans 0..100 — a pinned quirk), RECURS filter on L,
#     L' = res + 3·(L − res), Lab2BGR — bit-exact when run with cv2's
#     own f32 Lab legs; with THIS repo's analytic f32 Lab the budget is
#     ±3 on ~16 % px (the documented f32-Lab interpolated-LUT
#     deviation, docs/PARITY.md).
#   * stylization: NORMCONV filter, then mag = 1 − Σ_c |∇(res_c)|
#     (Sobel-3 magnitudes), out = res·mag — composition pinned (3 px ±1
#     on the probe, all inherited from the NC stage).
# ---------------------------------------------------------------------------

def _dt_derivatives(I: np.ndarray, sigma_s: float, sigma_r: float):
    f32 = np.float32
    dIx = np.abs(np.diff(I, axis=1)).sum(-1)
    dIy = np.abs(np.diff(I, axis=0)).sum(-1)
    ratio = f32(sigma_s / sigma_r)
    dHdx = (f32(1.0) + ratio * dIx).astype(f32)
    dVdy = (f32(1.0) + ratio * dIy).astype(f32)
    return dHdx, dVdy


def _dt_sigma_h(sigma_s: float, i: int, n: int) -> float:
    return float(sigma_s * np.sqrt(3.0) * (2.0 ** (n - i - 1))
                 / np.sqrt(4.0 ** n - 1))


def _dt_rf(J: np.ndarray, dHdx: np.ndarray, dVdy: np.ndarray,
           sigma_s: float, iters: int = 3) -> np.ndarray:
    """The recursive (RF) domain-transform filter on f32 [H,W,C]."""
    f32 = np.float32
    J = J.copy()
    H, W, _ = J.shape
    for i in range(iters):
        a = np.exp(-np.sqrt(2.0) / _dt_sigma_h(sigma_s, i, iters))
        Vx = np.power(f32(a), dHdx).astype(f32)
        Vy = np.power(f32(a), dVdy).astype(f32)
        for x in range(1, W):
            J[:, x] += Vx[:, x - 1, None] * (J[:, x - 1] - J[:, x])
        for x in range(W - 2, -1, -1):
            J[:, x] += Vx[:, x, None] * (J[:, x + 1] - J[:, x])
        for y in range(1, H):
            J[y] += Vy[y - 1, :, None] * (J[y - 1] - J[y])
        for y in range(H - 2, -1, -1):
            J[y] += Vy[y, :, None] * (J[y + 1] - J[y])
        J = J.astype(f32)
    return J


def _dt_nc(J: np.ndarray, dHdx: np.ndarray, dVdy: np.ndarray,
           sigma_s: float, iters: int = 3) -> np.ndarray:
    """The normalized-convolution (NC) domain-transform filter."""
    f32 = np.float32
    H, W, C = J.shape
    ctH = np.concatenate([np.zeros((H, 1), f32),
                          np.cumsum(dHdx, 1, dtype=f32)], 1).astype(f32)
    ctV = np.concatenate([np.zeros((1, W), f32),
                          np.cumsum(dVdy, 0, dtype=f32)], 0).astype(f32)

    def ncpass(J, ct, radius):
        Hh, Ww, Cc = J.shape
        out = np.empty_like(J)
        for y in range(Hh):
            pos = ct[y]
            lo = np.searchsorted(pos, (pos - radius).astype(f32), side="left")
            hi = np.minimum(
                np.searchsorted(pos, (pos + radius).astype(f32), side="left"),
                Ww)
            sat = np.concatenate([np.zeros((1, Cc), f32),
                                  np.cumsum(J[y], 0, dtype=f32)], 0)
            cnt = np.maximum(hi - lo, 1).astype(f32)
            out[y] = ((sat[hi] - sat[lo]).astype(f32) / cnt[:, None]).astype(f32)
        return out.astype(f32)

    J = J.copy()
    for i in range(iters):
        radius = f32(_dt_sigma_h(sigma_s, i, iters) * np.sqrt(3.0))
        J = ncpass(J, ctH, radius)
        J = np.swapaxes(ncpass(np.swapaxes(J, 0, 1), ctV.T, radius), 0, 1)
    return J


def edge_preserving_filter(img: np.ndarray, flags: str = "recursive",
                           sigma_s: float = 60.0,
                           sigma_r: float = 0.4) -> np.ndarray:
    """``cv2.edgePreservingFilter`` — RECURS_FILTER bit-exact (rare ±1
    powf-ulp px); NORMCONV_FILTER ±1 on ~3 % px.  uint8 [H,W,3]."""
    _check_u8(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    if flags not in ("recursive", "normconv"):
        raise ValueError(f"flags must be 'recursive' or 'normconv', got {flags!r}")
    f32 = np.float32
    I = (img.astype(f32) * f32(1.0 / 255.0)).astype(f32)
    dHdx, dVdy = _dt_derivatives(I, sigma_s, sigma_r)
    fn = _dt_rf if flags == "recursive" else _dt_nc
    J = fn(I, dHdx, dVdy, sigma_s)
    return np.clip(np.round(J.astype(np.float64) * 255.0), 0, 255).astype(np.uint8)


def detail_enhance(img: np.ndarray, sigma_s: float = 10.0,
                   sigma_r: float = 0.15, order: str = "rgb") -> np.ndarray:
    """``cv2.detailEnhance`` — the pinned composition (f32 Lab, L/255,
    RECURS filter, L' = res + 3·(L−res)); with the analytic f32 Lab the
    budget vs cv2 is ±3 on ~16 % px (docs/PARITY.md)."""
    _check_u8(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    f32 = np.float32
    I = (img.astype(f32) * f32(1.0 / 255.0)).astype(f32)
    lab = rgb_to_lab(I, order=order)
    L = (lab[..., 0] * f32(1.0 / 255.0)).astype(f32)
    dHdx, dVdy = _dt_derivatives(L[..., None], sigma_s, sigma_r)
    res = _dt_rf(L[..., None], dHdx, dVdy, sigma_s)[..., 0]
    Lout = ((res + f32(3.0) * (L - res)) * f32(255.0)).astype(f32)
    lab2 = np.concatenate([Lout[..., None], lab[..., 1:]], -1).astype(f32)
    out = lab_to_rgb(lab2, order=order)
    return np.clip(np.round(out.astype(np.float64) * 255.0), 0, 255).astype(np.uint8)


def _dt_pen(dHdx: np.ndarray, dVdy: np.ndarray, sigma_s: float):
    """Domain-transform neighbour COUNTS (cv2 pencilSketch's pen field).

    For each pixel, the number of transformed-domain coordinates of its
    row (resp. column) within the FIRST-iteration NC radius — computed
    exactly like ``_dt_nc``'s box bounds (``searchsorted`` left on the
    f32 ct), with one pinned cv2 quirk: when a line's position 0 covers
    the whole line (``hi[0] == n``) its count is zeroed.  Pinned
    2026-08-18 by S-field interval probes + 940-config fuzz."""
    f32 = np.float32
    H = dVdy.shape[0] + 1
    W = dHdx.shape[1] + 1
    ctH = np.concatenate([np.zeros((H, 1), f32),
                          np.cumsum(dHdx, 1, dtype=f32)], 1).astype(f32)
    ctV = np.concatenate([np.zeros((1, W), f32),
                          np.cumsum(dVdy, 0, dtype=f32)], 0).astype(f32)
    radius = f32(_dt_sigma_h(sigma_s, 0, 3) * np.sqrt(3.0))

    def pen_1d(pos):
        n = pos.shape[-1]
        lo = np.searchsorted(pos, (pos - radius).astype(f32), side="left")
        hi = np.minimum(
            np.searchsorted(pos, (pos + radius).astype(f32), side="left"), n)
        cnt = (hi - lo).astype(f32)
        if hi[0] == n:
            cnt[0] = 0.0
        return cnt

    penx = np.stack([pen_1d(ctH[y]) for y in range(H)], 0)
    peny = np.stack([pen_1d(ctV[:, x]) for x in range(W)], 1)
    return (penx + peny).astype(f32)


def pencil_sketch(img: np.ndarray, sigma_s: float = 60.0,
                  sigma_r: float = 0.07, shade_factor: float = 0.02,
                  order: str = "rgb"):
    """``cv2.pencilSketch`` — ``(gray, color)`` pair.

    Pinned 2026-08-18 (S-field interval probes + 940 fuzz configs):

    * ``sk = f32(pen · sf)`` where ``pen`` is the `_dt_pen` neighbour
      count; ``gray = clip(cvRound(f32(sk · 255)))`` — the ×255 product
      rounds through f32 (229.49999… snaps to exactly 229.5 there;
      keeping it in f64 is off-by-one on such razor ties).  Bit-exact:
      0/940 configs.
    * ``color``: f32 YCrCb legs with Y replaced by the UNCLIPPED sk —
      every step a single-rounded f32 FMA (cv2's SIMD body):
      ``Y₀ = fma(B,.114, fma(G,.587, R·.299))``,
      ``Cr = fma(R−Y₀,.713,.5)``, ``Cb = fma(B−Y₀,.564,.5)``, inverse
      ``R' = fma(Cr−.5, 1.403, sk)``, ``B' = fma(Cb−.5, 1.773, sk)``,
      ``G' = fma(Cr−.5, −.714, fma(Cb−.5, −.344, sk))``, then
      ``clip(cvRound(f32(·255)))``.  Exact on cv2's SIMD body; cv2's
      scalar row tail (last ``W mod 8`` pixels) double-rounds instead
      of FMA-ing, so those pixels are ±1 and build-dependent — same
      budget class as the HLS/HSV tails (docs/PARITY.md; 3/940 configs
      showed 1–6 such tail px).
    """
    _check_u8(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    f32 = np.float32
    I = (img.astype(f32) * f32(1.0 / 255.0)).astype(f32)
    dHdx, dVdy = _dt_derivatives(I, sigma_s, sigma_r)
    pen = _dt_pen(dHdx, dVdy, sigma_s)
    sk = (pen * f32(shade_factor)).astype(f32)
    gray = np.clip(np.rint((sk * f32(255.0)).astype(f32).astype(np.float64)),
                   0, 255).astype(np.uint8)
    if order == "rgb":
        R, G, B = I[..., 0], I[..., 1], I[..., 2]
    else:
        B, G, R = I[..., 0], I[..., 1], I[..., 2]
    Y0 = _fma32(B, f32(0.114), _fma32(G, f32(0.587),
                                      (R * f32(0.299)).astype(f32)))
    Cr = _fma32(R - Y0, f32(0.713), f32(0.5))
    Cb = _fma32(B - Y0, f32(0.564), f32(0.5))
    crm = (Cr - f32(0.5)).astype(f32)
    cbm = (Cb - f32(0.5)).astype(f32)
    Rp = _fma32(crm, f32(1.403), sk)
    Gp = _fma32(crm, f32(-0.714), _fma32(cbm, f32(-0.344), sk))
    Bp = _fma32(cbm, f32(1.773), sk)
    chans = [Rp, Gp, Bp] if order == "rgb" else [Bp, Gp, Rp]
    out = np.stack(chans, -1)
    color = np.clip(np.rint((out * f32(255.0)).astype(f32).astype(np.float64)),
                    0, 255).astype(np.uint8)
    return gray, color


def stylization(img: np.ndarray, sigma_s: float = 60.0,
                sigma_r: float = 0.45) -> np.ndarray:
    """``cv2.stylization`` — NC filter + (1 − Σ|∇res|) edge darkening;
    composition pinned (±1 inherited from the NC stage's ~3 %)."""
    _check_u8(img)
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected [H,W,3], got {img.shape}")
    f32 = np.float32
    I = (img.astype(f32) * f32(1.0 / 255.0)).astype(f32)
    dHdx, dVdy = _dt_derivatives(I, sigma_s, sigma_r)
    res = _dt_nc(I, dHdx, dVdy, sigma_s)
    mag = np.zeros(res.shape[:2], f32)
    for c in range(3):
        gx = sep_filter2d(res[..., c], (-1.0, 0.0, 1.0), (1.0, 2.0, 1.0))
        gy = sep_filter2d(res[..., c], (1.0, 2.0, 1.0), (-1.0, 0.0, 1.0))
        mag += cart_to_polar(gx.astype(f32), gy.astype(f32))[0]
        mag = mag.astype(f32)
    mag = (f32(1.0) - mag).astype(f32)
    out = (res * mag[..., None]).astype(f32)
    return np.clip(np.round(out.astype(np.float64) * 255.0), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# cv2 accumulate* family (video running statistics) — pinned 2026-08-17:
# accumulate / accumulateSquare / accumulateProduct are EXACT plain f32
# (u8/u16/f32 src into an f32 accumulator, optional mask).
# accumulateWeighted's portable law is plain per-op f32
# ``acc·f32(1−α) + src·f32(α)`` — cv2's own NATIVE path matches it to
# contraction noise (16/19800 px, their -ffp-contract build), while
# cv2's DEFAULT x86 IPP dispatch deviates from cv2's own native path by
# up to ~2e-3 relative (measured ~1900 ulp!) — the IPP bits are
# unpinnable and internally inconsistent, so the native law is the
# contract.
# ---------------------------------------------------------------------------

def _acc_mask(acc, new, mask):
    if mask is None:
        return new.astype(np.float32)
    m = np.asarray(mask) != 0
    if m.ndim == acc.ndim - 1:
        m = m[..., None]
    return np.where(m, new, acc).astype(np.float32)


def accumulate(src: np.ndarray, acc: np.ndarray, mask=None) -> np.ndarray:
    """``cv2.accumulate`` — EXACT: returns ``acc + f32(src)``."""
    new = (acc + src.astype(np.float32)).astype(np.float32)
    return _acc_mask(acc, new, mask)


def accumulate_square(src: np.ndarray, acc: np.ndarray, mask=None) -> np.ndarray:
    """``cv2.accumulateSquare`` — EXACT: ``acc + f32(src)²``."""
    s = src.astype(np.float32)
    new = (acc + (s * s).astype(np.float32)).astype(np.float32)
    return _acc_mask(acc, new, mask)


def accumulate_product(src1: np.ndarray, src2: np.ndarray, acc: np.ndarray,
                       mask=None) -> np.ndarray:
    """``cv2.accumulateProduct`` — EXACT: ``acc + f32(src1)·f32(src2)``."""
    new = (acc + (src1.astype(np.float32)
                  * src2.astype(np.float32)).astype(np.float32)).astype(np.float32)
    return _acc_mask(acc, new, mask)


def accumulate_weighted(src: np.ndarray, acc: np.ndarray, alpha: float,
                        mask=None) -> np.ndarray:
    """``cv2.accumulateWeighted`` — the running average
    ``acc·f32(1−α) + src·f32(α)`` in plain per-op f32 (cv2's native
    path; its default IPP dispatch is ~2e-3 off its own native path —
    header note)."""
    f32 = np.float32
    al = f32(alpha)
    be = f32(1.0 - np.float64(alpha))
    new = ((acc * be).astype(f32)
           + (src.astype(f32) * al).astype(f32)).astype(f32)
    return _acc_mask(acc, new, mask)


def merge_mertens(images, contrast_weight: float = 1.0,
                  saturation_weight: float = 1.0,
                  exposure_weight: float = 0.0) -> np.ndarray:
    """``cv2.createMergeMertens(wcon, wsat, wexp).process(images)`` —
    exposure fusion (Mertens et al.), pinned composition (probe
    2026-08-17, ≤8e-7 abs vs cv2 on [0,1]-range outputs):

    * every frame → f32·(1/255) regardless of dtype;
    * per-frame weight = |Laplacian₁(gray)|^wcon ·
      sqrt(mean_c((I_c − mean)²))^wsat ·
      (Π_c exp(−(I_c−0.5)²/0.08))^wexp + 1e-12, normalized across
      frames — the gray uses cv2's RGB2GRAY coefficients on the array
      AS-IS (cv2 assumes RGB order; a pinned quirk);
    * Laplacian-pyramid blend with maxlevel = int(ln(min(H,W))/ln 2)
      and the cv2 pyrDown/pyrUp taps.

    Returns the fused f32 [H,W,3] (cv2's convention: roughly [0,1],
    may over/undershoot; scale by 255 and clip to display)."""
    f32 = np.float32
    ims = [np.asarray(im) for im in images]
    if not ims or any(im.ndim != 3 or im.shape[-1] != 3 for im in ims):
        raise ValueError("merge_mertens expects a list of [H,W,3] frames")
    H, W = ims[0].shape[:2]
    ims = [(im.astype(f32) * f32(1.0 / 255.0)).astype(f32) for im in ims]
    weights = []
    wsum = np.zeros((H, W), f32)
    for im in ims:
        gray = cvt_gray(im, order="rgb")
        contrast = np.abs(laplacian(gray, 1)).astype(f32)
        mean = (im.sum(-1) / f32(3.0)).astype(f32)
        sat = np.sqrt((((im - mean[..., None]) ** 2).sum(-1)
                       / f32(3.0))).astype(f32)
        expo = np.ones((H, W), f32)
        for c in range(3):
            expo = (expo * np.exp(-((im[..., c] - f32(0.5)) ** 2)
                                  / f32(0.08))).astype(f32)
        w = (np.power(contrast, f32(contrast_weight))
             * np.power(sat, f32(saturation_weight))
             * np.power(expo, f32(exposure_weight))).astype(f32) + f32(1e-12)
        weights.append(w.astype(f32))
        wsum += w
    maxlevel = int(np.log(min(H, W)) / np.log(2.0))

    def _pyr3(img, down):
        return np.stack([down(img[..., c]) for c in range(img.shape[-1])], -1) \
            if img.ndim == 3 else down(img)

    res = None
    for im, w in zip(ims, weights):
        w = (w / wsum).astype(f32)
        gp_i, gp_w = [im], [w]
        for _ in range(maxlevel):
            gp_i.append(_pyr3(gp_i[-1], pyr_down).astype(f32))
            gp_w.append(pyr_down(gp_w[-1]).astype(f32))
        for l in range(maxlevel):
            up = _pyr3(gp_i[l + 1], pyr_up)[:gp_i[l].shape[0], :gp_i[l].shape[1]]
            gp_i[l] = (gp_i[l] - up).astype(f32)
        cur = [(gp_i[l] * gp_w[l][..., None]).astype(f32)
               for l in range(maxlevel + 1)]
        res = cur if res is None else [(a + b).astype(f32)
                                       for a, b in zip(res, cur)]
    for l in range(maxlevel, 0, -1):
        up = _pyr3(res[l], pyr_up)[:res[l - 1].shape[0], :res[l - 1].shape[1]]
        res[l - 1] = (res[l - 1] + up).astype(f32)
    return res[0]


def tonemap(img: np.ndarray, gamma: float = 1.0) -> np.ndarray:
    """``cv2.createTonemap(gamma).process`` — global min/max normalize
    to [0,1] + ``pow(1/gamma)`` (pinned ≤6e-8; cv2 emits NaN where its
    own normalize divides 0/0 on constant frames — we define that case
    as zeros).  f32 ``[H,W,3]`` HDR in, f32 out."""
    f32 = np.float32
    img = np.asarray(img, f32)
    mn, mx = float(img.min()), float(img.max())
    if mx <= mn:
        return np.zeros_like(img, f32)
    x = ((img - f32(mn)) / f32(mx - mn)).astype(f32)
    return np.power(x, f32(1.0 / gamma)).astype(f32)


def _normalize_minmax_f32(img: np.ndarray, lo: float = 0.0,
                          hi: float = 1.0) -> np.ndarray:
    """``cv2.normalize(src, dst, lo, hi, NORM_MINMAX)`` on f32: f64
    ``scale = (hi-lo)/(smax-smin)``, ``shift = lo - smin*scale``, then a
    per-element single-rounded f32 FMA with the f32-cast constants
    (pinned: 0 LSB on ~92 % of random images; on the rest cv2's own
    double constants differ in the LAST BIT before the f32 cast —
    an unpinnable 1-ulp constants tier, ≤2e-7 relative)."""
    f32 = np.float32
    img = np.asarray(img, f32)
    smin, smax = float(img.min()), float(img.max())
    if not smax - smin > np.finfo(np.float64).eps:
        return np.full_like(img, f32(lo))
    scale = (hi - lo) * (1.0 / (smax - smin))
    shift = lo - smin * scale
    return _fma32(img, f32(scale), f32(shift))


def _pow_f32(x: np.ndarray, p: float) -> np.ndarray:
    """cv2's elementwise ``pow`` semantics on f32 (probed): integer
    exponents multiply (negative bases fine); fractional exponents go
    through exp/log — 0 maps to 0 and NEGATIVE bases produce NaN (the
    tonemap NaN quirk: a negative normalize residue at the global-min
    pixel NaNs that pixel).  np.power reproduces both branches."""
    f32 = np.float32
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.power(np.asarray(x, f32), f32(p)).astype(f32)


def _gray_f32(img: np.ndarray) -> np.ndarray:
    """``cv2.cvtColor(f32 RGB, COLOR_RGB2GRAY)``: the f32 BT.601 dot
    product (R*0.299 + G*0.587 + B*0.114 with cv2's f32 constants)."""
    f32 = np.float32
    return (img[..., 0] * f32(0.299) + img[..., 1] * f32(0.587)
            + img[..., 2] * f32(0.114)).astype(f32)


def tonemap_reinhard(img: np.ndarray, gamma: float = 1.0,
                     intensity: float = 0.0, light_adapt: float = 1.0,
                     color_adapt: float = 0.0) -> np.ndarray:
    """``cv2.createTonemapReinhard(...).process`` — pinned ~2e-7 vs cv2
    (structure exact; residual = the normalize constants tier and f32
    transcendental ulps):

    normalize to [0,1] -> gray -> log stats (log of max(gray, 1e-4)) ->
    ``map_key = 0.3 + 0.7*key^1.4`` with ``key = (logmax-logmean)/
    (logmax-logmin)`` -> per channel ``adapt = light*(ca*c + (1-ca)*
    gray) + (1-light)*(ca*mean_c + (1-ca)*mean_gray)``; out = c/(c +
    (exp(-intensity)*adapt)^map_key) -> renormalize -> pow(1/gamma)."""
    f32 = np.float32
    img = _normalize_minmax_f32(img)
    gray = _gray_f32(img)
    log_img = np.log(np.maximum(gray, f32(1e-4)))
    log_mean = float(log_img.mean())
    log_min, log_max = float(log_img.min()), float(log_img.max())
    key = (log_max - log_mean) / max(log_max - log_min, 1e-30)
    map_key = f32(0.3 + 0.7 * key ** 1.4)
    inten = f32(np.exp(-float(intensity)))
    chan_mean = img.reshape(-1, 3).mean(0)
    gray_mean = f32(gray.mean())
    ca, la = f32(color_adapt), f32(light_adapt)
    out = np.empty_like(img)
    for c in range(3):
        glob = ca * f32(chan_mean[c]) + (f32(1) - ca) * gray_mean
        adapt = (ca * img[..., c] + (f32(1) - ca) * gray).astype(f32)
        adapt = (la * adapt + (f32(1) - la) * glob).astype(f32)
        adapt = _pow_f32(inten * adapt, float(map_key))
        out[..., c] = img[..., c] * (f32(1) / (adapt + img[..., c]))
    out = _normalize_minmax_f32(out)
    if gamma != 1.0:
        out = _pow_f32(out, 1.0 / gamma)
    return out


def tonemap_drago(img: np.ndarray, gamma: float = 1.0,
                  saturation: float = 1.0, bias: float = 0.85) -> np.ndarray:
    """``cv2.createTonemapDrago(...).process`` — pinned ~5e-7 vs cv2
    when the normalize constants match (structure exact; see
    ``_normalize_minmax_f32`` for the constants tier):

    normalize -> gray -> divide by exp(mean log) -> Drago's adaptive
    log map ``log(L+1)/log(2 + 8*(L/Lmax)^(log bias/log 0.5))`` ->
    ``mapLuminance``: out_c = (c/L)^saturation * map -> renormalize +
    pow(1/gamma).  NaN quirk: a NEGATIVE normalize residue at the
    global-min pixel raises NaN through the fractional pow (cv2 does
    the same; the residue sign is build-portable only when the
    normalize constants match)."""
    f32 = np.float32
    img = _normalize_minmax_f32(img)
    gray = _gray_f32(img)
    log_img = np.log(np.maximum(gray, f32(1e-4)))
    mean = np.exp(f32(log_img.sum()) / f32(log_img.size))
    grays = (gray / mean).astype(f32)
    gmax = float(grays.max())
    expo = float(np.log(f32(bias)) / np.log(f32(0.5)))
    div = np.log((f32(2) + f32(8) * _pow_f32(grays / f32(gmax), expo))
                 ).astype(f32)
    mp = (np.log(grays + f32(1)).astype(f32) * (f32(1) / div)).astype(f32)
    out = np.empty_like(img)
    with np.errstate(divide="ignore", invalid="ignore"):
        for c in range(3):
            ratio = (img[..., c] / grays).astype(f32)
            ch = ratio if saturation == 1.0 else _pow_f32(ratio, float(saturation))
            out[..., c] = ch * mp
    fin = np.isfinite(out)
    if fin.any():
        sub = out[fin]
        mn2, mx2 = float(sub.min()), float(sub.max())
        if mx2 - mn2 > np.finfo(np.float64).eps:
            scale = 1.0 / (mx2 - mn2)
            out = _fma32(out, f32(scale), f32(-mn2 * scale))
    if gamma != 1.0:
        out = _pow_f32(out, 1.0 / gamma)
    return out


def tonemap_mantiuk(img: np.ndarray, gamma: float = 1.0,
                    scale: float = 0.7, saturation: float = 1.0) -> np.ndarray:
    """``cv2.createTonemapMantiuk(...).process`` — closed form, pinned
    ≤ ~3e-3 vs cv2 (fuzz: sizes 8..256 incl. odd, all params; corr 1.0).

    cv2 runs a multi-scale gradient-domain operator: a contrast pyramid
    (forward diffs over INTER_LINEAR half-size levels), the response map
    ``c ← signedPow(signedPow(c, 0.4185)·scale, 1/0.4185)``, and a
    100-iteration conjugate-gradient solve back to log luminance
    (tonemap.cpp:351's ``fabs(dprod) > 0`` assert is the CG's).  The
    response map is ALGEBRAICALLY LINEAR —
    ``signedPow(signedPow(c, p)·s, 1/p) = c·s^(1/p)`` — so the CG
    system is ``A x = k·A x0`` with ``k = scale^(1/0.4185)`` and
    ``x0 = log L``: its solution is ``x = k·x0`` plus an A-null-space
    component (constants), and the final minmax normalize kills the
    constant.  The whole operator therefore reduces to the power law
    ``L' = L^k``.  The ≤3e-3 budget is cv2's own CG stopping tolerance
    (``target_error = 1e-3`` relative, amplified by pow(1/gamma));
    cv2's residual CG noise — not a model error — is what remains.

    Degenerate: cv2 ASSERTS on constant-luminance images (the first CG
    ``dprod`` is exactly 0) — mirrored here with ValueError.  cv2's
    fractional-pow NaN quirk at negative normalize residues (see
    ``tonemap_drago``) applies to isolated pixels of cv2's output; this
    closed form stays finite.
    """
    f32 = np.float32
    img = _normalize_minmax_f32(img)
    gray = _gray_f32(img)
    log_img = np.log(np.maximum(gray, f32(1e-4))).astype(f32)
    if not float(log_img.max()) - float(log_img.min()) > 0:
        raise ValueError(
            "TonemapMantiuk: constant luminance — cv2 asserts "
            "fabs(dprod) > 0 here (tonemap.cpp:351)")
    k = f32(float(f32(scale)) ** (1.0 / float(f32(0.4185))))
    new_gray = np.exp(k * log_img).astype(f32)
    out = np.empty_like(img)
    with np.errstate(divide="ignore", invalid="ignore"):
        for c in range(3):
            ratio = np.where(gray > 0, img[..., c] / gray, f32(0)).astype(f32)
            ch = ratio if saturation == 1.0 else _pow_f32(ratio, float(saturation))
            out[..., c] = ch * new_gray
    fin = np.isfinite(out)
    if fin.any():
        sub = out[fin]
        mn2, mx2 = float(sub.min()), float(sub.max())
        if mx2 - mn2 > np.finfo(np.float64).eps:
            sc = 1.0 / (mx2 - mn2)
            out = _fma32(out, f32(sc), f32(-mn2 * sc))
    if gamma != 1.0:
        out = _pow_f32(out, 1.0 / gamma)
    return out


# ---------------------------------------------------------------------------
# cv2.AlignMTB (median-threshold-bitmap alignment for exposure stacks) —
# pinned BIT-EXACT (24/24 + 40-config fuzz vs cv2, incl. the
# noise-degenerate cases where both land on the same "wrong" optimum):
#   * pyramid = plain 2x decimation at FLOORED sizes (odd tail rows/
#     cols drop — cv2's downsample allocates rows/2 x cols/2), maxlevel =
#     min(max_bits-1, int(ln(max(H,W))/ln 2) - 1);
#   * median per level = getMedian's off-by-one: ONE PLUS the first bin
#     whose cumulative count reaches total//2;
#   * tb = img > med, eb = |img - med| > exclude_range;
#   * greedy 3x3 search per level, err = count(tb0 ^ shift(tb1) & eb0 &
#     shift(eb1)), STRICT improvement, candidates visited with the X
#     OFFSET AS THE OUTER LOOP (cv2's Point(i, j) quirk) — tie order
#     matters on noise-flat levels.
# ---------------------------------------------------------------------------

def _mtb_median(img: np.ndarray) -> int:
    csum = np.cumsum(np.bincount(img.ravel(), minlength=256))
    return int(np.argmax(csum >= img.size // 2)) + 1


def shift_mat(img: np.ndarray, shift) -> np.ndarray:
    """``cv2.AlignMTB.shiftMat`` — translate by ``(x, y)``, zero fill."""
    sx, sy = int(shift[0]), int(shift[1])
    out = np.zeros_like(img)
    H, W = img.shape[:2]
    out[max(0, sy):min(H, H + sy), max(0, sx):min(W, W + sx)] = \
        img[max(0, -sy):min(H, H - sy), max(0, -sx):min(W, W - sx)]
    return out


def calculate_shift_mtb(img0: np.ndarray, img1: np.ndarray,
                        max_bits: int = 6, exclude_range: int = 4):
    """``cv2.AlignMTB.calculateShift`` — the (x, y) translation that
    best aligns ``img1`` to ``img0`` (both u8 grayscale)."""
    _check_u8(img0)
    _check_u8(img1)
    maxlevel = min(int(max_bits) - 1,
                   int(np.log(max(img0.shape)) / np.log(2.0)) - 1)

    def build(img):
        pyr = [img]
        for _ in range(maxlevel):
            c = pyr[-1]
            # cv2's downsample floors the size (odd last rows/cols drop)
            pyr.append(np.ascontiguousarray(
                c[:c.shape[0] // 2 * 2:2, :c.shape[1] // 2 * 2:2]))
        return pyr

    p0, p1 = build(img0), build(img1)
    sx = sy = 0
    for level in range(maxlevel, -1, -1):
        sx *= 2
        sy *= 2
        im0, im1 = p0[level], p1[level]
        m0, m1 = _mtb_median(im0), _mtb_median(im1)
        tb0, tb1 = im0 > m0, im1 > m1
        eb0 = np.abs(im0.astype(np.int32) - m0) > exclude_range
        eb1 = np.abs(im1.astype(np.int32) - m1) > exclude_range
        best = (int(im0.size), sx, sy)
        for dx in (-1, 0, 1):            # x offset is the OUTER loop
            for dy in (-1, 0, 1):
                tx, ty = sx + dx, sy + dy
                stb = shift_mat(tb1, (tx, ty))
                seb = shift_mat(eb1, (tx, ty))
                err = int(((tb0 ^ stb) & eb0 & seb).sum())
                if err < best[0]:
                    best = (err, tx, ty)
        _, sx, sy = best
    return (sx, sy)


def align_mtb(frames, max_bits: int = 6, exclude_range: int = 4,
              cut: bool = True):
    """``cv2.createAlignMTB(max_bits, exclude_range, cut).process`` —
    align an exposure stack to its middle frame before fusion.  Returns
    the list of aligned frames (cropped to the common region when
    ``cut``); the gray legs use cv2's u8 RGB2GRAY coefficients on the
    arrays AS-IS (the same pinned assume-RGB quirk as mergeMertens)."""
    imgs = [np.asarray(f) for f in frames]
    if not imgs or any(f.ndim != 3 or f.shape[-1] != 3 for f in imgs):
        raise ValueError("align_mtb expects a list of [H,W,3] u8 frames")
    pivot = len(imgs) // 2
    gray_base = cvt_gray(imgs[pivot], order="rgb")
    out = [None] * len(imgs)
    shifts = []
    for i, f in enumerate(imgs):
        if i == pivot:
            shifts.append((0, 0))
            out[i] = f.copy()
            continue
        s = calculate_shift_mtb(gray_base, cvt_gray(f, order="rgb"),
                                max_bits, exclude_range)
        shifts.append(s)
        out[i] = shift_mat(f, s)
    if cut:
        xs = [s[0] for s in shifts]
        ys = [s[1] for s in shifts]
        mx, my = max(0, max(xs)), max(0, max(ys))
        nx, ny = min(0, min(xs)), min(0, min(ys))
        H, W = imgs[0].shape[:2]
        out = [o[my:H + ny, mx:W + nx] for o in out]
    return out


def merge_debevec(frames, times) -> np.ndarray:
    """``cv2.createMergeDebevec().process(frames, times)`` — HDR
    radiance recovery, pinned composition (float budget ~1e-5 rel):

    * response g = ln(z) with ``g(0) := g(1) = 0`` (cv2 patches
      response[0] before the log);
    * weight = triangle ``min(z, 255−z) + 1e-6`` (the +1e-6 floor is
      measured: all-saturated pixels fall back to the plain mean of
      ``−ln t``, and a z=0 frame pulls a pair by exactly δ=1e-6);
    * the per-pixel weight is JOINT — the mean of the per-channel
      triangle weights — applied to every channel (like mergeMertens);
    * ln E_c = Σ_i w_i·(g(z_ic) − ln t_i) / Σ_i w_i, E = exp.

    Returns f32 [H,W,3] radiance."""
    f32 = np.float32
    imgs = [np.asarray(f) for f in frames]
    if not imgs or any(f.ndim != 3 or f.shape[-1] != 3 for f in imgs):
        raise ValueError("merge_debevec expects a list of [H,W,3] u8 frames")
    t = np.asarray(times, f32).ravel()
    if len(t) != len(imgs):
        raise ValueError("times must match the number of frames")
    z = np.arange(256, dtype=np.float64)
    wt = (np.minimum(z, 255.0 - z) + 1e-6).astype(f32)
    g = np.log(np.maximum(z, 1.0)).astype(f32)
    lt = np.log(t).astype(f32)
    num = np.zeros(imgs[0].shape, f32)
    den = np.zeros(imgs[0].shape[:2] + (1,), f32)
    for f, lti in zip(imgs, lt):
        wj = wt[f].mean(-1, keepdims=True).astype(f32)
        num += (wj * (g[f] - lti)).astype(f32)
        den += wj
    return np.exp((num / den).astype(f32)).astype(f32)


def calibrate_debevec(frames, times, samples: int = 70,
                      lambda_: float = 10.0) -> np.ndarray:
    """``cv2.createCalibrateDebevec().process`` — camera response
    estimation (gsolve), an APPROXIMATION row: the deterministic grid
    sampling (``sqrt(samples·cols/rows)`` x-points, centered strides),
    triangle ``min(z,255−z)`` weights, the g(128)=0 anchor and the
    λ-weighted second-difference smoothness rows are pinned; the
    least-squares solve differs from cv2's SVD only in the NULL SPACE —
    bins never hit by a sample are unconstrained up to smoothness, so
    both solutions are equally arbitrary there.  Measured: ≤3 % rel on
    sampled bins, up to ~30 % on unsampled extreme bins (8-config
    fuzz).  Returns f32 [256,1,3] like cv2."""
    f32 = np.float32
    imgs = [np.asarray(f) for f in frames]
    if not imgs or any(f.ndim != 3 or f.shape[-1] != 3 for f in imgs):
        raise ValueError("calibrate_debevec expects a list of [H,W,3] u8 frames")
    t = np.asarray(times, np.float64).ravel()
    rows, cols = imgs[0].shape[:2]
    x_points = int(np.sqrt(samples * cols / rows))
    y_points = samples // max(x_points, 1)
    step_x, step_y = cols // max(x_points, 1), rows // max(y_points, 1)
    pts = [(x, y)
           for i, x in zip(range(x_points), range(step_x // 2, 10**9, step_x))
           for j, y in zip(range(y_points), range(step_y // 2, 10**9, step_y))]
    z = np.arange(256)
    w = np.minimum(z, 255 - z).astype(np.float64)
    out = np.zeros((256, 1, 3), f32)
    n = len(pts)
    for c in range(3):
        A = np.zeros((n * len(imgs) + 255, 256 + n))
        b = np.zeros(A.shape[0])
        k = 0
        for i, (x, y) in enumerate(pts):
            for f, ti in zip(imgs, t):
                zij = int(f[y, x, c])
                wij = w[zij]
                A[k, zij] = wij
                A[k, 256 + i] = -wij
                b[k] = wij * np.log(ti)
                k += 1
        A[k, 128] = 1
        k += 1
        for i in range(254):
            wi = w[i + 1]
            A[k, i] = lambda_ * wi
            A[k, i + 1] = -2 * lambda_ * wi
            A[k, i + 2] = lambda_ * wi
            k += 1
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        out[:, 0, c] = np.exp(sol[:256]).astype(f32)
    return out


def _optimal_dft_size(n: int) -> int:
    """cv2.getOptimalDFTSize: smallest 2^a·3^b·5^c ≥ n."""
    best = None
    p2 = 1
    while p2 < 8 * n:
        p3 = p2
        while p3 < 8 * n:
            p5 = p3
            while p5 < 8 * n:
                if p5 >= n and (best is None or p5 < best):
                    best = p5
                p5 *= 5
            p3 *= 3
        p2 *= 2
    return int(best)


def phase_correlate(src1: np.ndarray, src2: np.ndarray, window=None):
    """``cv2.phaseCorrelate`` — FFT sub-pixel translation estimation.

    Pinned composition: optional window multiply, zero-pad to the
    optimal DFT size, normalized cross-power spectrum, real inverse
    DFT, fftshift, argmax peak (row-major first like minMaxLoc), and
    the CLAMPED 5x5 weighted centroid; returns ``((dx, dy), response)``
    with response = the centroid box sum of the normalized correlation.
    Budget: shifts within ~1e-3 px of cv2 when the peak is
    well-defined (cv2's packed-CCS spectrum arithmetic differs from a
    complex FFT in near-zero bins, which the centroid amplifies only on
    degenerate correlations where both results are noise anyway)."""
    a = np.asarray(src1, np.float64)
    b = np.asarray(src2, np.float64)
    if a.shape != b.shape or a.ndim != 2:
        raise ValueError("phase_correlate expects two equal-shape 2-D arrays")
    if window is not None:
        w = np.asarray(window, np.float64)
        a = a * w
        b = b * w
    M = _optimal_dft_size(a.shape[0])
    N = _optimal_dft_size(a.shape[1])
    pa = np.zeros((M, N))
    pa[:a.shape[0], :a.shape[1]] = a
    pb = np.zeros((M, N))
    pb[:b.shape[0], :b.shape[1]] = b
    P = np.fft.fft2(pa) * np.conj(np.fft.fft2(pb))
    mag = np.abs(P)
    C = np.fft.fftshift(np.real(np.fft.ifft2(
        np.where(mag == 0, 0, P / np.where(mag == 0, 1, mag)))))
    py, px = np.unravel_index(np.argmax(C), C.shape)
    minr, maxr = max(0, py - 2), min(M - 1, py + 2)
    minc, maxc = max(0, px - 2), min(N - 1, px + 2)
    box = C[minr:maxr + 1, minc:maxc + 1]
    ys = np.arange(minr, maxr + 1)[:, None]
    xs = np.arange(minc, maxc + 1)[None, :]
    s = float(box.sum())
    se = s + np.finfo(np.float64).eps
    return ((N / 2.0 - float((box * xs).sum()) / se,
             M / 2.0 - float((box * ys).sum()) / se), s)


def create_hanning_window(size_hw) -> np.ndarray:
    """``cv2.createHanningWindow`` (CV_64F) — NOTE cv2's window is the
    SQUARE ROOT of the separable Hann product (pinned: the plain
    product is 0.25 off at the profile scale), i.e. the energy taper."""
    h, w = int(size_hw[0]), int(size_hw[1])
    wy = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(h) / (h - 1)))
    wx = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(w) / (w - 1)))
    return np.sqrt(np.outer(wy, wx))


def moments(img: np.ndarray, binary_image: bool = False) -> dict:
    """``cv2.moments`` on a grayscale image — EXACT (f64 polynomial
    sums; raw m, central mu, normalized nu keys like cv2)."""
    I = np.asarray(img, np.float64)
    if I.ndim != 2:
        raise ValueError("moments expects a single-channel image")
    if binary_image:
        I = (I != 0).astype(np.float64)
    H, W = I.shape
    x = np.arange(W, dtype=np.float64)
    y = np.arange(H, dtype=np.float64)
    m = {}
    for p in range(4):
        for q in range(4):
            if p + q <= 3:
                m[f"m{p}{q}"] = float(((x ** p)[None, :] * (y ** q)[:, None]
                                       * I).sum())
    # cv2 Moments completion (inv_m00 = 0 on degenerate contours)
    inv_m00 = 0.0
    cx = cy = 0.0
    if abs(m["m00"]) > np.finfo(np.float64).eps:
        inv_m00 = 1.0 / m["m00"]
        cx, cy = m["m10"] * inv_m00, m["m01"] * inv_m00
    m["mu20"] = m["m20"] - m["m10"] * cx
    m["mu11"] = m["m11"] - m["m10"] * cy
    m["mu02"] = m["m02"] - m["m01"] * cy
    m["mu30"] = m["m30"] - cx * (3 * m["mu20"] + cx * m["m10"])
    m["mu21"] = (m["m21"] - cx * (2 * m["mu11"] + cx * m["m01"])
                 - cy * m["mu20"])
    m["mu12"] = (m["m12"] - cy * (2 * m["mu11"] + cy * m["m10"])
                 - cx * m["mu02"])
    m["mu03"] = m["m03"] - cy * (3 * m["mu02"] + cy * m["m01"])
    s2 = inv_m00 * inv_m00
    s3 = s2 * np.sqrt(abs(inv_m00))
    for k in ("mu20", "mu11", "mu02"):
        m["nu" + k[2:]] = m[k] * s2
    for k in ("mu30", "mu21", "mu12", "mu03"):
        m["nu" + k[2:]] = m[k] * s3
    return m


def hu_moments(m) -> np.ndarray:
    """``cv2.HuMoments`` — the seven invariants from normalized central
    moments (exact closed forms)."""
    if isinstance(m, np.ndarray):
        raise TypeError("pass the moments dict from moments()")
    n20, n11, n02 = m["nu20"], m["nu11"], m["nu02"]
    n30, n21, n12, n03 = m["nu30"], m["nu21"], m["nu12"], m["nu03"]
    t0 = n30 + n12
    t1 = n21 + n03
    q0 = t0 * t0
    q1 = t1 * t1
    h = np.empty(7)
    h[0] = n20 + n02
    h[1] = (n20 - n02) ** 2 + 4 * n11 * n11
    h[2] = (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2
    h[3] = q0 + q1
    h[4] = ((n30 - 3 * n12) * t0 * (q0 - 3 * q1)
            + (3 * n21 - n03) * t1 * (3 * q0 - q1))
    h[5] = (n20 - n02) * (q0 - q1) + 4 * n11 * t0 * t1
    h[6] = ((3 * n21 - n03) * t0 * (q0 - 3 * q1)
            - (n30 - 3 * n12) * t1 * (3 * q0 - q1))
    return h.reshape(7, 1)


def match_shapes(a: np.ndarray, b: np.ndarray, method: str = "i1") -> float:
    """``cv2.matchShapes`` on grayscale images — the log-Hu distances
    (methods I1/I2/I3; cv2's eps gate ``|h| > 1e-5 … > eps`` model,
    including matchcontours.cpp's anyA!=anyB → DBL_MAX degenerate rule:
    if exactly one side has all-zero Hu moments the shapes are maximally
    dissimilar, not a perfect match)."""
    if method not in ("i1", "i2", "i3"):
        raise ValueError(f"method must be i1/i2/i3, got {method!r}")
    ha = hu_moments(moments(a)).ravel()
    hb = hu_moments(moments(b)).ravel()
    eps = 1.0e-5
    total = 0.0
    any_a = any_b = False
    for va, vb in zip(ha, hb):
        ama, amb = abs(va), abs(vb)
        any_a = any_a or ama > eps
        any_b = any_b or amb > eps
        if ama > eps and amb > eps:
            sa = -np.copysign(1.0, va) * np.log10(ama)
            sb = -np.copysign(1.0, vb) * np.log10(amb)
            if method == "i1":
                total += abs(1.0 / sa - 1.0 / sb)
            elif method == "i2":
                total += abs(sa - sb)
            else:
                total = max(total, abs(sa - sb) / abs(sa))
    if any_a != any_b:
        return float(np.finfo(np.float64).max)  # cv2: DBL_MAX
    return float(total)


def spatial_gradient(img: np.ndarray, border: str = "reflect101"):
    """``cv2.spatialGradient`` — exact: the (Sobel dx, Sobel dy) pair,
    ksize 3, uint8 in / int16 out (cv2 asserts CV_8UC1 and supports only
    BORDER_DEFAULT=REFLECT_101 and BORDER_REPLICATE; probe: bitwise ==
    the two ``cv2.Sobel(CV_16S, ·, ·, 3)`` calls under either border)."""
    if img.dtype != np.uint8:
        raise TypeError("spatialGradient requires uint8 input (cv2 constraint)")
    if border not in ("reflect101", "replicate"):
        raise ValueError("border must be 'reflect101' or 'replicate'")
    mode = "reflect" if border == "reflect101" else "edge"
    p = np.pad(img.astype(np.int64), 1, mode=mode)
    H, W = img.shape
    smooth_y = p[0:H, :] + 2 * p[1:H + 1, :] + p[2:H + 2, :]
    dx = (smooth_y[:, 2:W + 2] - smooth_y[:, 0:W]).astype(np.int16)
    smooth_x = p[:, 0:W] + 2 * p[:, 1:W + 1] + p[:, 2:W + 2]
    dy = (smooth_x[2:H + 2, :] - smooth_x[0:H, :]).astype(np.int16)
    return dx, dy


def sqr_box_filter(img: np.ndarray, ksize=3, normalize: bool = True) -> np.ndarray:
    """``cv2.sqrBoxFilter`` (default ddepth → CV_32F): REFLECT_101
    window sums of squared pixels.  Pinned law (probes): squares and
    sums exact (int64/f64), ``normalize`` multiplies by f64 ``1/area``,
    ONE final cast to f32.  Bitwise vs cv2 for u16/f32 and for every
    unnormalized path; u8 normalized rides cv2's IPP reciprocal kernel
    and is ±1 ulp on ≲1 % px (documented budget)."""
    kind = _img_kind(img, allow_i16=True)
    kh, kw = (int(ksize[0]), int(ksize[1])) if isinstance(ksize, (tuple, list)) \
        else (int(ksize), int(ksize))
    sq = img.astype(np.float64 if kind == "f32" else np.int64) ** 2
    p = np.pad(sq, ((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)),
               mode="reflect")
    H, W = img.shape
    s = sum(p[i:i + H, :] for i in range(kh))
    s = sum(s[:, j:j + W] for j in range(kw))
    if normalize:
        return (s.astype(np.float64) * (1.0 / (kh * kw))).astype(np.float32)
    return s.astype(np.float32)


def blend_linear(a: np.ndarray, b: np.ndarray, w1: np.ndarray,
                 w2: np.ndarray) -> np.ndarray:
    """``cv2.blendLinear`` — bitwise-pinned f32 law
    ``(a·w1 + b·w2) / (w1 + w2 + 1e-5)`` (weights f32, one channel,
    shared across the image's channels).  uint8 input rounds half-even
    and saturates; float32 returns the raw f32 quotient."""
    if a.shape != b.shape:
        raise ValueError("sources must share shape")
    if w1.shape != a.shape[:2] or w2.shape != a.shape[:2]:
        raise ValueError("weights must be [H,W] f32 matching the sources")
    w1 = w1.astype(np.float32)
    w2 = w2.astype(np.float32)
    den = w1 + w2 + np.float32(1e-5)
    if a.ndim == 3:
        w1 = w1[..., None]
        w2 = w2[..., None]
        den = den[..., None]
    out = (a.astype(np.float32) * w1 + b.astype(np.float32) * w2) / den
    if a.dtype == np.uint8:
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# distanceTransform (chamfer masks 3/5)
# ---------------------------------------------------------------------------

_FLT_MAX = np.float32(3.4028235e38)

_DIST_MASKS = {
    ("l1", 3): (np.float32(1.0), np.float32(2.0), None),
    ("c", 3): (np.float32(1.0), np.float32(1.0), None),
    ("l2", 3): (np.float32(0.955), np.float32(1.3693), None),
    ("l2", 5): (np.float32(1.0), np.float32(1.4), np.float32(2.1969)),
}


def _chamfer_neighbors(a, b, c):
    """Forward-pass chamfer candidates as (rows_up, dj, weight) — cv2's
    3x3 set {left, up, up-left, up-right} plus the 5x5 knight moves."""
    n = [(0, -1, a), (1, 0, a), (1, -1, b), (1, 1, b)]
    if c is not None:
        n += [(1, -2, c), (1, 2, c), (2, -1, c), (2, 1, c)]
    return n


def _chamfer_pass(d: np.ndarray, neigh, shear: int) -> np.ndarray:
    """One forward raster chamfer pass, evaluated as a sheared wavefront.

    Cell (i, j) lives at column q = shear·i + j; with shear = 2 (mask 3)
    or 3 (mask 5) every DP dependency sits at a strictly smaller q, so
    sweeping columns left→right with vectorized row operations performs
    the same single rounded f32 add per candidate as cv2's sequential
    raster loop — and min() commutes with the (monotone) rounding, so
    the result is bit-identical to the raster order."""
    H, W = d.shape
    Q = shear * (H - 1) + W
    rows = np.arange(H)
    cols = shear * rows[:, None] + np.arange(W)[None, :]
    S = np.full((H, Q), _FLT_MAX, np.float32)
    S[rows[:, None], cols] = d
    valid = np.zeros((H, Q), bool)
    valid[rows[:, None], cols] = True
    for t in range(1, Q):
        v = S[:, t]
        for pi, dj, w in neigh:
            dq = shear * pi - dj
            if t - dq < 0:
                continue
            src = S[:, t - dq]
            if pi:
                src = np.concatenate(
                    [np.full(pi, _FLT_MAX, np.float32), src[:-pi]])
            v = np.minimum(v, (src + w).astype(np.float32))
        S[:, t] = np.where(valid[:, t], v, _FLT_MAX)
    return S[rows[:, None], cols]


def distance_transform(img: np.ndarray, distance_type: str = "l2",
                       mask_size: int = 3,
                       dst_type: str = "f32") -> np.ndarray:
    """``cv2.distanceTransform`` — two-pass chamfer, per-step f32 adds.

    ``distance_type``: l1 | l2 | c; ``mask_size``: 3 | 5 (L1/C collapse
    to the 3x3 mask — cv2's own behavior, the 3x3 chamfer is already
    exact for those metrics).  Weights: L1 (1,2), C (1,1), L2 3x3
    (0.955, 1.3693), L2 5x5 (1, 1.4, 2.1969).  Zero pixels are sources;
    untouched pixels stay FLT_MAX (probe: an all-nonzero image returns
    3.4028235e38 everywhere, like cv2).  BITWISE vs cv2 as installed for
    L1, C and L2 mask 5; L2 mask 3 is bitwise vs cv2's portable float
    law (``setUseOptimized(False)`` uses int16.16 weights instead) and
    ≤1e-6 relative vs the default build's IPP route (docs/PARITY.md).
    ``dst_type='u8'`` (DIST_L1 only, like cv2) saturate-casts."""
    dt = str(distance_type).lower()
    m = int(mask_size)
    if dt not in ("l1", "l2", "c"):
        raise ValueError(f"distance_type must be l1|l2|c, got {distance_type!r}")
    if m not in (3, 5):
        raise ValueError(f"mask_size must be 3 or 5, got {mask_size}")
    if dst_type not in ("f32", "u8"):
        raise ValueError(f"dst_type must be f32|u8, got {dst_type!r}")
    if dst_type == "u8" and dt != "l1":
        raise ValueError("dst_type='u8' requires distance_type='l1' (cv2)")
    if img.dtype != np.uint8:
        raise TypeError("distanceTransform requires uint8 input")
    if dt in ("l1", "c"):
        m = 3
    a, b, c = _DIST_MASKS[(dt, m)]
    shear = 2 if c is None else 3
    neigh = _chamfer_neighbors(a, b, c)
    d = np.where(img == 0, np.float32(0), _FLT_MAX).astype(np.float32)
    d = _chamfer_pass(d, neigh, shear)
    d = _chamfer_pass(d[::-1, ::-1], neigh, shear)[::-1, ::-1]
    if dst_type == "u8":
        return np.clip(d, 0, 255).astype(np.uint8)
    return d


# ---------------------------------------------------------------------------
# floodFill
# ---------------------------------------------------------------------------

def flood_fill(img: np.ndarray, seed_point, new_val, lo_diff=0, up_diff=0,
               connectivity: int = 4, fixed_range: bool = False,
               mask: np.ndarray = None, mask_only: bool = False,
               mask_fill: int = 1):
    """``cv2.floodFill`` — returns ``(n, image, mask, rect)``.

    Pinned semantics (probes): the filled set is the unique fixpoint of
    "p joins via an in-region neighbor q when every channel of p lies in
    [ref−lo, ref+up]" with ref = the SEED pixel (``fixed_range``) or q's
    ORIGINAL value (floating) — acceptance depends only on original
    pixel values, so the result is schedule-independent.  ``seed_point``
    is (x, y) like cv2.  Nonzero mask cells block; a blocked/out-of-gamut
    seed is a no-op returning n=0, rect (0,0,0,0).  cv2 writes
    ``mask_fill`` (flags>>8, default 1) into filled mask cells and
    unconditionally sets the mask's 1-px border ring to 1.  u8 newVal =
    cvRound (half-even) + saturate; rect is (x, y, w, h)."""
    x0, y0 = int(seed_point[0]), int(seed_point[1])
    gray = img.ndim == 2
    H, W = img.shape[:2]
    C = 1 if gray else img.shape[2]
    if not (0 <= x0 < W and 0 <= y0 < H):
        raise ValueError(f"seed {seed_point} outside {W}x{H} image")
    if connectivity not in (0, 4, 8):
        raise ValueError("connectivity must be 4 or 8")
    out_mask = (np.zeros((H + 2, W + 2), np.uint8) if mask is None
                else mask.copy())
    if out_mask.shape != (H + 2, W + 2):
        raise ValueError("mask must be (H+2, W+2) uint8")
    blocked = out_mask[1:-1, 1:-1] != 0
    out_mask[0, :] = 1
    out_mask[-1, :] = 1
    out_mask[:, 0] = 1
    out_mask[:, -1] = 1
    # float images compare in f32 (cv2's CV_32F path); integer images in
    # f64 (everything integral — exact either way)
    cmp_t = np.float32 if img.dtype == np.float32 else np.float64
    f = img.reshape(H, W, C).astype(cmp_t)
    lo = np.broadcast_to(np.abs(np.asarray(lo_diff, cmp_t)).reshape(-1), (C,))
    up = np.broadcast_to(np.abs(np.asarray(up_diff, cmp_t)).reshape(-1), (C,))
    out = img.copy()
    region = np.zeros((H, W), bool)
    if not blocked[y0, x0]:
        region[y0, x0] = True
        nbrs = [(0, 1), (0, -1), (1, 0), (-1, 0)]
        if connectivity == 8:
            nbrs += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
        if fixed_range:
            ref_v = f[y0, x0]
            ok = np.all((f >= ref_v - lo) & (f <= ref_v + up), axis=2) & ~blocked
            changed = True
            while changed:
                changed = False
                for di, dj in nbrs:
                    nb = _shift_bool(region, di, dj)
                    cand = nb & ok & ~region
                    if cand.any():
                        region |= cand
                        changed = True
        else:
            changed = True
            while changed:
                changed = False
                for di, dj in nbrs:
                    nb = _shift_bool(region, di, dj)
                    nv = np.roll(f, (di, dj), (0, 1))
                    okd = np.all((f >= nv - lo) & (f <= nv + up), axis=2)
                    cand = nb & okd & ~blocked & ~region
                    if cand.any():
                        region |= cand
                        changed = True
    n = int(region.sum())
    if n == 0:
        return 0, out, out_mask, (0, 0, 0, 0)
    ys, xs = np.nonzero(region)
    rect = (int(xs.min()), int(ys.min()),
            int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1))
    out_mask[1:-1, 1:-1][region] = np.uint8(mask_fill if mask_fill else 1)
    if not mask_only:
        nv = np.asarray(new_val, np.float64).reshape(-1)
        nv = np.broadcast_to(nv, (C,))
        if img.dtype == np.uint8:
            fillv = np.clip(_cv_round_arr(nv), 0, 255).astype(np.uint8)
        elif img.dtype == np.uint16:
            fillv = np.clip(_cv_round_arr(nv), 0, 65535).astype(np.uint16)
        else:
            fillv = nv.astype(img.dtype)
        if gray:
            out[region] = fillv[0]
        else:
            out[region] = fillv
    return n, out, out_mask, rect


def _shift_bool(a: np.ndarray, di: int, dj: int) -> np.ndarray:
    out = np.roll(a, (di, dj), (0, 1))
    if di == 1:
        out[0, :] = False
    elif di == -1:
        out[-1, :] = False
    if dj == 1:
        out[:, 0] = False
    elif dj == -1:
        out[:, -1] = False
    return out


def _cv_round_arr(x: np.ndarray) -> np.ndarray:
    return np.rint(np.asarray(x, np.float64))


def corner_min_eigen_val(img: np.ndarray, block_size: int = 3,
                         ksize: int = 3) -> np.ndarray:
    """``cv2.cornerMinEigenVal`` — smaller structure-tensor eigenvalue:
    ``(a+c) − sqrt((a−c)² + b²)`` with a = Σdx²/2, c = Σdy²/2, b = Σdxdy
    over the block, Sobel derivatives scaled like cornerHarris.  f32-ulp
    parity class (≤5e-7 relative vs cv2 — the subtraction cancels for
    edge pixels, so per-pixel ulp counts are meaningless; same budget
    family as corner_harris)."""
    if img.dtype != np.uint8:
        raise TypeError("cornerMinEigenVal (this port) requires uint8 input")
    dx = sobel(img.astype(np.float32), 1, 0, ksize).astype(np.float64)
    dy = sobel(img.astype(np.float32), 0, 1, ksize).astype(np.float64)
    sc = 1.0 / ((1 << (ksize - 1)) * block_size * 255)
    dx *= sc
    dy *= sc
    cxx = box_filter((dx * dx).astype(np.float32), block_size,
                     normalize=False).astype(np.float64)
    cyy = box_filter((dy * dy).astype(np.float32), block_size,
                     normalize=False).astype(np.float64)
    cxy = box_filter((dx * dy).astype(np.float32), block_size,
                     normalize=False).astype(np.float64)
    a = cxx * 0.5
    c = cyy * 0.5
    return ((a + c) - np.sqrt((a - c) ** 2 + cxy ** 2)).astype(np.float32)


def good_features_to_track(img: np.ndarray, max_corners: int = 0,
                           quality_level: float = 0.01,
                           min_distance: float = 10.0,
                           mask: np.ndarray = None, block_size: int = 3,
                           gradient_size: int = 3,
                           use_harris: bool = False,
                           k: float = 0.04,
                           response: np.ndarray = None) -> np.ndarray:
    """``cv2.goodFeaturesToTrack`` — returns [N, 2] f32 (x, y).

    Selection logic pinned (fuzz-exact when fed cv2's own response via
    ``response=``): threshold = max(response)·quality (TOZERO), 3x3
    dilate NMS with EQUALITY keep, candidates collected over the
    1-px-inset interior in raster order, sorted by response descending
    (stable — ties keep raster order), then greedy min-distance
    rejection on a minDistance-sized grid with STRICT < minDistance²
    euclidean test.  End-to-end vs cv2 the response map itself is the
    f32-ulp-class re-derivation (corner_min_eigen_val / corner_harris),
    so razor ties at the threshold/NMS/sort boundaries may differ —
    docs/PARITY.md."""
    if response is None:
        response = (corner_harris(img, block_size, gradient_size, k)
                    if use_harris else
                    corner_min_eigen_val(img, block_size, gradient_size))
    eig = response.astype(np.float32).copy()
    # cv2 computes max/threshold/NMS on the UNMASKED response; the mask
    # gates only candidate collection (probe: masked fuzz)
    maxv = float(eig.max())
    thr = np.float32(maxv * quality_level)
    eig[eig <= thr] = 0.0
    H, W = eig.shape
    p = np.pad(eig, 1, mode="constant", constant_values=0)
    dil = eig.copy()
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            dil = np.maximum(dil, p[1 + di:1 + di + H, 1 + dj:1 + dj + W])
    keep = (eig != 0) & (eig == dil)
    if mask is not None:
        keep &= mask != 0
    ys, xs = np.nonzero(keep)
    inset = (ys >= 1) & (ys < H - 1) & (xs >= 1) & (xs < W - 1)
    ys, xs = ys[inset], xs[inset]
    vals = eig[ys, xs]
    order = np.argsort(-vals, kind="stable")
    ys, xs, vals = ys[order], xs[order], vals[order]
    out = []
    if min_distance >= 1:
        cell = int(min_distance)
        gw = (W + cell - 1) // cell
        gh = (H + cell - 1) // cell
        grid = [[] for _ in range(gw * gh)]
        md2 = float(min_distance) * float(min_distance)
        for y, x in zip(ys.tolist(), xs.tolist()):
            gx, gy = x // cell, y // cell
            good = True
            for ny in range(max(0, gy - 1), min(gh, gy + 2)):
                for nx in range(max(0, gx - 1), min(gw, gx + 2)):
                    for (py, px) in grid[ny * gw + nx]:
                        if (px - x) ** 2 + (py - y) ** 2 < md2:
                            good = False
                            break
                    if not good:
                        break
                if not good:
                    break
            if good:
                grid[gy * gw + gx].append((y, x))
                out.append((x, y))
                if max_corners > 0 and len(out) >= max_corners:
                    break
    else:
        for y, x in zip(ys.tolist(), xs.tolist()):
            out.append((x, y))
            if max_corners > 0 and len(out) >= max_corners:
                break
    return np.array(out, np.float32).reshape(-1, 2)


# ---------------------------------------------------------------------------
# HoughLines (standard)
# ---------------------------------------------------------------------------

def _hough_numangle(min_theta: float, max_theta: float, theta: float) -> int:
    # cv2's computeNumangle: floor(span/step)+1, then drop the last bin
    # when the span is ~pi (a line would otherwise be detected twice)
    na = int(np.floor((max_theta - min_theta) / theta)) + 1
    if na > 1 and abs(np.pi - (na - 1) * theta) < theta / 2:
        na -= 1
    return na


def hough_lines(img: np.ndarray, rho: float = 1.0,
                theta: float = np.pi / 180, threshold: int = 100,
                min_theta: float = 0.0,
                max_theta: float = np.pi) -> np.ndarray:
    """``cv2.HoughLines`` (standard, srn=stn=0) — BIT-EXACT [N, 2]
    (rho, theta) f32, 100-config fuzz 0 mismatches.  Pinned laws:

    * numangle = floor(span/θ)+1 with the ~π wraparound trim;
      numrho = cvRound(((W+H)·2+1)/ρ).
    * Trig tables from an INCREMENTAL f32 angle (``ang += (float)θ``),
      sin/cos evaluated on the f64-promoted f32 angle, × 1/ρ, cast f32.
    * Vote r = cvRound(x·tabCos + y·tabSin) in f32 (half-even), offset
      by the INTEGER center (numrho−1)//2.
    * Candidate = votes STRICTLY > threshold and a 4-neighbor local max
      (> left/up, ≥ right/down); sorted by votes desc with ascending
      accumulator index as the tie-break (cv2's hough_cmp_gt).
    * Output rho = (r − (numrho−1)//2)·ρ; output theta = f32 mul-add
      ``f32(min_theta) + f32(n)·f32(θ)`` (NOT the table angle)."""
    if img.dtype != np.uint8:
        raise TypeError("HoughLines requires uint8 input")
    f32 = np.float32
    numangle = _hough_numangle(min_theta, max_theta, theta)
    H, W = img.shape
    numrho = int(np.rint(((W + H) * 2 + 1) / rho))
    irho = 1.0 / rho
    ang = np.empty(numangle)
    a = f32(min_theta)
    step = f32(theta)
    for i in range(numangle):
        ang[i] = np.float64(a)
        a = f32(a + step)
    tabsin = (np.sin(ang) * irho).astype(f32)
    tabcos = (np.cos(ang) * irho).astype(f32)
    acc = np.zeros((numangle + 2, numrho + 2), np.int32)
    ys, xs = np.nonzero(img)
    xf = xs.astype(f32)
    yf = ys.astype(f32)
    c0 = (numrho - 1) // 2
    for n in range(numangle):
        r = np.rint((xf * tabcos[n] + yf * tabsin[n]).astype(f32)).astype(int)
        np.add.at(acc[n + 1], r + c0 + 1, 1)
    return _hough_select(acc, numangle, numrho, int(threshold), rho,
                         min_theta, theta)


def _hough_select(acc: np.ndarray, numangle: int, numrho: int,
                  threshold: int, rho: float, min_theta: float,
                  theta: float) -> np.ndarray:
    """Pinned HoughLines candidate selection over a padded accumulator."""
    f32 = np.float32
    cand = []
    for n in range(numangle):
        row = acc[n + 1]
        v = row[1:-1]
        keep = ((v > threshold) & (v > row[:-2]) & (v >= row[2:])
                & (v > acc[n][1:-1]) & (v >= acc[n + 2][1:-1]))
        for r in np.nonzero(keep)[0]:
            cand.append((int(v[r]), n, int(r)))
    cand.sort(key=lambda q: (-q[0], q[1] * numrho + q[2]))
    c0 = (numrho - 1) // 2
    return np.array([[(r - c0) * rho, f32(f32(min_theta) + f32(n) * f32(theta))]
                     for _, n, r in cand], np.float32).reshape(-1, 2)


# ---------------------------------------------------------------------------
# getRectSubPix / cornerSubPix (sub-pixel samplers, cv2 samplers.cpp family)
# ---------------------------------------------------------------------------

def get_rect_sub_pix(img: np.ndarray, patch_size, center,
                     patch_type: str = None) -> np.ndarray:
    """``cv2.getRectSubPix`` — bilinear patch extraction at a sub-pixel
    center (u8/f32 inputs, [H,W] / [H,W,3]).

    Pinned 2026-08-18 against cv2 5.0.0 (interior fuzz 0/1427 per path;
    docs/PARITY.md): ``x0 = f32(cx) − f32((w−1)/2)``, ``ip = floor(x0)``,
    ``a = f32(x0 − ip)`` (same for y/b); weights ``a11 = f32((1−a)(1−b))``
    etc.  cv2 5.0 dispatches by channel count AND output depth, and the
    three kernels use three different summation orders:

    * f32 → f32, 1ch (SIMD 32f body): the FMA chain
      ``fma(p11,a22, fma(p10,a21, fma(p01,a12, p00·a11)))`` — bit-exact.
    * u8 → f32, 1ch (``getRectSubPix_8u32f``): PAIRED plain-f32 sums
      ``(p00·a11 + p01·a12) + (p10·a21 + p11·a22)`` — bit-exact.
    * any → f32, 3ch (scalar ``getRectSubPix_Cn_`` template): plain
      left-to-right f32 sums
      ``((p00·a11 + p01·a12) + p10·a21) + p11·a22`` — bit-exact.
    * u8 → u8 (``patch_type=None`` on a u8 source): OpenCV's own kernel
      is Q16 fixed point — ``w_ij = cvRound(a_ij·2^16)`` (weights from
      the f32 products above), ``out = sat((Σ p·w + 2^15) >> 16)``.
      Bit-exact for 3ch, and for 1ch whenever IPP is disabled
      (``OPENCV_IPP=disabled`` → 0/600).  The DEFAULT build routes 1ch
      through ``ippiCopySubpixIntersect_8u_C1R``, whose SIMD fixed point
      rounds a thin band of near-half ties (~|v−.5| ≲ 0.01) the other
      way: ±1 LSB on ~11 % of random configs (≲0.3 % of pixels) — the
      documented budget for 1ch u8→u8 under default cv2.
    * Patches may cross the border: this model clamps source coords
      (REPLICATE).  OpenCV's scalar border kernel agrees to ±1 LSB
      (IPP-off 1ch: 1/1500 configs off by 1; default 3ch: 9/1500), and
      f32 border pixels are the ±1-ulp class.  EXCEPTION: default-build
      1ch u8→u8 border patches hit an IPP anomaly — in the x-overhang
      region of the first row ``ippiCopySubpixIntersect_8u_C1R``
      samples column W−2 instead of W−1 (probed 2026-08-18; deltas up
      to ~200) — cv2's own output there contradicts its documented
      replicate semantics, so that cell is excluded from the budget
      (tests pin 3ch border and IPP-off behavior instead).  cv2
      documents (and this model requires) the CENTER inside the image.
    """
    f32 = np.float32
    if img.dtype not in (np.uint8, np.float32):
        raise TypeError(f"getRectSubPix supports u8/f32, got {img.dtype}")
    w, h = int(patch_size[0]), int(patch_size[1])
    cx, cy = float(center[0]), float(center[1])
    if patch_type is None:
        patch_type = "f32" if img.dtype == np.float32 else "u8"
    if patch_type not in ("u8", "f32"):
        raise ValueError(f"patch_type must be 'u8' or 'f32', got {patch_type!r}")
    if img.dtype == np.float32 and patch_type == "u8":
        raise ValueError("f32 source only extracts f32 patches (as cv2)")
    multi = img.ndim == 3 and img.shape[2] > 1
    x0 = f32(f32(cx) - f32((w - 1) * 0.5))
    y0 = f32(f32(cy) - f32((h - 1) * 0.5))
    ix, iy = int(np.floor(x0)), int(np.floor(y0))
    a, b = f32(x0 - ix), f32(y0 - iy)
    H, W = img.shape[:2]
    xs = np.clip(ix + np.arange(w + 1), 0, W - 1)
    ys = np.clip(iy + np.arange(h + 1), 0, H - 1)
    a11 = f32((f32(1) - a) * (f32(1) - b))
    a12 = f32(a * (f32(1) - b))
    a21 = f32((f32(1) - a) * b)
    a22 = f32(a * b)
    if patch_type == "u8":
        # OpenCV Q16 fixed-point kernel (samplers.cpp scale_fixpt/cast_8u).
        P = img[np.ix_(ys, xs)].astype(np.int64)
        p00 = P[:h, :w]; p01 = P[:h, 1:]; p10 = P[1:, :w]; p11 = P[1:, 1:]
        ws = [int(np.rint(np.float64(x) * 65536.0))
              for x in (a11, a12, a21, a22)]
        s = p00 * ws[0] + p01 * ws[1] + p10 * ws[2] + p11 * ws[3]
        return np.clip((s + 32768) >> 16, 0, 255).astype(np.uint8)
    P = img[np.ix_(ys, xs)].astype(f32)
    p00 = P[:h, :w]; p01 = P[:h, 1:]; p10 = P[1:, :w]; p11 = P[1:, 1:]
    if multi:
        v = (((((p00 * a11).astype(f32) + (p01 * a12).astype(f32)).astype(f32)
               + (p10 * a21).astype(f32)).astype(f32)
              + (p11 * a22).astype(f32)).astype(f32))
    elif img.dtype == np.float32:
        v = _fma32(p11, a22, _fma32(p10, a21, _fma32(p01, a12,
                                                     (p00 * a11).astype(f32))))
    else:
        v = ((((p00 * a11).astype(f32) + (p01 * a12).astype(f32)).astype(f32)
              + ((p10 * a21).astype(f32)
                 + (p11 * a22).astype(f32)).astype(f32)).astype(f32))
    return v


def corner_sub_pix(img: np.ndarray, corners: np.ndarray, win_size,
                   zero_zone=(-1, -1), max_count: int = 100,
                   epsilon: float = 0.0) -> np.ndarray:
    """``cv2.cornerSubPix`` — iterative sub-pixel corner refinement
    (cornersubpix.cpp; gradient structure-tensor fixpoint).

    Pinned 2026-08-18: per iteration a ``(2w+3, 2h+3)`` f32 patch is
    extracted with :func:`get_rect_sub_pix` (the pinned u8→f32 paired /
    f32 FMA laws), central-difference gradients weighted by the f32
    Gaussian mask ``exp(-((i-h)/h)²)·exp(-((j-w)/w)²)`` (zeroZone
    rectangle zeroed) accumulate the 2×2 system in f64, and the solve
    moves the corner; stop on ``err ≤ ε²``, iteration cap (clamped to
    [1, 100]), a degenerate determinant (|det| ≤ DBL_EPSILON²), or the
    corner leaving the image; a final drift gate resets any corner that
    moved more than the window from its start.  f32 coordinates equal
    cv2's bitwise whenever every iterate's patch stays interior
    (0/295 margin-fuzz configs; 1958/1958 interior corners on
    detect→refine chains).  A corner whose window reaches the image
    border inherits the getRectSubPix border ±1-ulp class, and the
    fixpoint iteration can then settle on a neighbouring fixpoint of
    the same attractor: 87 % of border-reaching corners still bitwise,
    the rest within the drift-gate bound (observed ≤ 0.85 px < win;
    both outputs are valid refinements — tests/test_subpix.py,
    docs/PARITY.md).
    """
    f32 = np.float32
    ww, wh = int(win_size[0]), int(win_size[1])
    zw, zh = int(zero_zone[0]), int(zero_zone[1])
    win_w, win_h = 2 * ww + 1, 2 * wh + 1
    max_iters = min(max(int(max_count), 1), 100)
    eps = max(float(epsilon), 0.0) ** 2
    # f32 Gaussian weight mask, exactly cv2's float expression: the exp
    # ARG is the f32 product -y*y; glibc expf is correctly rounded, so
    # f64 exp of the f32 arg rounded once = std::exp(float) (numpy's
    # own f32 exp is off by 1 ulp on some inputs — probed)
    yy = (np.arange(win_h, dtype=np.int32) - wh).astype(f32) / f32(wh)
    xx = (np.arange(win_w, dtype=np.int32) - ww).astype(f32) / f32(ww)
    vy = np.exp(-(yy * yy).astype(f32).astype(np.float64)).astype(f32)
    vx = np.exp(-(xx * xx).astype(f32).astype(np.float64)).astype(f32)
    mask = (vy[:, None] * vx[None, :]).astype(f32)
    if zw >= 0 and zh >= 0 and zw * 2 + 1 < win_w and zh * 2 + 1 < win_h:
        mask[wh - zh:wh + zh + 1, ww - zw:ww + zw + 1] = 0
    m64 = mask.astype(np.float64)
    px = (np.arange(win_w) - ww).astype(np.float64)[None, :]
    py = (np.arange(win_h) - wh).astype(np.float64)[:, None]
    H, W = img.shape[:2]
    out = np.asarray(corners, np.float32).reshape(-1, 2).copy()
    for k in range(out.shape[0]):
        cT = out[k].copy()
        cI = cT.copy()
        for _ in range(max_iters):
            sub = get_rect_sub_pix(img, (win_w + 2, win_h + 2),
                                   (float(cI[0]), float(cI[1])),
                                   patch_type="f32").astype(np.float64)
            tgx = sub[1:-1, 2:] - sub[1:-1, :-2]
            tgy = sub[2:, 1:-1] - sub[:-2, 1:-1]
            gxx = tgx * tgx * m64
            gxy = tgx * tgy * m64
            gyy = tgy * tgy * m64
            # cv2 accumulates sequentially in row-major f64 (numpy's
            # pairwise .sum() flips rare f32-boundary ties downstream)
            a = b = c = bb1 = bb2 = 0.0
            t1 = gxx * px + gxy * py
            t2 = gxy * px + gyy * py
            for i in range(win_h):
                for j in range(win_w):
                    a += gxx[i, j]
                    b += gxy[i, j]
                    c += gyy[i, j]
                    bb1 += t1[i, j]
                    bb2 += t2[i, j]
            det = a * c - b * b
            if abs(det) <= np.finfo(np.float64).eps ** 2:
                break
            scale = 1.0 / det
            nx = f32(float(cI[0]) + c * scale * bb1 - b * scale * bb2)
            ny = f32(float(cI[1]) - b * scale * bb1 + a * scale * bb2)
            err = (float(nx) - float(cI[0])) ** 2 + (float(ny) - float(cI[1])) ** 2
            cI = np.array([nx, ny], np.float32)
            if not (0 <= cI[0] < W and 0 <= cI[1] < H):
                break
            if err <= eps:
                break
        if abs(float(cI[0]) - float(cT[0])) > ww or \
           abs(float(cI[1]) - float(cT[1])) > wh:
            cI = cT
        out[k] = cI
    return out.reshape(np.asarray(corners, np.float32).shape)


# ---------------------------------------------------------------------------
# Pyramidal Lucas-Kanade optical flow (cv2 video/lkpyramid.cpp)
# ---------------------------------------------------------------------------

def scharr_deriv(img: np.ndarray) -> np.ndarray:
    """cv2's ``calcSharrDeriv`` (lkpyramid.cpp) — int16 ``[H,W,2]``
    (dx, dy) via the separable Scharr pair smooth=[3,10,3] /
    diff=[-1,0,1], REFLECT_101 edge rows/cols.  Bit-exact vs the
    derivative mats of ``cv2.buildOpticalFlowPyramid`` (40/40 fuzz)."""
    H, W = img.shape[:2]
    s = img.astype(np.int32)
    up = np.roll(s, 1, 0)
    up[0] = s[1] if H > 1 else s[0]
    dn = np.roll(s, -1, 0)
    dn[-1] = s[-2] if H > 1 else s[-1]
    t0 = (up + dn) * 3 + s * 10
    t1 = dn - up

    def hshift(A):
        l = np.roll(A, 1, 1)
        l[:, 0] = A[:, 1] if W > 1 else A[:, 0]
        r = np.roll(A, -1, 1)
        r[:, -1] = A[:, -2] if W > 1 else A[:, -1]
        return l, r

    l0, r0 = hshift(t0)
    l1, r1 = hshift(t1)
    dx = (r0 - l0).astype(np.int16)
    dy = ((l1 + r1) * 3 + t1 * 10).astype(np.int16)
    return np.stack([dx, dy], -1)


def build_optical_flow_pyramid(img: np.ndarray, win_size=(21, 21),
                               max_level: int = 3):
    """``cv2.buildOpticalFlowPyramid`` levels (images only, no border
    allocation — the tracker pads on the fly).  Returns
    ``(actual_max_level, [u8 levels])``; clamp rule pinned: after
    building level L, stop if ``((w+1)//2, (h+1)//2)`` has width OR
    height ≤ winSize (probed 5 size/win combos)."""
    ww, wh = int(win_size[0]), int(win_size[1])
    levels = [np.asarray(img)]
    lvl = 0
    for level in range(int(max_level)):
        h, w = levels[-1].shape[:2]
        nw, nh = (w + 1) // 2, (h + 1) // 2
        if nw <= ww or nh <= wh:
            break
        levels.append(pyr_down(levels[-1]))
        lvl += 1
    return lvl, levels


def _lk_pad(level_img: np.ndarray, ww: int, wh: int):
    """Pad a pyramid level the way buildOpticalFlowPyramid allocates
    it: image border REFLECT_101 (pyrBorder default), derivative
    border CONSTANT 0 (derivBorder default); pad = winSize."""
    H, W = level_img.shape[:2]
    yi = np.clip(np.abs(np.arange(-wh, H + wh)), 0, None)
    yi = np.where(yi >= H, 2 * (H - 1) - yi, yi)
    xi = np.clip(np.abs(np.arange(-ww, W + ww)), 0, None)
    xi = np.where(xi >= W, 2 * (W - 1) - xi, xi)
    I = level_img[np.ix_(yi, xi)].astype(np.int32)
    d = scharr_deriv(level_img).astype(np.int32)
    D = np.zeros((H + 2 * wh, W + 2 * ww, 2), np.int32)
    D[wh:wh + H, ww:ww + W] = d
    return I, D


def calc_optical_flow_pyr_lk(prev_img: np.ndarray, next_img: np.ndarray,
                             prev_pts: np.ndarray, win_size=(21, 21),
                             max_level: int = 3, max_count: int = 30,
                             epsilon: float = 0.01,
                             min_eig_threshold: float = 1e-4,
                             next_pts: np.ndarray = None,
                             use_initial_flow: bool = False,
                             get_min_eigenvals: bool = False):
    """``cv2.calcOpticalFlowPyrLK`` (grayscale u8) — pyramidal
    Lucas-Kanade sparse tracking; lkpyramid.cpp's exact fixed-point
    scheme.  Returns ``(next_pts f32 [N,2], status u8 [N], err f32
    [N])``.

    Pinned laws: Q14 bilinear taps (``iw = cvRound(w·2^14)``, last
    weight closes the sum), patch DESCALE ``(s + 2^(14-5-1)) >> (14-5)``
    into int16 <<5, derivative DESCALE ``>> 14``, structure tensor and
    mismatch vector accumulated through cv2's SIMD lane structure
    (``simd_sum``) scaled by ``FLT_SCALE = 2^-20``, plain-f32 delta
    solve (``acctype`` IS float; an fma-contracted D flips ulps), the
    0.01 flip-flop damper with its f32 sums (``nextPt -= delta·0.5``),
    min-eigenvalue gate per window area, REFLECT_101 image /
    CONSTANT-0 derivative padding (winSize) outside each level, and
    the L1 error DIVIDED by f32(32·area).

    Parity (200-config / 3000-point sweep, docs/PARITY.md): status
    bitwise ALWAYS; 99.6 % of points bitwise with err bitwise wherever
    the point is; the residual class is deep-iteration trajectories
    (≥ ~25 solves) whose ulp ties amplify — ≤ 1e-4 px, with cv2's own
    value build-dependent at that depth (every candidate SIMD
    width/reduce/fma model agrees with THIS model on the probed
    divergence steps, docs/PARITY.md).
    """
    f32 = np.float32
    ww, wh = int(win_size[0]), int(win_size[1])
    half = (f32((ww - 1) * 0.5), f32((wh - 1) * 0.5))
    pts = np.asarray(prev_pts, np.float32).reshape(-1, 2)
    N = pts.shape[0]
    crit_cnt = min(max(int(max_count), 0), 100)
    eps = min(max(float(epsilon), 0.0), 10.0)
    eps *= eps
    lvlA, pyrA = build_optical_flow_pyramid(prev_img, (ww, wh), max_level)
    lvlB, pyrB = build_optical_flow_pyramid(next_img, (ww, wh), max_level)
    max_level = min(int(max_level), min(lvlA, lvlB))
    out = (np.asarray(next_pts, np.float32).reshape(-1, 2).copy()
           if (use_initial_flow and next_pts is not None)
           else np.zeros((N, 2), np.float32))
    status = np.ones(N, np.uint8)
    err = np.zeros(N, np.float32)
    W_BITS = 14
    FLT_SCALE = f32(1.0 / (1 << 20))

    def descale(v, n):
        return (v + (1 << (n - 1))) >> n

    def simd_sum(A, B):
        """cv2's universal-intrinsics accumulation of the product sum
        ``Σ A·B`` (int windows [wh, ww]): 8-wide vector blocks feed a
        4-lane f32 accumulator (lane l takes in-block positions l and
        l+4, lo half then hi half) via ``v_muladd`` = hardware FMA
        (single rounding: f64 emulation is exact for f32), leftover
        columns accumulate as scalar f32 of the EXACT int product
        row-major, and the total is ``tail + ((l0+l2) + (l1+l3))``
        (SSE v_reduce_sum) — pinned via the GET_MIN_EIGENVALS probe
        and the single-step iteration traces (docs/PARITY.md)."""
        lanes = np.zeros(4, np.float64)
        tail = f32(0.0)
        h, w = A.shape
        nb = w // 8 if w >= 8 else 0
        vw = nb * 8
        Af = A.astype(np.float64)
        Bf = B.astype(np.float64)
        P = (A * B).astype(f32)
        for i in range(h):
            for bkl in range(nb):
                x = bkl * 8
                for hf in (0, 1):
                    for l in range(4):
                        k = x + 4 * hf + l
                        lanes[l] = np.float64(f32(Af[i, k] * Bf[i, k]
                                                  + lanes[l]))
            for x in range(vw, w):
                tail = f32(tail + P[i, x])
        lf = lanes.astype(f32)
        red = f32(f32(lf[0] + lf[2]) + f32(lf[1] + lf[3]))
        return f32(tail + red)

    for level in range(max_level, -1, -1):
        I, DI = _lk_pad(pyrA[level], ww, wh)
        J, DJ = _lk_pad(pyrB[level], ww, wh)
        H, W = pyrA[level].shape[:2]
        HB, WB = pyrB[level].shape[:2]
        for p in range(N):
            prevPt = pts[p] * f32(1.0 / (1 << level))
            if level == max_level:
                nextPt = (out[p] * f32(1.0 / (1 << level))
                          if use_initial_flow else prevPt.copy())
            else:
                nextPt = out[p] * f32(2.0)
            out[p] = nextPt
            pPt = prevPt - np.array(half, f32)
            ipx, ipy = int(np.floor(pPt[0])), int(np.floor(pPt[1]))
            if ipx < -ww or ipx >= W or ipy < -wh or ipy >= H:
                if level == 0:
                    status[p] = 0
                    err[p] = 0
                continue
            a, b = f32(pPt[0] - ipx), f32(pPt[1] - ipy)
            iw00 = int(np.rint((f32(1) - a) * (f32(1) - b) * (1 << W_BITS)))
            iw01 = int(np.rint(a * (f32(1) - b) * (1 << W_BITS)))
            iw10 = int(np.rint((f32(1) - a) * b * (1 << W_BITS)))
            iw11 = (1 << W_BITS) - iw00 - iw01 - iw10
            ys = ipy + wh
            xs = ipx + ww
            Iw = I[ys:ys + wh + 1, xs:xs + ww + 1]
            Dw = DI[ys:ys + wh + 1, xs:xs + ww + 1]
            ival = descale(Iw[:-1, :-1] * iw00 + Iw[:-1, 1:] * iw01
                           + Iw[1:, :-1] * iw10 + Iw[1:, 1:] * iw11,
                           W_BITS - 5).astype(np.int32)
            dval = descale(Dw[:-1, :-1] * iw00 + Dw[:-1, 1:] * iw01
                           + Dw[1:, :-1] * iw10 + Dw[1:, 1:] * iw11,
                           W_BITS).astype(np.int32)
            ixv = dval[..., 0]
            iyv = dval[..., 1]
            A11 = f32(simd_sum(ixv, ixv) * FLT_SCALE)
            A12 = f32(simd_sum(ixv, iyv) * FLT_SCALE)
            A22 = f32(simd_sum(iyv, iyv) * FLT_SCALE)
            # acctype is FLOAT in lkpyramid.cpp: D, minEig and the delta
            # solve are all plain f32 ops (probed; an fma-contracted D
            # flips the iterate's last ulp)
            D = f32(f32(A11 * A22) - f32(A12 * A12))
            t = f32(A11 - A22)
            minEig = f32(f32(f32(A22 + A11)
                             - f32(np.sqrt(f32(f32(t * t)
                                               + f32(f32(f32(4.0) * A12)
                                                     * A12)))))
                         / f32(2 * ww * wh))
            if get_min_eigenvals and level == 0:
                err[p] = f32(minEig)
            if minEig < f32(min_eig_threshold) or D < np.finfo(f32).eps:
                if level == 0:
                    status[p] = 0
                continue
            D = f32(f32(1.0) / D)
            nPt = nextPt - np.array(half, f32)
            prevDelta = np.zeros(2, f32)
            broke_outside = False
            for j in range(crit_cnt):
                inx, iny = int(np.floor(nPt[0])), int(np.floor(nPt[1]))
                if inx < -ww or inx >= WB or iny < -wh or iny >= HB:
                    if level == 0:
                        status[p] = 0
                    broke_outside = True
                    break
                a, b = f32(nPt[0] - inx), f32(nPt[1] - iny)
                jw00 = int(np.rint((f32(1) - a) * (f32(1) - b) * (1 << W_BITS)))
                jw01 = int(np.rint(a * (f32(1) - b) * (1 << W_BITS)))
                jw10 = int(np.rint((f32(1) - a) * b * (1 << W_BITS)))
                jw11 = (1 << W_BITS) - jw00 - jw01 - jw10
                ysb = iny + wh
                xsb = inx + ww
                Jw = J[ysb:ysb + wh + 1, xsb:xsb + ww + 1]
                jval = descale(Jw[:-1, :-1] * jw00 + Jw[:-1, 1:] * jw01
                               + Jw[1:, :-1] * jw10 + Jw[1:, 1:] * jw11,
                               W_BITS - 5).astype(np.int32)
                diff = jval - ival
                b1 = f32(simd_sum(diff, ixv) * FLT_SCALE)
                b2 = f32(simd_sum(diff, iyv) * FLT_SCALE)
                dx = f32(f32(f32(A12 * b2) - f32(A22 * b1)) * D)
                dy = f32(f32(f32(A12 * b1) - f32(A11 * b2)) * D)
                nPt = (nPt + np.array([dx, dy], f32)).astype(f32)
                out[p] = nPt + np.array(half, f32)
                if float(dx) * float(dx) + float(dy) * float(dy) <= eps:
                    break
                if (j > 0 and abs(float(f32(dx + prevDelta[0]))) < 0.01
                        and abs(float(f32(dy + prevDelta[1]))) < 0.01):
                    out[p] = (out[p]
                              - np.array([dx, dy], f32) * f32(0.5)).astype(f32)
                    break
                prevDelta = np.array([dx, dy], f32)
            if (status[p] and not broke_outside and level == 0
                    and not get_min_eigenvals):
                nPtE = (out[p] - np.array(half, f32)).astype(f32)
                inx, iny = int(np.floor(nPtE[0])), int(np.floor(nPtE[1]))
                if inx < -ww or inx >= WB or iny < -wh or iny >= HB:
                    status[p] = 0
                    err[p] = 0
                    continue
                a, b = f32(nPtE[0] - inx), f32(nPtE[1] - iny)
                jw00 = int(np.rint((f32(1) - a) * (f32(1) - b) * (1 << W_BITS)))
                jw01 = int(np.rint(a * (f32(1) - b) * (1 << W_BITS)))
                jw10 = int(np.rint((f32(1) - a) * b * (1 << W_BITS)))
                jw11 = (1 << W_BITS) - jw00 - jw01 - jw10
                ysb = iny + wh
                xsb = inx + ww
                Jw = J[ysb:ysb + wh + 1, xsb:xsb + ww + 1]
                jval = descale(Jw[:-1, :-1] * jw00 + Jw[:-1, 1:] * jw01
                               + Jw[1:, :-1] * jw10 + Jw[1:, 1:] * jw11,
                               W_BITS - 5).astype(np.int32)
                diff = (jval - ival).astype(f32)
                errval = f32(0.0)
                for i in range(wh):
                    for jj in range(ww):
                        errval = f32(errval + abs(f32(diff[i, jj])))
                # cv2: errval * 1.f/(32*w*h) parses as a DIVISION
                err[p] = f32(errval / f32(32 * ww * wh))
    return out, status, err


class _CvRNG:
    """cv2::RNG — the exact MWC generator (state·4164903690 + carry)."""

    def __init__(self, state=2 ** 64 - 1):
        self.state = state & 0xFFFFFFFFFFFFFFFF

    def next(self) -> int:
        s = self.state
        self.state = ((s & 0xFFFFFFFF) * 4164903690 + (s >> 32)) \
            & 0xFFFFFFFFFFFFFFFF
        return self.state & 0xFFFFFFFF

    def uniform_int(self, a: int, b: int) -> int:
        return a + self.next() % (b - a) if b > a else a


def hough_lines_p(img: np.ndarray, rho: float = 1.0,
                  theta: float = np.pi / 180, threshold: int = 100,
                  min_line_length: int = 0,
                  max_line_gap: int = 0,
                  lines_max: int = 2 ** 31 - 1) -> np.ndarray:
    """``cv2.HoughLinesP`` — probabilistic Hough with cv2's
    erase-as-you-walk algorithm, BIT-EXACT (the routine seeds a LOCAL
    ``RNG((uint64)-1)`` per call, so it is deterministic; the exact MWC
    stream is reproduced by :class:`_CvRNG`).

    Pinned laws: ``numangle = cvRound(π/θ)``, ``numrho =
    cvRound(((W+H)·2+1)/ρ)``; trig table ``f32(cos(n·θ)·1/ρ)`` on the
    f64 product (unlike standard HoughLines' incremental-f32 angle);
    vote ``r = cvRound(f32(f32(x·tcos) + f32(y·tsin))) + (numrho-1)/2``;
    line walk in Q16 fixed point with ``cvRound(b·2^16/|a|)`` slope,
    gap counter reset on every hit; good = |Δx| ≥ len OR |Δy| ≥ len;
    second walk un-votes and clears the mask up to the recorded ends.
    Returns ``[N, 4]`` int32 (x1, y1, x2, y2).
    """
    if img.dtype != np.uint8:
        raise TypeError("HoughLinesP requires uint8 input")
    f32 = np.float32
    H, W = img.shape
    numangle = int(np.rint(np.pi / theta))
    numrho = int(np.rint(((W + H) * 2 + 1) / rho))
    irho = 1.0 / rho
    ns = np.arange(numangle, dtype=np.float64)
    tcos = (np.cos(ns * theta) * irho).astype(f32)
    tsin = (np.sin(ns * theta) * irho).astype(f32)
    mask = (img != 0)
    ys, xs = np.nonzero(img)
    # row-major collection order (cv2 scans rows)
    nz = list(zip(xs.tolist(), ys.tolist()))
    acc = np.zeros((numangle, numrho), np.int32)
    rng = _CvRNG()
    out = []
    SHIFT = 16
    count = len(nz)
    c0 = (numrho - 1) // 2
    while count > 0:
        idx = rng.uniform_int(0, count)
        j, i = nz[idx]
        nz[idx] = nz[count - 1]
        count -= 1
        if not mask[i, j]:
            continue
        rr = (np.rint((f32(j) * tcos + f32(i) * tsin).astype(f32))
              .astype(np.int64) + c0)
        acc[np.arange(numangle), rr] += 1
        vals = acc[np.arange(numangle), rr]
        max_n = int(np.argmax(vals))
        max_val = int(vals[max_n])
        if max_val < threshold:
            continue
        a = -float(tsin[max_n])
        b = float(tcos[max_n])
        x0, y0 = j, i
        if abs(a) > abs(b):
            xflag = True
            dx0 = 1 if a > 0 else -1
            dy0 = int(np.rint(b * (1 << SHIFT) / abs(a)))
            y0 = (y0 << SHIFT) + (1 << (SHIFT - 1))
        else:
            xflag = False
            dy0 = 1 if b > 0 else -1
            dx0 = int(np.rint(a * (1 << SHIFT) / abs(b)))
            x0 = (x0 << SHIFT) + (1 << (SHIFT - 1))
        line_end = [[0, 0], [0, 0]]
        for k in (0, 1):
            gap = 0
            x, y = x0, y0
            dx, dy = (dx0, dy0) if k == 0 else (-dx0, -dy0)
            while True:
                if xflag:
                    j1, i1 = x, y >> SHIFT
                else:
                    j1, i1 = x >> SHIFT, y
                if j1 < 0 or j1 >= W or i1 < 0 or i1 >= H:
                    break
                if mask[i1, j1]:
                    gap = 0
                    line_end[k] = [j1, i1]
                else:
                    gap += 1
                    if gap > max_line_gap:
                        break
                x += dx
                y += dy
        good = (abs(line_end[1][0] - line_end[0][0]) >= min_line_length
                or abs(line_end[1][1] - line_end[0][1]) >= min_line_length)
        for k in (0, 1):
            x, y = x0, y0
            dx, dy = (dx0, dy0) if k == 0 else (-dx0, -dy0)
            while True:
                if xflag:
                    j1, i1 = x, y >> SHIFT
                else:
                    j1, i1 = x >> SHIFT, y
                if mask[i1, j1]:
                    if good:
                        r2 = (np.rint((f32(j1) * tcos + f32(i1) * tsin)
                                      .astype(f32)).astype(np.int64) + c0)
                        acc[np.arange(numangle), r2] -= 1
                    mask[i1, j1] = False
                if i1 == line_end[k][1] and j1 == line_end[k][0]:
                    break
                x += dx
                y += dy
        if good:
            out.append([line_end[0][0], line_end[0][1],
                        line_end[1][0], line_end[1][1]])
            if len(out) >= lines_max:
                break
    return np.asarray(out, np.int32).reshape(-1, 4)


# ---------------------------------------------------------------------------
# findContours (Suzuki-Abe border following) + contour descriptors
# ---------------------------------------------------------------------------

_CONTOUR_DELTAS = ((1, 0), (1, -1), (0, -1), (-1, -1),
                   (-1, 0), (-1, 1), (0, 1), (1, 1))  # CCW from E
_CONTOUR_DIR = {d: i for i, d in enumerate(_CONTOUR_DELTAS)}


def _trace_contours(img: np.ndarray):
    """Suzuki-Abe 8-connected border following (the algorithm behind
    ``cv2.findContours``), paper-exact: 3.1 scans CLOCKWISE from the
    zero neighbour that triggered the start, 3.3 scans COUNTER-
    clockwise from the previous border pixel, marking -NBD when the
    east neighbour was examined and zero.  Returns discovery-ordered
    ``(points [(x,y)], is_hole, parent_nbd, nbd)`` (frame = NBD 1);
    point sequences are bit-exact vs cv2 (fuzz 0/60 random blobs)."""
    H, W = img.shape
    f = (img != 0).astype(np.int32)
    NBD = 1
    info = {1: (True, None)}
    out = []
    for i in range(H):
        LNBD = 1
        for j in range(W):
            fij = f[i, j]
            if fij == 0:
                continue
            outer = fij == 1 and (j == 0 or f[i, j - 1] == 0)
            hole = fij >= 1 and (j == W - 1 or f[i, j + 1] == 0)
            if outer or hole:
                NBD += 1
                if outer:
                    d_from = _CONTOUR_DIR[(-1, 0)]
                    is_hole = False
                else:
                    d_from = _CONTOUR_DIR[(1, 0)]
                    if fij > 1:
                        LNBD = fij
                    is_hole = True
                parent = (info[LNBD][1] if is_hole == info[LNBD][0]
                          else LNBD)
                info[NBD] = (is_hole, parent)
                found = None
                for t in range(8):
                    d = (d_from - t) % 8
                    dx, dy = _CONTOUR_DELTAS[d]
                    x2, y2 = j + dx, i + dy
                    if 0 <= x2 < W and 0 <= y2 < H and f[y2, x2] != 0:
                        found = (x2, y2)
                        break
                pts = [(j, i)]
                if found is None:
                    f[i, j] = -NBD
                    out.append((pts, is_hole, parent, NBD))
                else:
                    x1, y1 = found
                    x2, y2 = x1, y1
                    x3, y3 = j, i
                    while True:
                        d_start = _CONTOUR_DIR[(x2 - x3, y2 - y3)]
                        east_zero = False
                        for t in range(1, 9):
                            d = (d_start + t) % 8
                            dx, dy = _CONTOUR_DELTAS[d]
                            x4, y4 = x3 + dx, y3 + dy
                            if (0 <= x4 < W and 0 <= y4 < H
                                    and f[y4, x4] != 0):
                                break
                            if (dx, dy) == (1, 0):
                                east_zero = True
                        if east_zero:
                            f[y3, x3] = -NBD
                        elif f[y3, x3] == 1:
                            f[y3, x3] = NBD
                        if (x4, y4) == (j, i) and (x3, y3) == (x1, y1):
                            break
                        pts.append((x4, y4))
                        x2, y2 = x3, y3
                        x3, y3 = x4, y4
                    out.append((pts, is_hole, parent, NBD))
            if abs(f[i, j]) > 1:
                LNBD = abs(f[i, j])
    return out


def _chain_simple(pts):
    """CHAIN_APPROX_SIMPLE: the cyclic direction-change corners, in
    traversal order — the start pixel is DROPPED when its incoming and
    outgoing directions agree (probed: cv2 starts such contours at the
    first corner after the scan hit)."""
    n = len(pts)
    if n == 1:
        return list(pts)
    keep = []
    for k in range(n):
        pp = pts[(k - 1) % n]
        p = pts[k]
        pn = pts[(k + 1) % n]
        if (p[0] - pp[0], p[1] - pp[1]) != (pn[0] - p[0], pn[1] - p[1]):
            keep.append(p)
    return keep if keep else [pts[0]]


def find_contours(img: np.ndarray, mode: str = "list",
                  method: str = "simple"):
    """``cv2.findContours`` — returns ``(contours, hierarchy)`` with
    contours a list of int32 ``[N, 2]`` (x, y) arrays and hierarchy
    int32 ``[M, 4]`` (next, prev, first_child, parent), bit-exact
    vs cv2 5.0 in content, ORDER and hierarchy (fuzz per mode/method).

    Pinned structure: contours discovered in raster order; every
    sibling list is emitted in REVERSE discovery order; ``list`` is the
    flat reverse, ``tree`` a preorder DFS, ``ccomp`` flattens to two
    levels (every outer border at level 0 in reverse discovery, each
    followed by its holes), ``external`` keeps only frame-child outers.
    ``method``: "none" (every boundary pixel) or "simple" (cyclic
    direction-change corners, start kept).
    """
    if img.dtype != np.uint8:
        raise TypeError("findContours requires uint8 input")
    mode = mode.lower()
    method = method.lower()
    if mode not in ("list", "external", "ccomp", "tree"):
        raise ValueError(f"unknown mode {mode!r}")
    if method not in ("none", "simple"):
        raise ValueError(f"unknown method {method!r}")
    traced = _trace_contours(img)
    items = []   # (points, is_hole, parent_nbd, nbd)
    for pts, is_hole, parent, nbd in traced:
        if method == "simple":
            pts = _chain_simple(pts)
        items.append((pts, is_hole, parent, nbd))
    by_nbd = {it[3]: it for it in items}
    children = {}
    for it in items:
        children.setdefault(it[2], []).append(it[3])
    for k in children:
        children[k] = children[k][::-1]  # reverse discovery
    order = []
    parent_of = {}
    if mode == "list":
        order = [it[3] for it in items][::-1]
        parent_of = {nbd: None for nbd in order}
    elif mode == "external":
        order = children.get(1, [])
        order = [n for n in order if not by_nbd[n][1]]
        parent_of = {nbd: None for nbd in order}
    elif mode == "tree":
        def dfs(nbd):
            order.append(nbd)
            for c in children.get(nbd, []):
                parent_of[c] = nbd
                dfs(c)
        for top in children.get(1, []):
            parent_of[top] = None
            dfs(top)
    else:  # ccomp: all outers level 0 (reverse discovery), then holes
        outers = [it[3] for it in items if not it[1]][::-1]
        for o in outers:
            parent_of[o] = None
            order.append(o)
            for h in children.get(o, []):
                if by_nbd[h][1]:
                    parent_of[h] = o
                    order.append(h)
    idx = {nbd: k for k, nbd in enumerate(order)}
    M = len(order)
    hier = np.full((M, 4), -1, np.int32)
    # sibling chains per parent, in output order
    sib = {}
    for nbd in order:
        sib.setdefault(parent_of.get(nbd), []).append(nbd)
    for plist in sib.values():
        for a, b in zip(plist, plist[1:]):
            hier[idx[a], 0] = idx[b]
            hier[idx[b], 1] = idx[a]
    for nbd in order:
        p = parent_of.get(nbd)
        if p is not None:
            hier[idx[nbd], 3] = idx[p]
            if hier[idx[p], 2] < 0:
                hier[idx[p], 2] = idx[nbd]
    contours = [np.asarray(by_nbd[n][0], np.int32).reshape(-1, 2)
                for n in order]
    return contours, hier.reshape(M, 4)


def contour_area(points, oriented: bool = False) -> float:
    """``cv2.contourArea`` — Green's-theorem signed area, f64 edge
    cross products accumulated sequentially, ×0.5; |·| unless
    ``oriented`` (bit-exact vs cv2, int and f32 contours)."""
    pts = np.asarray(points).reshape(-1, 2)
    n = len(pts)
    if n == 0:
        return 0.0
    a00 = 0.0
    px, py = float(pts[-1, 0]), float(pts[-1, 1])
    for k in range(n):
        x, y = float(pts[k, 0]), float(pts[k, 1])
        a00 += px * y - py * x
        px, py = x, y
    a00 *= 0.5
    return a00 if oriented else abs(a00)


def arc_length(points, closed: bool) -> float:
    """``cv2.arcLength`` — per edge ``s = f32(f32(dx·dx) + f32(dy·dy))``
    on Point2f-cast coords, the square root taken in FLOAT (cv2 runs
    ``cv::sqrt`` over a buffered f32 array), f64 sum — bit-exact
    (0/100 probe configs)."""
    f32 = np.float32
    pts = np.asarray(points).reshape(-1, 2).astype(np.float32)
    n = len(pts)
    if n < 2:
        return 0.0
    total = 0.0
    rng_last = n if closed else n - 1
    for k in range(rng_last):
        p = pts[k]
        q = pts[(k + 1) % n]
        dx = f32(q[0] - p[0])
        dy = f32(q[1] - p[1])
        s = f32(f32(dx * dx) + f32(dy * dy))
        total += float(f32(np.sqrt(np.float64(s))))
    return total


def bounding_rect(points):
    """``cv2.boundingRect`` — (x, y, w, h); ints exact, floats via
    cvFloor/cvCeil per cv2."""
    pts = np.asarray(points).reshape(-1, 2)
    if np.issubdtype(pts.dtype, np.integer):
        x0, y0 = int(pts[:, 0].min()), int(pts[:, 1].min())
        x1, y1 = int(pts[:, 0].max()), int(pts[:, 1].max())
    else:
        x0 = int(np.floor(pts[:, 0].min()))
        y0 = int(np.floor(pts[:, 1].min()))
        x1 = int(np.ceil(pts[:, 0].max()))
        y1 = int(np.ceil(pts[:, 1].max()))
    return (x0, y0, x1 - x0 + 1, y1 - y0 + 1)


def contour_moments(points):
    """``cv2.moments`` on a CONTOUR (point list) — cv2's Green-formula
    closed forms (moments.cpp contourMoments), sequential f64 edge
    accumulation with the 1/2·1/6·1/12·1/20 scalings and the
    negative-area sign flip; central/normalized moments via the
    ``moments``-style completion.  Returns the dict of 24 cv2 keys."""
    pts = np.asarray(points).reshape(-1, 2).astype(np.float64)
    n = len(pts)
    a00 = a10 = a01 = a20 = a11 = a02 = a30 = a21 = a12 = a03 = 0.0
    xi_1, yi_1 = pts[-1]
    xi_12, yi_12 = xi_1 * xi_1, yi_1 * yi_1
    for k in range(n):
        xi, yi = pts[k]
        xi2, yi2 = xi * xi, yi * yi
        dxy = xi_1 * yi - xi * yi_1
        xii_1, yii_1 = xi_1 + xi, yi_1 + yi
        a00 += dxy
        a10 += dxy * xii_1
        a01 += dxy * yii_1
        a20 += dxy * (xi_1 * xii_1 + xi2)
        a11 += dxy * (xi_1 * (yii_1 + yi_1) + xi * (yii_1 + yi))
        a02 += dxy * (yi_1 * yii_1 + yi2)
        a30 += dxy * xii_1 * (xi_12 + xi2)
        a03 += dxy * yii_1 * (yi_12 + yi2)
        a21 += dxy * (xi_12 * (3 * yi_1 + yi) + 2 * xi * xi_1 * yii_1
                      + xi2 * (yi_1 + 3 * yi))
        a12 += dxy * (yi_12 * (3 * xi_1 + xi) + 2 * yi * yi_1 * xii_1
                      + yi2 * (xi_1 + 3 * xi))
        xi_1, yi_1 = xi, yi
        xi_12, yi_12 = xi2, yi2
    if abs(a00) > 1.19209289550781250000e-7:
        sgn = 1.0 if a00 > 0 else -1.0
        db1_2, db1_6, db1_12 = sgn * 0.5, sgn / 6, sgn / 12
        db1_20, db1_24, db1_60 = sgn * 0.05, sgn / 24, sgn / 60
        m = {
            "m00": a00 * db1_2,
            "m10": a10 * db1_6, "m01": a01 * db1_6,
            "m20": a20 * db1_12, "m11": a11 * db1_24,
            "m02": a02 * db1_12,
            "m30": a30 * db1_20, "m21": a21 * db1_60,
            "m12": a12 * db1_60, "m03": a03 * db1_20,
        }
    else:
        m = {k: 0.0 for k in ("m00", "m10", "m01", "m20", "m11", "m02",
                              "m30", "m21", "m12", "m03")}
    # cv2 Moments completion (inv_m00 = 0 on degenerate contours)
    inv_m00 = 0.0
    cx = cy = 0.0
    if abs(m["m00"]) > np.finfo(np.float64).eps:
        inv_m00 = 1.0 / m["m00"]
        cx, cy = m["m10"] * inv_m00, m["m01"] * inv_m00
    m["mu20"] = m["m20"] - m["m10"] * cx
    m["mu11"] = m["m11"] - m["m10"] * cy
    m["mu02"] = m["m02"] - m["m01"] * cy
    m["mu30"] = m["m30"] - cx * (3 * m["mu20"] + cx * m["m10"])
    m["mu21"] = (m["m21"] - cx * (2 * m["mu11"] + cx * m["m01"])
                 - cy * m["mu20"])
    m["mu12"] = (m["m12"] - cy * (2 * m["mu11"] + cy * m["m10"])
                 - cx * m["mu02"])
    m["mu03"] = m["m03"] - cy * (3 * m["mu02"] + cy * m["m01"])
    s2 = inv_m00 * inv_m00
    s3 = s2 * np.sqrt(abs(inv_m00))
    for k in ("mu20", "mu11", "mu02"):
        m["nu" + k[2:]] = m[k] * s2
    for k in ("mu30", "mu21", "mu12", "mu03"):
        m["nu" + k[2:]] = m[k] * s3
    return m


def _sklansky(ptr, pts, start, end, nsign, sign2):
    """cv2 ``Sklansky_`` — one hull chain over x-sorted point order."""
    incr = 1 if end > start else -1
    pprev, pcur, pnext = start, start + incr, start + 2 * incr
    if start == end or pts[ptr[start]] == pts[ptr[end]]:
        return [start]
    stack = [pprev, pcur, pnext]
    end2 = end + incr

    def sign(v):
        return int(v > 0) - int(v < 0)

    while pnext != end2:
        cury = pts[ptr[pcur]][1]
        nexty = pts[ptr[pnext]][1]
        by = nexty - cury
        if sign(by) != nsign:
            ax = pts[ptr[pcur]][0] - pts[ptr[pprev]][0]
            bx = pts[ptr[pnext]][0] - pts[ptr[pcur]][0]
            ay = cury - pts[ptr[pprev]][1]
            convexity = ay * bx - ax * by
            if sign(convexity) == sign2 and (ax != 0 or ay != 0):
                pprev, pcur, pnext = pcur, pnext, pnext + incr
                stack.append(pnext)
            else:
                if pprev == start:
                    pcur = pnext
                    stack[1] = pcur
                    pnext += incr
                    stack[2] = pnext
                else:
                    stack[-2] = pnext
                    pcur = pprev
                    pprev = stack[-4]
                    stack.pop()
        else:
            pnext += incr
            stack[-1] = pnext
    return stack[:-1]


def convex_hull(points, clockwise: bool = False,
                return_points: bool = True):
    """``cv2.convexHull`` — Sklansky chains over the x-then-y sorted
    order, cv2's upper/lower assembly with the pre-swap collinearity
    stop/check, and the ascending/descending cyclic rotation
    (``ascending ⇔ (max_idx+1) mod n == min_idx``).

    BIT-EXACT (indices and order) for point sets with DISTINCT points
    (0/~500 fuzz configs); with exactly duplicated points the output is
    the same hull polygon up to a cyclic rotation — the index choice
    among equal points follows the build's unstable ``std::sort``
    (docs/PARITY.md).  Integer and f32 point arrays."""
    arr = np.asarray(points).reshape(-1, 2)
    if np.issubdtype(arr.dtype, np.integer):
        pts = [(int(p[0]), int(p[1])) for p in arr]
    else:
        pts = [(np.float32(p[0]), np.float32(p[1])) for p in arr]
    total = len(pts)
    if total == 0:
        return (np.zeros((0, 2), arr.dtype) if return_points
                else np.zeros((0,), np.int32))
    ptr = sorted(range(total), key=lambda k: (pts[k][0], pts[k][1]))
    miny = maxy = 0
    for i in range(1, total):
        y = pts[ptr[i]][1]
        if pts[ptr[miny]][1] > y:
            miny = i
        if pts[ptr[maxy]][1] < y:
            maxy = i
    if pts[ptr[0]] == pts[ptr[total - 1]]:
        out = [ptr[0]]
    else:
        out = []
        tl0 = _sklansky(ptr, pts, 0, maxy, -1, 1)
        tr0 = _sklansky(ptr, pts, total - 1, maxy, -1, -1)
        tl, tr = (tr0, tl0) if not clockwise else (tl0, tr0)
        for i in range(len(tl) - 1):
            out.append(ptr[tl[i]])
        for i in range(len(tr) - 1, 0, -1):
            out.append(ptr[tr[i]])
        stop_idx = (tr0[1] if len(tr0) > 2 else
                    (tl0[len(tl0) - 2] if len(tl0) + len(tr0) > 2 else -1))
        bl0 = _sklansky(ptr, pts, 0, miny, 1, -1)
        br0 = _sklansky(ptr, pts, total - 1, miny, 1, 1)
        if stop_idx >= 0:
            check_idx = (bl0[1] if len(bl0) > 2 else
                         (br0[2 - len(bl0)]
                          if len(bl0) + len(br0) > 2 else -1))
            if check_idx == stop_idx or (
                    check_idx >= 0
                    and pts[ptr[check_idx]] == pts[ptr[stop_idx]]):
                # all points on one line: bottom part is empty
                bl0 = bl0[:2]
                br0 = br0[:2]
        bl, br = (br0, bl0) if clockwise else (bl0, br0)
        for i in range(len(bl) - 1):
            out.append(ptr[bl[i]])
        for i in range(len(br) - 1, 0, -1):
            out.append(ptr[br[i]])
        nout = len(out)
        if nout >= 3:
            min_idx = max_idx = 0
            lt = 0
            for i in range(1, nout):
                idx = out[i]
                lt += out[i - 1] < idx
                if out[min_idx] > idx:
                    min_idx = i
                if out[max_idx] < idx:
                    max_idx = i
            mm = abs(max_idx - min_idx)
            if (mm == 1 or mm == nout - 1) and (lt <= 1 or lt >= nout - 2):
                ascending = (max_idx + 1) % nout == min_idx
                i0 = min_idx if ascending else max_idx
                if i0 > 0:
                    j = i0
                    rot = []
                    ok = True
                    for i in range(nout):
                        rot.append(out[j])
                        nj = j + 1 if j + 1 < nout else 0
                        if i < nout - 1 and (ascending != (out[j] < out[nj])):
                            ok = False
                            break
                        j = nj
                    if ok:
                        out = rot
    if return_points:
        return arr[np.asarray(out, np.int64)].reshape(-1, 2)
    return np.asarray(out, np.int32)


def is_contour_convex(points) -> bool:
    """``cv2.isContourConvex`` — orientation-flip scan over the closed
    curve (both cross-product signs seen → not convex)."""
    pts = np.asarray(points).reshape(-1, 2)
    n = len(pts)
    if n == 0:
        return False
    if np.issubdtype(pts.dtype, np.integer):
        P = [(int(p[0]), int(p[1])) for p in pts]
    else:
        P = [(np.float32(p[0]), np.float32(p[1])) for p in pts]
    prev = P[n - 2] if n >= 2 else P[0]
    cur = P[n - 1]
    dx0 = cur[0] - prev[0]
    dy0 = cur[1] - prev[1]
    orientation = 0
    for i in range(n):
        prev = cur
        cur = P[i]
        dx = cur[0] - prev[0]
        dy = cur[1] - prev[1]
        dxdy0 = dx * dy0
        dydx0 = dy * dx0
        orientation |= 2 if dydx0 > dxdy0 else (1 if dydx0 < dxdy0 else 3)
        if orientation == 3:
            return False
        dx0 = dx
        dy0 = dy
    return True


def point_polygon_test(contour, pt, measure_dist: bool = False) -> float:
    """``cv2.pointPolygonTest`` — exact crossing counter (+1/-1/0) for
    the no-distance form; signed min edge distance (f64) otherwise."""
    pts = np.asarray(contour).reshape(-1, 2)
    n = len(pts)
    is_int = (np.issubdtype(pts.dtype, np.integer)
              and float(pt[0]) == int(pt[0]) and float(pt[1]) == int(pt[1]))
    if not measure_dist and is_int:
        ipx, ipy = int(pt[0]), int(pt[1])
        P = [(int(p[0]), int(p[1])) for p in pts]
        counter = 0
        v0 = P[n - 1]
        for i in range(n):
            v = P[i]
            if (v0[1] <= ipy < v[1]) or (v[1] <= ipy < v0[1]):
                dist = ((ipy - v0[1]) * (v[0] - v0[0])
                        - (ipx - v0[0]) * (v[1] - v0[1]))
                if dist == 0:
                    return 0.0
                if (dist > 0) != (v[1] > v0[1]):
                    counter += 1
            elif v0[1] == ipy and v[1] == ipy:
                if ((v0[0] <= ipx <= v[0]) or (v[0] <= ipx <= v0[0])):
                    return 0.0
            elif (v0[1] == ipy and v0[0] == ipx) or \
                    (v[1] == ipy and v[0] == ipx):
                return 0.0
            v0 = v
        return -1.0 if counter % 2 == 0 else 1.0
    P = pts.astype(np.float64)
    px, py = float(pt[0]), float(pt[1])
    min_dist_sq = np.inf
    counter = 0
    v0 = P[n - 1]
    for i in range(n):
        v = P[i]
        if (v0[1] <= py < v[1]) or (v[1] <= py < v0[1]):
            dist = ((py - v0[1]) * (v[0] - v0[0])
                    - (px - v0[0]) * (v[1] - v0[1]))
            if (dist > 0) != (v[1] > v0[1]) and dist != 0:
                counter += 1
        dx, dy = v[0] - v0[0], v[1] - v0[1]
        dx1, dy1 = px - v0[0], py - v0[1]
        dx2, dy2 = px - v[0], py - v[1]
        if dx1 * dx + dy1 * dy <= 0:
            d = dx1 * dx1 + dy1 * dy1
        elif dx2 * dx + dy2 * dy >= 0:
            d = dx2 * dx2 + dy2 * dy2
        else:
            t = dx1 * dy - dy1 * dx
            d = t * t / (dx * dx + dy * dy)
        min_dist_sq = min(min_dist_sq, d)
        v0 = v
    dist = np.sqrt(min_dist_sq)
    if dist == 0:
        return 0.0
    inside = counter % 2 == 1
    if not measure_dist:
        return 1.0 if inside else -1.0
    return dist if inside else -dist


def convexity_defects(contour, hull_indices) -> np.ndarray:
    """``cv2.convexityDefects`` — [N, 4] int32
    (start_idx, end_idx, farthest_idx, fixpt_depth = cvRound(d·256)).
    cv2's exact convention: hull/contour co-orientation via
    ``((h1>h0)+(h2>h1)+(h0>h2)) != 2``, cyclic edge pairs starting at
    the ascending-order last vertex, STRICT depth maxima in f64 with
    the 1/sqrt edge normalization (bit-exact, 1661-contour fuzz)."""
    pts = np.asarray(contour).reshape(-1, 2).astype(np.int64)
    hull = [int(v) for v in np.asarray(hull_indices).reshape(-1)]
    n = len(pts)
    m = len(hull)
    if m < 3:
        return np.zeros((0, 4), np.int32)
    rev = ((hull[1] > hull[0]) + (hull[2] > hull[1])
           + (hull[0] > hull[2])) != 2
    out = []
    hcurr = hull[0] if rev else hull[m - 1]
    for i in range(m):
        hnext = hull[m - i - 1] if rev else hull[i]
        x0, y0 = pts[hcurr]
        x1, y1 = pts[hnext]
        dx0 = float(x1 - x0)
        dy0 = float(y1 - y0)
        scale = 0.0 if dx0 == 0 and dy0 == 0 else \
            1.0 / np.sqrt(dx0 * dx0 + dy0 * dy0)
        deepest = -1
        depth = 0.0
        is_defect = False
        j = hcurr
        while True:
            j = (j + 1) % n
            if j == hnext:
                break
            dx = float(pts[j][0] - x0)
            dy = float(pts[j][1] - y0)
            dist = abs(-dy0 * dx + dx0 * dy) * scale
            if dist > depth:
                depth = dist
                deepest = j
                is_defect = True
        if is_defect:
            out.append([hcurr, hnext, deepest,
                        int(np.rint(depth * 256.0))])
        hcurr = hnext
    return np.asarray(out, np.int32).reshape(-1, 4)


def approx_poly_dp(curve, epsilon, closed):
    """``cv2.approxPolyDP`` — BIT-EXACT vs cv2 5.0 (0/10584 int +
    0/1200 f32 fuzz configs).

    cv2 5.0 changed the law: the recursion rejects by squared
    DISTANCE-TO-SEGMENT (endpoint Euclidean outside the perpendicular
    band) compared directly against eps² — NOT the classic
    cross-product-vs-chord test (probed: a point past the chord end
    collapses at eps = its endpoint distance, not its line distance).
    The slice bookkeeping matches the classic implementation: the
    3-pass approximate-farthest-pair initializer for closed curves,
    LIFO slice stack, strict > farthest selection, and the final
    collinearity cleanup pass with the 0.5·eps²·len² rule.
    """
    src = np.asarray(curve).reshape(-1, 2)
    is_int = np.issubdtype(src.dtype, np.integer)
    pts = [(float(p[0]), float(p[1])) for p in src]
    count0 = count = len(pts)
    if count == 0:
        return src[:0]
    eps = float(epsilon)
    eps *= eps
    init_iters = 3
    is_closed = bool(closed)
    stack = []
    dst = [None] * (count + 8)
    new_count = 0
    pos = 0
    le_eps = False
    rs_start = 0

    def read_pt(pos):
        pt = pts[pos]
        pos += 1
        if pos >= count:
            pos = 0
        return pt, pos

    if not is_closed:
        end_pt = pts[0]
        start_pt = pts[count - 1]
        if start_pt != end_pt:
            stack.append((0, count - 1))
        else:
            is_closed = True
            init_iters = 1

    if is_closed:
        rs_start = 0
        for i in range(init_iters):
            max_dist = 0.0
            pos = (pos + rs_start) % count
            start_pt, pos = read_pt(pos)
            for j in range(1, count):
                pt, pos = read_pt(pos)
                dx = pt[0] - start_pt[0]
                dy = pt[1] - start_pt[1]
                dist = dx * dx + dy * dy
                if dist > max_dist:
                    max_dist = dist
                    rs_start = j
            le_eps = max_dist <= eps
        if not le_eps:
            rs_end = slice_start = pos % count
            slice_end = rs_start = (rs_start + slice_start) % count
            stack.append((rs_start, rs_end))
            stack.append((slice_start, slice_end))
        else:
            dst[new_count] = pts[pos]; new_count += 1

    while stack:
        slice_start, slice_end = stack.pop()
        end_pt = pts[slice_end]
        pos = slice_start
        start_pt, pos = read_pt(pos)
        if pos != slice_end:
            max_dist = 0.0
            dx = end_pt[0] - start_pt[0]
            dy = end_pt[1] - start_pt[1]
            L = dx * dx + dy * dy
            while pos != slice_end:
                pt, pos = read_pt(pos)
                dx1 = pt[0] - start_pt[0]
                dy1 = pt[1] - start_pt[1]
                t = dx1 * dx + dy1 * dy
                if t <= 0 or L == 0:
                    dist = dx1 * dx1 + dy1 * dy1
                elif t >= L:
                    dx2 = pt[0] - end_pt[0]
                    dy2 = pt[1] - end_pt[1]
                    dist = dx2 * dx2 + dy2 * dy2
                else:
                    c = dx1 * dy - dy1 * dx
                    dist = c * c / L
                if dist > max_dist:
                    max_dist = dist
                    rs_start = (pos + count - 1) % count
            le_eps = max_dist <= eps
        else:
            le_eps = True
            start_pt = pts[slice_start]
        if le_eps:
            dst[new_count] = start_pt; new_count += 1
        else:
            stack.append((rs_start, slice_end))
            stack.append((slice_start, rs_start))

    if not is_closed:
        dst[new_count] = pts[count - 1]; new_count += 1

    # final cleanup
    is_closed = bool(closed)
    count = new_count
    if count > 0:
        pos = count - 1 if is_closed else 0
        def read_dst(pos):
            pt = dst[pos]
            pos += 1
            if pos >= count:
                pos = 0
            return pt, pos
        start_pt, pos = read_dst(pos)
        wpos = pos
        pt, pos = read_dst(pos)
        i = 0 if is_closed else 1
        limit = count - (0 if is_closed else 1)
        while i < limit and new_count > 2:
            end_pt, pos = read_dst(pos)
            dx = end_pt[0] - start_pt[0]
            dy = end_pt[1] - start_pt[1]
            dist = abs((pt[0] - start_pt[0]) * dy
                       - (pt[1] - start_pt[1]) * dx)
            sip = ((pt[0] - start_pt[0]) * (end_pt[0] - pt[0])
                   + (pt[1] - start_pt[1]) * (end_pt[1] - pt[1]))
            if (dist * dist <= 0.5 * eps * (dx * dx + dy * dy)
                    and dx != 0 and dy != 0 and sip >= 0):
                new_count -= 1
                dst[wpos] = start_pt = end_pt
                wpos += 1
                if wpos >= count:
                    wpos = 0
                pt, pos = read_dst(pos)
                i += 2
                continue
            dst[wpos] = start_pt = pt
            wpos += 1
            if wpos >= count:
                wpos = 0
            pt = end_pt
            i += 1
        if not is_closed:
            dst[wpos] = pt

    out = dst[:new_count]
    arr = np.asarray(out, np.float64)
    if is_int:
        return np.asarray(np.rint(arr), np.int32)
    return arr.astype(np.float32)



def min_area_rect(points):
    """``cv2.minAreaRect`` — rotating calipers over the convex hull
    (f64 re-derivation).  Returns ``((cx, cy), (w, h), angle)`` in
    cv2's convention (angle ∈ (-90, 0] measured from the horizontal to
    the first box edge, width = that edge's extent).  Float-tolerance
    tier: the rectangle agrees with cv2 to ≤1e-3 px on corners (cv2
    computes the caliper chain in f32; docs/PARITY.md)."""
    hull = convex_hull(points).astype(np.float64)
    n = len(hull)
    if n == 0:
        return ((0.0, 0.0), (0.0, 0.0), 0.0)
    if n == 1:
        return ((float(hull[0, 0]), float(hull[0, 1])), (0.0, 0.0), 0.0)
    if n == 2:
        c = hull.mean(0)
        d = hull[1] - hull[0]
        w = float(np.hypot(*d))
        ang = float(np.degrees(np.arctan2(d[1], d[0])))
        return ((float(c[0]), float(c[1])), (w, 0.0), ang)
    best = None
    for i in range(n):
        a = hull[i]
        b = hull[(i + 1) % n]
        e = b - a
        L = np.hypot(*e)
        if L == 0:
            continue
        ux, uy = e / L
        # project hull on (u, perp)
        px = hull[:, 0] * ux + hull[:, 1] * uy
        py = -hull[:, 0] * uy + hull[:, 1] * ux
        w = px.max() - px.min()
        h = py.max() - py.min()
        area = w * h
        if best is None or area < best[0]:
            cx_r = (px.max() + px.min()) * 0.5
            cy_r = (py.max() + py.min()) * 0.5
            cx = cx_r * ux - cy_r * uy
            cy = cx_r * uy + cy_r * ux
            best = (area, cx, cy, w, h, np.degrees(np.arctan2(uy, ux)))
    _, cx, cy, w, h, ang = best
    # canonicalize to cv2's convention: angle in (-90, 0]
    ang = ang % 180.0
    if ang > 90.0:
        ang -= 180.0
    if ang > 0.0:
        ang -= 90.0
        w, h = h, w
    if ang <= -90.0:
        ang += 90.0
        w, h = h, w
    if ang == 0.0:
        ang = -90.0
        w, h = h, w
    return ((float(cx), float(cy)), (float(w), float(h)), float(ang))


def box_points(rect):
    """``cv2.boxPoints`` — the 4 corners of a rotated rect, cv2's
    corner order (starting from the 'lowest' corner, clockwise in
    image coords)."""
    (cx, cy), (w, h), ang = rect
    a = np.deg2rad(ang)
    b_cos, b_sin = np.cos(a) * 0.5, np.sin(a) * 0.5
    pts = np.array([
        [cx - b_sin * h - b_cos * w, cy + b_cos * h - b_sin * w],
        [cx + b_sin * h - b_cos * w, cy - b_cos * h - b_sin * w],
        [cx + b_sin * h + b_cos * w, cy - b_cos * h + b_sin * w],
        [cx - b_sin * h + b_cos * w, cy + b_cos * h + b_sin * w],
    ], np.float32)
    return pts


def min_enclosing_circle(points):
    """``cv2.minEnclosingCircle`` — Welzl's exact minimal disc in f64.
    Float-tolerance tier (cv2 runs a f32 support-point scheme; center/
    radius agree to ≤1e-3; docs/PARITY.md)."""
    pts = np.asarray(points).reshape(-1, 2).astype(np.float64)
    n = len(pts)
    if n == 0:
        return ((0.0, 0.0), 0.0)

    def circ2(a, b):
        c = (a + b) * 0.5
        return c, np.hypot(*(a - c))

    def circ3(a, b, c):
        ax, ay = a
        bx, by = b
        cx, cy = c
        d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if abs(d) < 1e-12:
            return None
        ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by)
              * (cy - ay) + (cx * cx + cy * cy) * (ay - by)) / d
        uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by)
              * (ax - cx) + (cx * cx + cy * cy) * (bx - ax)) / d
        cen = np.array([ux, uy])
        return cen, np.hypot(*(a - cen))

    def inside(c, r, p, eps=1e-7):
        return np.hypot(*(p - c)) <= r + eps * max(1.0, r)

    # deterministic Welzl (move-to-front, fixed order)
    def md(ps, boundary):
        if len(boundary) == 3:
            res = circ3(*boundary)
            if res is not None:
                return res
        c, r = (np.array([0.0, 0.0]), -1.0)
        if len(boundary) == 1:
            c, r = boundary[0].copy(), 0.0
        elif len(boundary) == 2:
            c, r = circ2(*boundary)
        for i, p in enumerate(ps):
            if r < 0 or not inside(c, r, p):
                if len(boundary) < 3:
                    c, r = md(ps[:i], boundary + [p])
        return c, r

    c, r = md(list(pts), [])
    return ((float(c[0]), float(c[1])), float(r))


def _fitline_wods(pts, w):
    x = float((w * pts[:, 0]).sum())
    y = float((w * pts[:, 1]).sum())
    x2 = float((w * pts[:, 0] * pts[:, 0]).sum())
    y2 = float((w * pts[:, 1] * pts[:, 1]).sum())
    xy = float((w * pts[:, 0] * pts[:, 1]).sum())
    ws = float(w.sum())
    x /= ws
    y /= ws
    x2 /= ws
    y2 /= ws
    xy /= ws
    dx2 = x2 - x * x
    dy2 = y2 - y * y
    dxy = xy - x * y
    t = np.float32(np.arctan2(2 * dxy, dx2 - dy2)) / np.float32(2)
    return np.array([np.float32(np.cos(t)), np.float32(np.sin(t)),
                     np.float32(x), np.float32(y)], np.float32)


def fit_line(points, dist_type: str = "l2", param: float = 0.0,
             reps: float = 0.01, aeps: float = 0.01):
    """``cv2.fitLine`` (2-D).  L2 is the closed-form weighted-moments
    fit — agrees with cv2 to ~1e-6.  Robust types run the same
    20-attempt scheme as fitline.cpp (10 random support points from a
    local deterministic MWC stream, ≤30 IRLS rounds with cv2's weight
    laws, keep the min-L1 attempt); on well-conditioned near-linear
    data the result agrees with cv2 to ≤~0.3 in direction/anchor, but
    on MULTI-MODAL scatter the IRLS may settle in a different local
    fixpoint than cv2's (probed: no candidate start reproduces cv2's
    basin — some fitline.cpp micro-detail remains unpinned;
    docs/PARITY.md documents this as an approximation row).
    Returns (vx, vy, x0, y0) f32."""
    pts = np.asarray(points).reshape(-1, 2).astype(np.float32)
    n = len(pts)
    d = dist_type.lower()
    dists = {"l2": 2, "l1": 1, "l12": 4, "fair": 5, "welsch": 6,
             "huber": 7}
    if d not in dists:
        raise ValueError(f"unknown dist_type {dist_type!r}")
    ptsd = pts.astype(np.float64)
    if d == "l2":
        line = _fitline_wods(ptsd, np.ones(n))
        return tuple(np.float32(v) for v in line)
    C = {"l1": 0.0, "l12": 0.0,
         "fair": param if param > 0 else 1.3998,
         "welsch": param if param > 0 else 2.9846,
         "huber": param if param > 0 else 1.345}[d]

    def calc_w(r):
        r = r.astype(np.float64)
        if d == "l1":
            return (1.0 / np.maximum(r, np.finfo(np.float64).eps)
                    ).astype(np.float32)
        if d == "l12":
            return (1.0 / np.sqrt(1 + r * r * 0.5)).astype(np.float32)
        if d == "fair":
            return (1.0 / (1 + r / C)).astype(np.float32)
        if d == "welsch":
            return np.exp(-r * r / (2 * C * C)).astype(np.float32)
        return np.where(r < C, 1.0, C / np.maximum(r, 1e-300)
                        ).astype(np.float32)

    EPS = n * np.finfo(np.float32).eps
    rdelta = reps if reps != 0 else 1.0
    adelta = aeps if aeps != 0 else 0.01
    rng = _CvRNG()
    min_err = np.inf
    best = np.zeros(4, np.float32)
    for k in range(20):
        w = np.zeros(n, np.float32)
        i = 0
        while i < min(n, 10):
            j = rng.uniform_int(0, n)
            if w[j] < np.finfo(np.float32).eps:
                w[j] = 1.0
                i += 1
        line = _fitline_wods(ptsd, w.astype(np.float64))
        lineprev = line.copy()
        first = True
        err = 0.0
        for it in range(30):
            if not first:
                t = float(line[0]) * float(lineprev[0]) \
                    + float(line[1]) * float(lineprev[1])
                t = min(max(t, -1.0), 1.0)
                if abs(np.arccos(t)) < adelta:
                    dx = abs(np.float32(line[2] - lineprev[2]))
                    dy = abs(np.float32(line[3] - lineprev[3]))
                    if max(dx, dy) < rdelta:
                        break
            first = False
            nx, ny = np.float32(line[1]), np.float32(-line[0])
            r = np.abs(nx * (pts[:, 0] - np.float32(line[2]))
                       + ny * (pts[:, 1] - np.float32(line[3])))
            err = float(r.astype(np.float64).sum())
            if err < EPS:
                break
            w = calc_w(r)
            sw = float(w.astype(np.float64).sum())
            if abs(sw) > np.finfo(np.float32).eps:
                w = (w.astype(np.float64) / sw).astype(np.float32)
            else:
                w = np.ones(n, np.float32)
            lineprev = line.copy()
            line = _fitline_wods(ptsd, w.astype(np.float64))
        if err < min_err:
            min_err = err
            best = line.copy()
            if err < EPS:
                break
    return tuple(np.float32(v) for v in best)


def fit_ellipse(points):
    """``cv2.fitEllipse`` — cv2's normalized direct least squares
    (centered/scaled design matrix, SVD solve).  Float-tolerance tier:
    center/axes ≤1e-2 px, angle ≤0.1° mod 180 on non-degenerate
    samples (docs/PARITY.md).  Returns ((cx, cy), (w, h), angle)."""
    pts = np.asarray(points).reshape(-1, 2).astype(np.float64)
    n = len(pts)
    if n < 5:
        raise ValueError("fitEllipse needs >= 5 points")
    c = pts.mean(0)
    s = np.abs(pts - c).mean() or 1.0
    q = (pts - c) / s
    x, y = q[:, 0], q[:, 1]
    A = np.stack([x * x, x * y, y * y, x, y, np.ones(n)], 1)
    _, _, vt = np.linalg.svd(A, full_matrices=False)
    a, b, cc, dd, ee, ff = vt[-1]
    # unscale: x = (X-cx)/s
    A2 = a
    B2 = b
    C2 = cc
    D2 = (dd * s - 2 * a * c[0] - b * c[1])
    E2 = (ee * s - 2 * cc * c[1] - b * c[0])
    F2 = (a * c[0] ** 2 + b * c[0] * c[1] + cc * c[1] ** 2
          - dd * s * c[0] - ee * s * c[1] + ff * s * s)
    den = 4 * A2 * C2 - B2 * B2
    if den == 0:
        raise ValueError("degenerate ellipse")
    cx = (B2 * E2 - 2 * C2 * D2) / den
    cy = (B2 * D2 - 2 * A2 * E2) / den
    Fc = (A2 * cx * cx + B2 * cx * cy + C2 * cy * cy
          + D2 * cx + E2 * cy + F2)
    M = np.array([[A2, B2 / 2], [B2 / 2, C2]]) / (-Fc)
    evals, evecs = np.linalg.eigh(M)
    axes = 2.0 / np.sqrt(np.abs(evals))
    # cv2 convention: (width, height) with angle of the SECOND axis
    v = evecs[:, 1]
    ang = np.degrees(np.arctan2(v[1], v[0])) % 180.0
    w_ax, h_ax = float(axes[1]), float(axes[0])
    if w_ax > h_ax:
        w_ax, h_ax = h_ax, w_ax
        ang = (ang + 90.0) % 180.0
    return ((float(cx), float(cy)), (w_ax, h_ax), float(ang))


def mean_shift(prob_image, window, max_count: int = 100,
               epsilon: float = 1.0):
    """``cv2.meanShift`` — iterate the window to the ROI centroid
    (image moments) with cv2's exact integer stepping: ``dx =
    cvRound(m10/m00 − w/2)``, clamp to the image, stop when
    ``dx²+dy² < cvRound(eps²)`` or the mass vanishes.  Returns
    ``(iterations, (x, y, w, h))`` — bit-exact (integer dynamics)."""
    mat = np.asarray(prob_image)
    H, W = mat.shape[:2]
    x, y, w, h = (int(v) for v in window)
    # initial clip (cv2: window & image rect)
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + w, W), min(y + h, H)
    x, y, w, h = x0, y0, max(x1 - x0, 0), max(y1 - y0, 0)
    eps = max(float(epsilon), 0.0)
    eps = int(np.rint(eps * eps))
    niters = max(int(max_count), 1)
    i = niters  # cv2's for-loop counter when no break fires
    for i in range(niters):
        if w == 0 or h == 0:
            x, y = W // 2, H // 2
            w, h = max(w, 1), max(h, 1)
        roi = mat[y:y + h, x:x + w].astype(np.float64)
        m00 = roi.sum()
        if abs(m00) < np.finfo(np.float64).eps:
            break
        ys, xs = np.mgrid[0:h, 0:w]
        m10 = (roi * xs).sum()
        m01 = (roi * ys).sum()
        dx = int(np.rint(m10 / m00 - w * 0.5))
        dy = int(np.rint(m01 / m00 - h * 0.5))
        nx = min(max(x + dx, 0), W - w)
        ny = min(max(y + dy, 0), H - h)
        dx, dy = nx - x, ny - y
        x, y = nx, ny
        if dx * dx + dy * dy < eps:
            break
    else:
        i = niters
    return i, (x, y, w, h)


def cam_shift(prob_image, window, max_count: int = 100,
              epsilon: float = 1.0):
    """``cv2.CamShift`` — meanShift, then the orientation/size estimate
    from the TOLERANCE-expanded ROI's central moments (camshift.cpp
    formulas: ``θ = atan2(2b, a−c+√(4b²+(a−c)²))``, axes = 4·√(rotated
    second moments)).  Returns ``((center, size, angle), window)`` —
    the rotated rect agrees with cv2 to f32 (window ints exact,
    fuzz-verified)."""
    mat = np.asarray(prob_image)
    H, W = mat.shape[:2]
    TOLERANCE = 10
    _, (x, y, w, h) = mean_shift(prob_image, window, max_count, epsilon)
    x -= TOLERANCE
    if x < 0:
        x = 0
    y -= TOLERANCE
    if y < 0:
        y = 0
    w += 2 * TOLERANCE
    if x + w > W:
        w = W - x
    h += 2 * TOLERANCE
    if y + h > H:
        h = H - y
    roi = mat[y:y + h, x:x + w].astype(np.float64)
    m00 = roi.sum()
    if abs(m00) < np.finfo(np.float64).eps:
        return (((0.0, 0.0), (0.0, 0.0), 0.0), (x, y, w, h))
    ysg, xsg = np.mgrid[0:h, 0:w]
    m10 = (roi * xsg).sum()
    m01 = (roi * ysg).sum()
    m20 = (roi * xsg * xsg).sum()
    m11 = (roi * xsg * ysg).sum()
    m02 = (roi * ysg * ysg).sum()
    inv_m00 = 1.0 / m00
    xc = int(np.rint(m10 * inv_m00 + x))
    yc = int(np.rint(m01 * inv_m00 + y))
    mu20 = m20 - m10 * (m10 * inv_m00)
    mu11 = m11 - m10 * (m01 * inv_m00)
    mu02 = m02 - m01 * (m01 * inv_m00)
    a = mu20 * inv_m00
    b = mu11 * inv_m00
    c = mu02 * inv_m00
    square = np.sqrt(4 * b * b + (a - c) * (a - c))
    theta = np.arctan2(2 * b, a - c + square)
    cs, sn = np.cos(theta), np.sin(theta)
    rot_a = cs * cs * mu20 + 2 * cs * sn * mu11 + sn * sn * mu02
    rot_c = sn * sn * mu20 - 2 * cs * sn * mu11 + cs * cs * mu02
    length = np.sqrt(max(rot_a * inv_m00, 0.0)) * 4.0
    width = np.sqrt(max(rot_c * inv_m00, 0.0)) * 4.0
    if length < width:
        length, width = width, length
        cs, sn = sn, cs
        theta = np.pi * 0.5 - theta
    t0 = int(np.rint(abs(length * cs)))
    t1 = int(np.rint(abs(width * sn)))
    t0 = max(t0, t1) + 2
    nw = min(t0, W)
    t0 = int(np.rint(abs(length * sn)))
    t1 = int(np.rint(abs(width * cs)))
    t0 = max(t0, t1) + 2
    nh = min(t0, H)
    nx = max(0, xc - nw // 2)
    ny = max(0, yc - nh // 2)
    nx = min(nx, W - nw)
    ny = min(ny, H - nh)
    ang = float((np.pi * 0.5 + theta) * 180.0 / np.pi)
    while ang < 0:
        ang += 360.0
    while ang >= 360.0:
        ang -= 360.0
    if ang >= 180.0:
        ang -= 180.0
    box = ((float(np.float32(nx + nw * 0.5)),
            float(np.float32(ny + nh * 0.5))),
           (float(np.float32(width)), float(np.float32(length))),
           float(np.float32(ang)))
    return box, (nx, ny, nw, nh)


def get_gaussian_kernel(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """``cv2.getGaussianKernel`` (CV_64F) — the fixed small-kernel
    tables for σ≤0 and k≤7 (SURVEY §8.2) are bit-exact; the computed
    path (σ>0 or k>7) matches to ≤2 ulp per tap — cv2 4.x+ evaluates
    exp in its own SOFTDOUBLE library (getGaussianKernelBitExact),
    whose polynomial rounds differently from glibc exp on some inputs
    (the device GaussianBlur ops are bit-exact independently via the
    pinned quantized taps)."""
    if sigma <= 0 and ksize in _BINOMIAL_FX:
        # the dyadic /256 tables (incl. k=9) — bit-exact f64
        return (_BINOMIAL_FX[ksize].astype(np.float64)
                / 256.0).reshape(-1, 1)
    import math
    sigmaX = sigma if sigma > 0 else 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    scale2x = -0.5 / (sigmaX * sigmaX)
    # glibc exp per element (numpy's SIMD f64 exp is 1 ulp off on some
    # inputs) and reciprocal-multiply normalization, as cv2
    k = np.asarray([math.exp(scale2x * (i - (ksize - 1) * 0.5) ** 2)
                    for i in range(ksize)], np.float64)
    s = 0.0
    for v in k:
        s += v
    return (k * (1.0 / s)).reshape(-1, 1)


def get_deriv_kernels(dx: int, dy: int, ksize: int,
                      normalize: bool = False):
    """``cv2.getDerivKernels`` — Sobel (ksize ≥ 1, with the ksize-1 →
    3-tap promotion for order > 0) / Scharr (ksize = -1) separable
    taps via getSobelKernels' smoothing+difference recurrences;
    bit-exact f32 incl. the 1/2^(k-order-1) normalization."""
    out = []
    for order, ks in ((dx, ksize), (dy, ksize)):
        if ks == -1:  # Scharr: smooth normalized by 1/32, deriv never
            if order == 0:
                arr = np.asarray([3.0, 10.0, 3.0], np.float64)
                if normalize:
                    arr = arr * (1.0 / 32.0)
            elif order == 1:
                arr = np.asarray([-1.0, 0.0, 1.0], np.float64)
            else:
                raise ValueError("Scharr supports order <= 1")
            out.append(arr.astype(np.float32).reshape(-1, 1))
            continue
        else:
            n = ks
            if n == 1 and order > 0:
                n = 3
            if n == 1:
                arr = np.asarray([1.0], np.float64)
            elif n == 3:
                arr = np.asarray({0: [1, 2, 1], 1: [-1, 0, 1],
                                  2: [1, -2, 1]}[min(order, 2)],
                                 np.float64)
            else:
                ker = [0] * (n + 1)
                ker[0] = 1
                for _ in range(n - order - 1):
                    oldval = ker[0]
                    for j in range(1, n + 1):
                        newval = ker[j] + ker[j - 1]
                        ker[j - 1] = oldval
                        oldval = newval
                for _ in range(order):
                    oldval = -ker[0]
                    for j in range(1, n + 1):
                        newval = ker[j - 1] - ker[j]
                        ker[j - 1] = oldval
                        oldval = newval
                arr = np.asarray(ker[:n], np.float64)
        if normalize:
            arr = arr * (1.0 / (1 << (n - order - 1)))
        out.append(arr.astype(np.float32).reshape(-1, 1))
    return out[0], out[1]


def _ms_window_chunk(src, y0, x0, sp, isr2, K, max_count, eps):
    """Mean-shift iterations for one chunk of start pixels (vectorized).

    ``src`` is ``[H,W,3]`` int64; returns the converged colors
    ``[P,3]`` following cv2's exact integer dynamics (segmentation.cpp):
    window ``cvRound(p ± sp)`` clamped, membership ``Σ Δc² ≤ isr2``,
    update ``cvRound(sum · (1./count))`` (one f64 product rounding),
    stop on same-point or ``|Δx|+|Δy|+Σ Δc² ≤ eps``.
    """
    H, W = src.shape[:2]
    P = y0.size
    x = x0.astype(np.int64).copy()
    y = y0.astype(np.int64).copy()
    c = src[y, x].copy()
    active = np.ones(P, bool)
    offs = np.arange(K, dtype=np.int64)
    for _ in range(max_count):
        ax = np.nonzero(active)[0]
        if ax.size == 0:
            break
        X, Y, C = x[ax], y[ax], c[ax]
        minx = np.maximum(np.rint(X - sp).astype(np.int64), 0)
        miny = np.maximum(np.rint(Y - sp).astype(np.int64), 0)
        maxx = np.minimum(np.rint(X + sp).astype(np.int64), W - 1)
        maxy = np.minimum(np.rint(Y + sp).astype(np.int64), H - 1)
        xs = minx[:, None] + offs[None, :]
        ys = miny[:, None] + offs[None, :]
        vx = xs <= maxx[:, None]
        vy = ys <= maxy[:, None]
        win = src[np.minimum(ys, H - 1)[:, :, None],
                  np.minimum(xs, W - 1)[:, None, :]]
        d = win - C[:, None, None, :]
        sel = ((d * d).sum(-1) <= isr2) & vy[:, :, None] & vx[:, None, :]
        cnt = sel.sum((1, 2))
        s = np.where(sel[..., None], win, 0).sum((1, 2))
        sx = np.where(sel, xs[:, None, :], 0).sum((1, 2))
        sy = np.where(sel, ys[:, :, None], 0).sum((1, 2))
        ic = 1.0 / np.maximum(cnt, 1)
        x1 = np.rint(sx * ic).astype(np.int64)
        y1 = np.rint(sy * ic).astype(np.int64)
        c1 = np.rint(s * ic[:, None]).astype(np.int64)
        dc = c1 - C
        stop = ((x1 == X) & (y1 == Y)) | \
            ((np.abs(x1 - X) + np.abs(y1 - Y) + (dc * dc).sum(-1)) <= eps)
        alive = cnt > 0
        upd = ax[alive]
        x[upd], y[upd], c[upd] = x1[alive], y1[alive], c1[alive]
        active[ax[~alive]] = False
        active[ax[alive & stop]] = False
    return c


def pyr_mean_shift_filtering(img, sp, sr, max_level=1,
                             max_count=5, epsilon=1.0):
    """``cv2.pyrMeanShiftFiltering`` — color mean-shift segmentation
    over a Gaussian pyramid.  BIT-EXACT vs cv2 5.0 (probes + fuzz,
    docs/PARITY.md "Mean-shift segmentation"):

    * per-level radius ``sp_l = max(sp/2^level, 1)``; color radius
      ``isr2 = cvRound(sr²)``; termcrit clamps: count → [1,100],
      eps → ≥0 (cv2 defaults COUNT+EPS, 5, 1.0);
    * mean-shift window rows/cols ``cvRound(p ± sp_l)`` clamped to the
      image; membership ``Σ (Δc)² ≤ isr2`` against the CURRENT mean
      color; update = ``cvRound(sum · (1./count))`` per coordinate and
      channel (f64 reciprocal-product chain, reproduced verbatim);
      stop when the point repeats or ``|Δx|+|Δy|+Σ(Δc)² ≤ eps``;
    * pyramid: per-channel :func:`pyr_down`; going down, the previous
      (smaller) RESULT is per-channel :func:`pyr_up`-expanded into the
      level's output; a pixel is re-processed (from the level's SOURCE
      color) only under a mask — flag(i,j) = any of the 8 neighbours
      of small-image pixel (i,j) at color-distance² ≥ max(isr2, 16),
      written at (2i+1, 2j−1), then 3×3-dilated (zero border); all
      other pixels keep the pyrUp color.
    """
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("pyrMeanShiftFiltering expects uint8 [H,W,3]")
    max_level = int(max_level)
    if not 0 <= max_level <= 8:
        raise ValueError("max_level must be in [0, 8]")
    sr = float(sr)
    isr2 = int(np.rint(sr * sr))
    isr22 = max(isr2, 16)
    max_count = min(max(int(max_count), 1), 100)
    eps = max(float(epsilon), 0.0)
    src_pyr = [img]
    for _ in range(max_level):
        a = src_pyr[-1]
        src_pyr.append(np.stack([pyr_down(a[..., ch]) for ch in range(3)],
                                axis=-1))
    dst = None
    for level in range(max_level, -1, -1):
        src = src_pyr[level].astype(np.int64)
        H, W = src.shape[:2]
        # cv2 stores the level radius as FLOAT32 (segmentation.cpp's
        # `float sp`); the window arithmetic then promotes it back to
        # f64, where int − f32 is exact — so round through f32 here.
        sp_l = max(float(np.float32(float(sp) / (1 << level))), 1.0)
        if level < max_level:
            h1, w1 = dst.shape[:2]
            out = np.stack([pyr_up(dst[..., ch])[:H, :W] for ch in range(3)],
                           axis=-1).astype(np.int64)
            m = np.zeros((H, W), np.uint8)
            if h1 > 2 and w1 > 2:
                u = dst.astype(np.int64)
                t = u[1:-1, 1:-1]
                flag = np.zeros((h1 - 2, w1 - 2), bool)
                for di in (-1, 0, 1):
                    for dj in (-1, 0, 1):
                        if di == 0 and dj == 0:
                            continue
                        dd = u[1 + di:h1 - 1 + di, 1 + dj:w1 - 1 + dj] - t
                        flag |= (dd * dd).sum(-1) >= isr22
                m[np.ix_(2 * np.arange(1, h1 - 1) + 1,
                         2 * np.arange(1, w1 - 1) - 1)] = flag
                p = np.pad(m, 1)
                for di in range(3):
                    for dj in range(3):
                        np.maximum(m, p[di:di + H, dj:dj + W], out=m)
            sel_idx = np.nonzero(m.ravel())[0]
        else:
            out = src.copy()
            sel_idx = np.arange(H * W)
        if sel_idx.size:
            K = 2 * int(np.ceil(sp_l)) + 1
            step = max(1, (1 << 22) // (K * K))
            of = out.reshape(-1, 3)
            ys0, xs0 = sel_idx // W, sel_idx % W
            for a in range(0, sel_idx.size, step):
                of[sel_idx[a:a + step]] = _ms_window_chunk(
                    src, ys0[a:a + step], xs0[a:a + step],
                    sp_l, isr2, K, max_count, eps)
        dst = out.astype(np.uint8)
    return dst
