"""TPU-native image enhancement (JAX/XLA/Pallas).

A brand-new TPU-first framework with the capabilities of
``hanxuel/ImageEnhancement_MP`` (see SURVEY.md): per-pixel point operations
(gamma/log LUTs, contrast stretching, histogram equalization, CLAHE) and
spatial filters (Gaussian, Laplacian/unsharp sharpening, median), exposed as
a function-per-enhancement API over batched NHWC/NHW uint8 tensors, jit/vmap
batched, with fused Pallas kernels on the hot paths.
"""

from imageenhancement_mp_tpu.api import (
    adaptive_threshold,
    add_weighted,
    apply_lut,
    bilateral_filter,
    box_blur,
    convert_scale_abs,
    cvt_color,
    cvt_gray,
    dilate,
    equalize_luma,
    erode,
    filter2d,
    morphology_ex,
    pyr_down,
    resize,
    flip,
    rotate,
    transpose,
    warp_affine,
    get_rotation_matrix_2d,
    pyr_up,
    histogram,
    clahe,
    contrast_stretch,
    equalize_hist,
    gamma,
    gaussian_blur,
    laplacian,
    laplacian_sharpen,
    log_transform,
    median_blur,
    scharr,
    sobel,
    threshold,
    unsharp_mask,
)

__version__ = "0.7.0"

__all__ = [
    "adaptive_threshold",
    "add_weighted",
    "apply_lut",
    "bilateral_filter",
    "box_blur",
    "convert_scale_abs",
    "cvt_color",
    "cvt_gray",
    "dilate",
    "equalize_luma",
    "erode",
    "filter2d",
    "morphology_ex",
    "pyr_down",
    "resize",
    "flip",
    "rotate",
    "transpose",
    "warp_affine",
    "get_rotation_matrix_2d",
    "pyr_up",
    "histogram",
    "clahe",
    "contrast_stretch",
    "equalize_hist",
    "gamma",
    "gaussian_blur",
    "laplacian",
    "laplacian_sharpen",
    "log_transform",
    "median_blur",
    "scharr",
    "sobel",
    "threshold",
    "unsharp_mask",
    "__version__",
]
