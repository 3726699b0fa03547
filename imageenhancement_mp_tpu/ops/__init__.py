"""Planes-level op registry (name → function over [B,H,W] planes; u8 always, u16/f32 where cv2 supports them)."""

from imageenhancement_mp_tpu.ops.bilateral import bilateral_color, bilateral_planes
from imageenhancement_mp_tpu.ops.clahe import clahe_planes
from imageenhancement_mp_tpu.ops.color import cvt_gray_nhwc
from imageenhancement_mp_tpu.ops.filters import (
    box_blur_planes,
    box_filter_planes,
    corner_harris_planes,
    corner_min_eigen_val_planes,
    gaussian_blur_planes,
    sobel_planes,
    laplacian_planes,
    laplacian_sharpen_planes,
    stack_blur_planes,
    unsharp_mask_planes,
)
from imageenhancement_mp_tpu.ops.histogram import (
    equalize_hist_global_planes,
    equalize_hist_planes,
)
from imageenhancement_mp_tpu.ops.median import median_blur_planes
from imageenhancement_mp_tpu.ops.morphology import (
    dilate_planes,
    erode_planes,
    morphology_planes,
)
from imageenhancement_mp_tpu.ops.threshold import adaptive_threshold_planes, threshold_planes
from imageenhancement_mp_tpu.ops.filter2d import filter2d_planes
from imageenhancement_mp_tpu.ops.pyramid import pyr_down_planes, pyr_up_planes
from imageenhancement_mp_tpu.ops.resize import (flip_planes, resize_planes,
                                                rotate_planes, transpose_planes)
from imageenhancement_mp_tpu.ops.warp import (remap_planes, undistort_planes,
                                              warp_affine_planes,
                                              warp_perspective_planes,
                                              warp_polar_planes)
from imageenhancement_mp_tpu.ops.canny import canny_planes, connected_components_planes
from imageenhancement_mp_tpu.ops.template import match_template_planes
from imageenhancement_mp_tpu.ops.arith import arith_arrays
from imageenhancement_mp_tpu.ops.nlmeans import fast_nl_means_planes
from imageenhancement_mp_tpu.ops.pointwise import (
    add_weighted_arrays,
    apply_color_map_planes,
    calc_back_project_planes,
    apply_lut_planes,
    contrast_stretch_planes,
    convert_scale_abs_planes,
    gamma_planes,
    integral_planes,
    log_planes,
)

OP_REGISTRY = {
    "gamma": gamma_planes,
    "log_transform": log_planes,
    "contrast_stretch": contrast_stretch_planes,
    "convert_scale_abs": convert_scale_abs_planes,
    "equalize_hist": equalize_hist_planes,
    "equalize_hist_global": equalize_hist_global_planes,
    "clahe": clahe_planes,
    "gaussian_blur": gaussian_blur_planes,
    "box_blur": box_blur_planes,
    "bilateral": bilateral_planes,
    "threshold": threshold_planes,
    "adaptive_threshold": adaptive_threshold_planes,
    "erode": erode_planes,
    "dilate": dilate_planes,
    "morphology": morphology_planes,
    "sobel": sobel_planes,
    "pyr_down": pyr_down_planes,
    "resize": resize_planes,
    "flip": flip_planes,
    "rotate": rotate_planes,
    "transpose": transpose_planes,
    "warp_affine": warp_affine_planes,
    "warp_perspective": warp_perspective_planes,
    "warp_polar": warp_polar_planes,
    "canny": canny_planes,
    "connected_components": connected_components_planes,
    "remap": remap_planes,
    "match_template": match_template_planes,
    "undistort": undistort_planes,
    "fast_nl_means": fast_nl_means_planes,
    "box_filter": box_filter_planes,
    "corner_harris": corner_harris_planes,
    "corner_min_eigen_val": corner_min_eigen_val_planes,
    "calc_back_project": calc_back_project_planes,
    "filter2d": filter2d_planes,
    "pyr_up": pyr_up_planes,
    "laplacian_sharpen": laplacian_sharpen_planes,
    "unsharp_mask": unsharp_mask_planes,
    "median_blur": median_blur_planes,
    "stack_blur": stack_blur_planes,
}

__all__ = [
    "OP_REGISTRY",
    "add_weighted_arrays",
    "apply_lut_planes",
    "bilateral_color",
    "bilateral_planes",
    "box_blur_planes",
    "clahe_planes",
    "contrast_stretch_planes",
    "convert_scale_abs_planes",
    "cvt_gray_nhwc",
    "equalize_hist_planes",
    "equalize_hist_global_planes",
    "gamma_planes",
    "gaussian_blur_planes",
    "laplacian_planes",
    "laplacian_sharpen_planes",
    "log_planes",
    "median_blur_planes",
    "erode_planes",
    "dilate_planes",
    "morphology_planes",
    "sobel_planes",
    "pyr_down_planes",
    "resize_planes",
    "flip_planes",
    "rotate_planes",
    "transpose_planes",
    "warp_affine_planes",
    "warp_perspective_planes",
    "warp_polar_planes",
    "canny_planes",
    "connected_components_planes",
    "remap_planes",
    "match_template_planes",
    "undistort_planes",
    "fast_nl_means_planes",
    "arith_arrays",
    "integral_planes",
    "apply_color_map_planes",
    "calc_back_project_planes",
    "box_filter_planes",
    "corner_harris_planes",
    "filter2d_planes",
    "pyr_up_planes",
    "threshold_planes",
    "adaptive_threshold_planes",
    "unsharp_mask_planes",
]
