"""NumPy parity oracle (test-only leaf; SURVEY.md §1b)."""

from imageenhancement_mp_tpu.ref.ops import (
    apply_lut,
    clahe,
    clahe_tile_lut,
    contrast_stretch,
    equalize_hist,
    gamma_lut,
    gamma_transform,
    gaussian_blur,
    gaussian_kernel,
    gaussian_kernel_fixed,
    laplacian,
    laplacian_sharpen,
    log_lut,
    log_transform,
    median_blur,
    unsharp_mask,
)

__all__ = [
    "apply_lut",
    "clahe",
    "clahe_tile_lut",
    "contrast_stretch",
    "equalize_hist",
    "gamma_lut",
    "gamma_transform",
    "gaussian_blur",
    "gaussian_kernel",
    "gaussian_kernel_fixed",
    "laplacian",
    "laplacian_sharpen",
    "log_lut",
    "log_transform",
    "median_blur",
    "unsharp_mask",
]
