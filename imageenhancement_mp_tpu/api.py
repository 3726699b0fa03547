"""Public function-per-enhancement API (SURVEY.md §1b).

Mirrors the reference's per-op signatures (BASELINE.json:5) over batched
arrays: every function accepts ``[H,W]``, ``[H,W,C]``, ``[N,H,W]`` or
``[N,H,W,C]`` uint8 and applies the enhancement per plane (per image ×
channel), exactly like per-image/per-channel OpenCV calls — but jit-compiled
and vmap-batched on TPU.

All functions are wrapped in ``jax.jit`` with static hyperparameters, so
repeated calls with the same shapes/params hit the compile cache.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from imageenhancement_mp_tpu.ops.clahe import clahe_planes
from imageenhancement_mp_tpu.ops.filters import (
    gaussian_blur_planes,
    laplacian_planes,
    laplacian_sharpen_planes,
    unsharp_mask_planes,
)
from imageenhancement_mp_tpu.ops.histogram import equalize_hist_planes
from imageenhancement_mp_tpu.ops.median import median_blur_planes
from imageenhancement_mp_tpu.ops.pointwise import (
    apply_lut_planes,
    contrast_stretch_planes,
    gamma_planes,
    log_planes,
)
from imageenhancement_mp_tpu.utils.shapes import as_planes

__all__ = [
    "apply_lut",
    "gamma",
    "log_transform",
    "contrast_stretch",
    "equalize_hist",
    "clahe",
    "gaussian_blur",
    "laplacian",
    "laplacian_sharpen",
    "unsharp_mask",
    "median_blur",
]


def _check_u8(img) -> None:
    if img.dtype != jnp.uint8:
        raise TypeError(f"expected uint8 image array, got {img.dtype}")


def _per_plane(planes_fn, img, **static):
    _check_u8(img)
    planes, restore = as_planes(img)
    return restore(planes_fn(planes, **static))


@partial(jax.jit, static_argnames=())
def _apply_lut_jit(planes, lut):
    return apply_lut_planes(planes, lut)


def apply_lut(img, lut):
    """``cv2.LUT``: gather through a 256-entry table (exact)."""
    _check_u8(img)
    planes, restore = as_planes(img)
    return restore(_apply_lut_jit(planes, jnp.asarray(lut, jnp.uint8)))


@partial(jax.jit, static_argnames=("gamma_value",))
def _gamma_jit(planes, gamma_value):
    return gamma_planes(planes, gamma_value)


def gamma(img, gamma_value: float):
    """Power-law transform ``s = 255·(r/255)^γ`` via static LUT (exact)."""
    return _per_plane(_gamma_jit, img, gamma_value=float(gamma_value))


@jax.jit
def _log_jit(planes):
    return log_planes(planes)


def log_transform(img):
    """Log transform ``s = (255/log 256)·log(1+r)`` via static LUT (exact)."""
    return _per_plane(_log_jit, img)


@jax.jit
def _stretch_jit(planes):
    return contrast_stretch_planes(planes)


def contrast_stretch(img):
    """``cv2.normalize(NORM_MINMAX, 0, 255)`` per plane (exact)."""
    return _per_plane(_stretch_jit, img)


@jax.jit
def _eq_jit(planes):
    return equalize_hist_planes(planes)


def equalize_hist(img):
    """``cv2.equalizeHist`` per plane (exact)."""
    return _per_plane(_eq_jit, img)


@partial(jax.jit, static_argnames=("clip_limit", "tile_grid"))
def _clahe_jit(planes, clip_limit, tile_grid):
    return clahe_planes(planes, clip_limit, tile_grid)


def clahe(img, clip_limit: float = 40.0, tile_grid: tuple[int, int] = (8, 8)):
    """``cv2.createCLAHE(clip_limit, grid)`` per plane (±1 LSB).

    ``tile_grid`` is (rows, cols); cv2's Size argument is (cols, rows).
    """
    return _per_plane(
        _clahe_jit, img, clip_limit=float(clip_limit), tile_grid=tuple(tile_grid)
    )


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def _gauss_jit(planes, ksize, sigma):
    return gaussian_blur_planes(planes, ksize, sigma)


def gaussian_blur(img, ksize: int = 5, sigma: float = 0.0):
    """``cv2.GaussianBlur((k,k), σ)`` (σ=0 exact; σ>0 within ±1 LSB)."""
    return _per_plane(_gauss_jit, img, ksize=int(ksize), sigma=float(sigma))


@jax.jit
def _lap_jit(planes):
    return laplacian_planes(planes)


def laplacian(img):
    """``cv2.Laplacian(CV_16S, ksize=1)`` (exact, int16 output)."""
    return _per_plane(_lap_jit, img)


@jax.jit
def _lap_sharp_jit(planes):
    return laplacian_sharpen_planes(planes)


def laplacian_sharpen(img):
    """Sharpen = saturate_u8(src − Laplacian(src)) (exact)."""
    return _per_plane(_lap_sharp_jit, img)


@partial(jax.jit, static_argnames=("amount", "ksize", "sigma"))
def _unsharp_jit(planes, amount, ksize, sigma):
    return unsharp_mask_planes(planes, amount, ksize, sigma)


def unsharp_mask(img, amount: float = 1.0, ksize: int = 5, sigma: float = 0.0):
    """``cv2.addWeighted(src, 1+a, GaussianBlur(src), −a, 0)`` (±1 LSB; exact
    for integral ``amount``)."""
    return _per_plane(
        _unsharp_jit, img, amount=float(amount), ksize=int(ksize), sigma=float(sigma)
    )


@partial(jax.jit, static_argnames=("ksize",))
def _median_jit(planes, ksize):
    return median_blur_planes(planes, ksize)


def median_blur(img, ksize: int = 3):
    """``cv2.medianBlur`` (exact; border = replicate)."""
    return _per_plane(_median_jit, img, ksize=int(ksize))
