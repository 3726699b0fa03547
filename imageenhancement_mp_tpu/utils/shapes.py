"""Shape canonicalization for the batched op API.

The public API (SURVEY.md §1b) accepts single images and batches, grayscale
and multi-channel:

    [H, W]          one grayscale image
    [H, W, C]       one multi-channel image (channels enhanced independently)
    [N, H, W]       batch of grayscale images
    [N, H, W, C]    batch of multi-channel images

Internally every op works on a canonical stack of 2-D planes ``[B, H, W]``
(B = N·C); per-plane state (histograms, min/max, CLAHE tile LUTs) is computed
independently per plane, matching the reference's per-image/per-channel
OpenCV calls.  Static Python logic only — safe under ``jax.jit``.

AMBIGUITY: a 3-D input whose last dim is ≤ 4 is interpreted as one
``[H, W, C]`` image (the overwhelmingly common case).  A batch of grayscale
images narrower than 5 pixels ``[N, H, W≤4]`` would be misread — pass it
with an explicit channel dim (``[N, H, W, 1]``) or set
``channels_last=False`` (exposed as a kwarg on every public API function).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp

Restore = Callable[[jnp.ndarray], jnp.ndarray]


def treat_as_hwc(img, channels_last: bool = True) -> bool:
    """THE ambiguity rule (see module docstring): a 3-D array is one
    ``[H, W, C]`` image iff ``channels_last`` and its last dim is ≤ 4.
    Single source of truth — every layout decision routes through here."""
    return img.ndim == 3 and channels_last and img.shape[-1] in (1, 2, 3, 4)


def as_vec(img: jnp.ndarray, channels_last: bool = True) -> Tuple[jnp.ndarray, Restore]:
    """Canonicalize to ``[N, H, W, C]`` VECTOR-pixel batches (for ops
    whose cv2 semantics are joint over the channels, e.g.
    fastNlMeansDenoising's joint SSD) and return the undo function.
    Same ambiguity rule as ``as_planes``: a 3-D input is one [H,W,C]
    image iff ``treat_as_hwc``, otherwise a grayscale [N,H,W] batch
    (C=1 vectors); 4-D is always ``[N,H,W,C]`` (``channels_last`` is
    the 3-D disambiguation flag, like everywhere in this API)."""
    nd = img.ndim
    if nd == 2:
        return img[None, ..., None], lambda out: out[0, ..., 0]
    if nd == 3:
        if treat_as_hwc(img, channels_last):
            return img[None], lambda out: out[0]
        return img[..., None], lambda out: out[..., 0]
    if nd == 4:
        return img, lambda out: out
    raise ValueError(f"expected 2-4 dims ([N,]H,W[,C]), got shape {img.shape}")


def as_planes(img: jnp.ndarray, channels_last: bool = True) -> Tuple[jnp.ndarray, Restore]:
    """Canonicalize to ``[B, H, W]`` and return a function undoing the reshape."""
    nd = img.ndim
    if nd == 2:
        planes = img[None]
        return planes, lambda out: out[0]
    if nd == 3:
        if treat_as_hwc(img, channels_last):
            # [H, W, C] -> [C, H, W]
            planes = jnp.moveaxis(img, -1, 0)
            return planes, lambda out: jnp.moveaxis(out, 0, -1)
        # [N, H, W]
        return img, lambda out: out
    if nd == 4:
        n, h, w, c = img.shape
        planes = jnp.moveaxis(img, -1, 1).reshape(n * c, h, w)
        return planes, lambda out: jnp.moveaxis(
            out.reshape(n, c, out.shape[-2], out.shape[-1]), 1, -1
        )
    raise ValueError(f"expected 2-4 dims ([N,]H,W[,C]), got shape {img.shape}")
