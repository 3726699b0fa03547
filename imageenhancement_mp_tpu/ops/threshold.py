"""Thresholding: ``cv2.threshold`` parity (fixed + Otsu/Triangle auto).

The fixed-threshold op is a pure elementwise compare/select — one fused
VPU pass.  The auto methods (Otsu, Triangle) need the image histogram and
a sequential 256-step scan in cv2's exact double arithmetic; the
histogram rides the MXU on device (ops/histogram.py nibble matmul) and
the tiny scan runs on host via the exact transcriptions in ref/ops.py
(1 KB fetch per plane — cv2's own API is host-synchronous here too: it
RETURNS the computed threshold).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from imageenhancement_mp_tpu.ref.ops import _THRESH_TYPES

__all__ = ["threshold_planes", "THRESH_TYPES"]

THRESH_TYPES = _THRESH_TYPES


def threshold_planes(planes: jnp.ndarray, thresh=0.0, maxval: float = 255.0,
                     type: str = "binary") -> jnp.ndarray:
    """``cv2.threshold`` per plane (exact; see ref/ops.py ``threshold``).

    ``thresh``: a float (shared) or an array of per-plane thresholds
    ``[B]`` (the batched generalization of cv2's scalar — used by the
    Otsu/Triangle API path).
    """
    if type not in _THRESH_TYPES:
        raise ValueError(f"type must be one of {_THRESH_TYPES}, got {type!r}")
    if planes.dtype == jnp.float32:
        t = jnp.float32(thresh) if np.isscalar(thresh) else thresh.astype(jnp.float32)
        mv = jnp.float32(maxval)
        zero = jnp.float32(0)
        minv, maxv_d = None, None
    elif planes.dtype in (jnp.uint8, jnp.uint16, jnp.int16):
        minv, maxv_d = {
            jnp.dtype(jnp.uint8): (0, 255),
            jnp.dtype(jnp.uint16): (0, 65535),
            jnp.dtype(jnp.int16): (-32768, 32767),
        }[jnp.dtype(planes.dtype)]
        if np.isscalar(thresh):
            t = jnp.int32(int(np.floor(float(thresh))))
        else:
            t = thresh.astype(jnp.int32)
        mv = jnp.int32(int(np.clip(np.round(float(maxval)), minv, maxv_d)))
        zero = jnp.int32(0)
    else:
        raise TypeError(f"expected uint8/uint16/int16/float32, got {planes.dtype}")
    x = planes if planes.dtype == jnp.float32 else planes.astype(jnp.int32)
    if not np.isscalar(thresh):
        t = t[:, None, None]  # per-plane thresholds over [B, H, W]
    if type == "binary":
        out = jnp.where(x > t, mv, zero)
    elif type == "binary_inv":
        out = jnp.where(x > t, zero, mv)
    elif type == "trunc":
        out = jnp.minimum(x, t)
        if planes.dtype != jnp.float32:
            out = jnp.clip(out, minv, maxv_d)
    elif type == "tozero":
        out = jnp.where(x > t, x, zero)
    else:  # tozero_inv
        out = jnp.where(x > t, zero, x)
    return out.astype(planes.dtype)
