"""``cv2.HoughLines`` accumulator on device.

The vote stage is the heavy part (|edges| × numangle rounded mul-adds +
a scatter-add histogram); it runs as one jitted ``lax.fori_loop`` over
angle bins, each iteration voting ALL pixels of the image at once (a
masked scatter-add — no data-dependent shapes, so one compile per image
size).  The tiny candidate-selection pass (threshold, 4-neighbor local
max, sort) runs on the fetched accumulator via the pinned host logic in
ref/ops.py (_hough_select) — identical bits either way.

Parity: the per-vote arithmetic is the pinned f32
``cvRound(x·tabCos[n] + y·tabSin[n])`` (ref/ops.py hough_lines —
100-config fuzz bitwise vs cv2).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax


def hough_accumulator(img: jnp.ndarray, tabcos: np.ndarray,
                      tabsin: np.ndarray, numrho: int) -> jnp.ndarray:
    """Vote accumulator [numangle, numrho] for one [H, W] u8 image.

    Must run under ``jax.enable_x64`` (the api wrapper does).  The
    pinned law is fl32(fl32(x·c) + fl32(y·s)) — two product roundings
    then one add rounding.  A plain f32 ``x*c + y*s`` is NOT
    reproducible across backends (XLA:CPU fast-math contracts it into
    an fma regardless of barriers — probed for blendLinear), so each
    product is computed EXACTLY in f64 (coords < 2^12 and f32 tables:
    the product fits 53 bits, and the f64 operands come from int32
    converts + host f64 tables, which the f32-demotion simplifier
    cannot touch) and cast once to f32 = the correctly-rounded product;
    the remaining f32 add then has no mul operand to contract with."""
    H, W = img.shape
    numangle = len(tabcos)
    w = (img != 0).astype(jnp.int32).reshape(-1)
    yy, xx = jnp.mgrid[0:H, 0:W]
    xf = xx.astype(jnp.float64).reshape(-1)
    yf = yy.astype(jnp.float64).reshape(-1)
    tc = jnp.asarray(np.asarray(tabcos, np.float32).astype(np.float64))
    ts = jnp.asarray(np.asarray(tabsin, np.float32).astype(np.float64))
    c0 = (numrho - 1) // 2

    def body(n, acc):
        px = (xf * tc[n]).astype(jnp.float32)
        py = (yf * ts[n]).astype(jnp.float32)
        r = jnp.round(px + py).astype(jnp.int32) + c0
        return acc.at[n, r].add(w, mode="drop")

    acc0 = jnp.zeros((numangle, numrho), jnp.int32)
    return lax.fori_loop(0, numangle, body, acc0)
