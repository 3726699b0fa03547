"""``cv2.floodFill`` region growth on device — while_loop fixpoint.

The filled set is the unique fixpoint of per-edge acceptance tests that
depend only on ORIGINAL pixel values (ref/ops.py flood_fill pins this),
so it is schedule-independent: the device grows the region with
vectorized shifted ORs under ``lax.while_loop`` until a pass adds no
pixel — the same structure as Canny's hysteresis fixpoint.  Each
iteration advances the frontier ≥1 px, so iterations ≤ the region's
graph eccentricity (cv2's scanline BFS is likewise linear in that).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

_NBRS4 = ((0, 1), (0, -1), (1, 0), (-1, 0))
_NBRS8 = _NBRS4 + ((1, 1), (1, -1), (-1, 1), (-1, -1))


def _shift(a: jnp.ndarray, di: int, dj: int, fill):
    """Shift [H,W] by (di, dj) filling vacated cells with ``fill``."""
    H, W = a.shape
    out = jnp.roll(a, (di, dj), (0, 1))
    if di == 1:
        out = out.at[0, :].set(fill)
    elif di == -1:
        out = out.at[H - 1, :].set(fill)
    if dj == 1:
        out = out.at[:, 0].set(fill)
    elif dj == -1:
        out = out.at[:, W - 1].set(fill)
    return out


def flood_region(img: jnp.ndarray, blocked: jnp.ndarray, seed_yx,
                 lo, up, connectivity: int = 4,
                 fixed_range: bool = False):
    """Grow the flood region for [H, W, C] f32 pixels.

    Returns (region bool [H,W], n, (xmin, ymin, w, h)) — all device
    values; rect components are 0 when the region is empty."""
    H, W, C = img.shape
    nbrs = _NBRS8 if connectivity == 8 else _NBRS4
    lo = jnp.asarray(lo, jnp.float32).reshape(1, 1, C)
    up = jnp.asarray(up, jnp.float32).reshape(1, 1, C)
    free = ~blocked
    region0 = jnp.zeros((H, W), bool).at[seed_yx[0], seed_yx[1]].set(
        free[seed_yx[0], seed_yx[1]])

    if fixed_range:
        ref_v = img[seed_yx[0], seed_yx[1]].reshape(1, 1, C)
        ok = jnp.all((img >= ref_v - lo) & (img <= ref_v + up), axis=2) & free

        def body(state):
            region, _ = state
            grow = jnp.zeros_like(region)
            for di, dj in nbrs:
                grow |= _shift(region, di, dj, False)
            new = region | (grow & ok)
            return new, jnp.any(new != region)
    else:
        oks = []
        for di, dj in nbrs:
            nv = _shift_img(img, di, dj)
            oks.append(jnp.all((img >= nv - lo) & (img <= nv + up), axis=2)
                       & free)

        def body(state):
            region, _ = state
            new = region
            for (di, dj), okd in zip(nbrs, oks):
                new = new | (_shift(region, di, dj, False) & okd)
            return new, jnp.any(new != region)

    def cond(state):
        return state[1]

    region, _ = lax.while_loop(cond, lambda s: body(s), (region0, True))
    # the seeded state counts as "changed" once; run body to fixpoint
    n = jnp.sum(region)
    ys = jnp.any(region, axis=1)
    xs = jnp.any(region, axis=0)
    idx_y = jnp.arange(H)
    idx_x = jnp.arange(W)
    ymin = jnp.min(jnp.where(ys, idx_y, H))
    ymax = jnp.max(jnp.where(ys, idx_y, -1))
    xmin = jnp.min(jnp.where(xs, idx_x, W))
    xmax = jnp.max(jnp.where(xs, idx_x, -1))
    empty = n == 0
    rect = (jnp.where(empty, 0, xmin), jnp.where(empty, 0, ymin),
            jnp.where(empty, 0, xmax - xmin + 1),
            jnp.where(empty, 0, ymax - ymin + 1))
    return region, n, rect


def _shift_img(a: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """Shift [H,W,C] by (di, dj); vacated cells get +inf so any finite
    lo/up rejects them (the region shift already excludes them too)."""
    H, W, _ = a.shape
    out = jnp.roll(a, (di, dj), (0, 1))
    inf = jnp.float32(np.inf)
    if di == 1:
        out = out.at[0].set(inf)
    elif di == -1:
        out = out.at[H - 1].set(inf)
    if dj == 1:
        out = out.at[:, 0].set(inf)
    elif dj == -1:
        out = out.at[:, W - 1].set(inf)
    return out
