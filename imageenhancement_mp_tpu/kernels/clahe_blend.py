"""Pallas CLAHE stage C: per-tile 9-LUT gather + bilinear blend, one kernel.

Everything lives in the flat ``[*, 128]`` lane layout (multi-vreg-lane
reshapes don't lower — probed r04): the tiles, the output, and the
static per-class aux planes are passed pre-flattened (free row-major
reshapes in HBM).  Per pixel the kernel:

* forms the four combined LUT indices ``base_k(px) + v(px)`` where
  ``base ∈ {0, 256, …, 2048}`` encodes the (q, c) neighbor choice —
  host-precomputed from the exact global ``_interp_coords`` tables;
* chain-gathers each from the tile's ``[2304]`` stacked neighbor LUTs
  with the single-vreg ``tpu.dynamic_gather`` (18 gathers + select
  folds per field);
* blends with blend_tile_luts' exact f32 association.

Aux planes cover ONE image's (tile-row, tile-col, row-block) classes and
are shared across the batch via the BlockSpec index map.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from imageenhancement_mp_tpu.kernels.common import round_up as _round_up

__all__ = ["clahe_blend_pallas"]

_LANES = 128


def _blend_kernel(x_ref, lut_ref, base_ref, w_ref, out_ref, *, K: int):
    v = x_ref[...][0].astype(jnp.int32)  # [s2, 128]
    tabs = lut_ref[...][0].astype(jnp.int32)  # [K, 128] stacked 9 LUTs
    bases = base_ref[...][0]  # [4·s2, 128] i32
    w = w_ref[...][0]  # [2·s2, 128] f32: fy, fx
    s2 = v.shape[0]

    def gather(idx):
        low = idx & 127
        seg = idx >> 7
        out = None
        for k in range(K):
            tb = jnp.broadcast_to(tabs[k : k + 1], idx.shape)
            g = jnp.take_along_axis(tb, low, axis=1,
                                    mode="promise_in_bounds")
            out = g if out is None else jnp.where(seg == k, g, out)
        return out.astype(jnp.float32)

    l00 = gather(bases[0 * s2 : 1 * s2] + v)
    l01 = gather(bases[1 * s2 : 2 * s2] + v)
    l10 = gather(bases[2 * s2 : 3 * s2] + v)
    l11 = gather(bases[3 * s2 : 4 * s2] + v)
    fy = w[0 * s2 : 1 * s2]
    fx = w[1 * s2 : 2 * s2]
    # blend_tile_luts' exact association (strict per-op f32 on TPU)
    top = (1.0 - fx) * l00 + fx * l01
    bot = (1.0 - fx) * l10 + fx * l11
    out = (1.0 - fy) * top + fy * bot
    out = jnp.clip(jnp.round(out), 0.0, 255.0)
    out_ref[...] = out.astype(jnp.int32).astype(jnp.uint8)[None]


def clahe_blend_pallas(tiles, luts9, gh, gw, th, tw,
                       y0g, y1g, fyg, x0g, x1g, fxg,
                       interpret: bool | None = None):
    """Blend ``[BT, th, tw]`` u8 tiles through their ``[BT, 9, 256]``
    neighbor LUTs with the exact CLAHE bilinear weights → ``[BT, th, tw]``.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    BT = tiles.shape[0]
    T = gh * gw
    thp = _round_up(th, 8)
    twp = _round_up(tw, _LANES)
    if (thp, twp) != (th, tw):
        tiles = jnp.pad(tiles, ((0, 0), (0, thp - th), (0, twp - tw)))
    nch = twp // _LANES  # flat rows per pixel row
    rows_flat = thp * nch  # flat [*, 128] rows per tile
    # row sub-blocks: keep the 4 idx + 4 gather intermediates small
    ss = max(s for s in range(8, rows_flat + 1, 8)
             if rows_flat % s == 0 and s * _LANES <= (1 << 16))
    nsub = rows_flat // ss

    # ---- static aux planes for ONE image, flat [T·nsub, ss, 128] ----
    # per pixel (global y, x): base_k = ((q_k·3 + c_k) · 256), fy, fx
    H, W = gh * th, gw * tw
    yy = np.arange(H)
    xx = np.arange(W)
    q0 = (y0g - yy // th + 1).astype(np.int32)  # [H] ∈ {0,1,2}
    q1 = (y1g - yy // th + 1).astype(np.int32)
    c0 = (x0g - xx // tw + 1).astype(np.int32)
    c1 = (x1g - xx // tw + 1).astype(np.int32)

    def flatten_tiles(img2d):
        """[H, W] → [T, thp, twp] → [T·rows_flat, 128] (padded)."""
        t = img2d.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)
        t = np.pad(t, ((0, 0), (0, 0), (0, thp - th), (0, twp - tw)))
        return t.reshape(T * rows_flat, _LANES)

    base = {}
    for name, (qv, cv) in {
        0: (q0, c0), 1: (q0, c1), 2: (q1, c0), 3: (q1, c1)
    }.items():
        b2d = ((qv[:, None] * 3 + cv[None, :]) * 256).astype(np.int32)
        base[name] = flatten_tiles(b2d)
    fy2d = np.broadcast_to(fyg.astype(np.float32)[:, None], (H, W))
    fx2d = np.broadcast_to(fxg.astype(np.float32)[None, :], (H, W))
    fyf = flatten_tiles(fy2d)
    fxf = flatten_tiles(fx2d)

    # interleave per (tile, sub) class: bases [T·nsub, 4·ss, 128],
    # weights [T·nsub, 2·ss, 128]
    def classify(planes_list):
        n = len(planes_list)
        out = np.empty((T * nsub, n * ss, _LANES),
                       planes_list[0].dtype)
        for t in range(T):
            for sct in range(nsub):
                for i, p in enumerate(planes_list):
                    out[t * nsub + sct, i * ss : (i + 1) * ss] = p[
                        t * rows_flat + sct * ss : t * rows_flat + (sct + 1) * ss]
        return out

    bases_cls = classify([base[0], base[1], base[2], base[3]])
    w_cls = classify([fyf, fxf])

    xflat = tiles.reshape(BT, rows_flat, _LANES)
    lutK = luts9.reshape(BT, 9 * 256 // _LANES, _LANES)
    K = 9 * 256 // _LANES  # 18

    out = pl.pallas_call(
        functools.partial(_blend_kernel, K=K),
        grid=(BT, nsub),
        out_shape=jax.ShapeDtypeStruct((BT, rows_flat, _LANES), jnp.uint8),
        in_specs=[
            pl.BlockSpec((1, ss, _LANES), lambda t, s: (t, s, 0)),
            pl.BlockSpec((1, K, _LANES), lambda t, s: (t, 0, 0)),
            pl.BlockSpec((1, 4 * ss, _LANES),
                         lambda t, s, _T=T, _n=nsub: ((t % _T) * _n + s, 0, 0)),
            pl.BlockSpec((1, 2 * ss, _LANES),
                         lambda t, s, _T=T, _n=nsub: ((t % _T) * _n + s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ss, _LANES), lambda t, s: (t, s, 0)),
        interpret=interpret,
    )(xflat, jnp.asarray(lutK), jnp.asarray(bases_cls), jnp.asarray(w_cls))
    return out.reshape(BT, thp, twp)[:, :th, :tw]
