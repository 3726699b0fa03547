"""Pallas CLAHE stage C: 9-neighbor LUT apply + bilinear blend, one kernel.

The r04 first cut applied the nine neighbor-tile LUTs with
``apply_luts_multi_pallas`` and blended in XLA — nine u8 planes written
to and re-read from HBM plus a 36-select blend pass.  This kernel keeps
everything in VMEM: per (tile, row-block) it builds the pixel one-hots
once, dots each of the 9 LUTs, ACCUMULATES the four l00/l01/l10/l11
fields with the static 3×3 half-masks inside the k-loop (no g_k ever
materializes), and finishes with blend_tile_luts' exact f32 association.

Static per-tile tables ride BlockSpec index maps: ``ytab[gh·nsub, ss, 8]``
carries (q0, q1, fy) per tile-local row block, ``xtab[gw, 8, twp]``
carries (c0, c1, fx) per tile column — both sliced from the exact global
``_interp_coords`` tables so every frac bit matches the gather path.
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


def _blend_kernel(x_ref, lut_ref, ytab_ref, xtab_ref, out_ref):
    ss, twp = x_ref.shape[1], x_ref.shape[2]
    pt = ss * twp
    x = x_ref[...].astype(jnp.int32).reshape(1, pt)
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, pt), 0)
    oh_hi = jnp.where(bins == (x >> 4), 1.0, 0.0)
    oh_lo = jnp.where(bins == (x & 15), 1.0, 0.0)
    luts = lut_ref[...][0].astype(jnp.int32).astype(jnp.float32)  # [144, 16]

    yt = ytab_ref[...][0]  # [ss, 8] f32: cols 0..2 = q0, q1, fy
    q0 = yt[:, 0:1]  # [ss, 1]
    q1 = yt[:, 1:2]
    fy = yt[:, 2:3]
    xt = xtab_ref[...][0]  # [8, twp] f32: rows 0..2 = c0, c1, fx
    c0 = xt[0:1, :]  # [1, twp]
    c1 = xt[1:2, :]
    fx = xt[2:3, :]

    zero = jnp.zeros((ss, twp), jnp.float32)
    l00 = zero
    l01 = zero
    l10 = zero
    l11 = zero
    for k in range(9):
        q, c = divmod(k, 3)
        m = jax.lax.dot_general(
            luts[16 * k : 16 * (k + 1)], oh_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = jnp.sum(oh_hi * m, axis=0, keepdims=True).reshape(ss, twp)
        qf = jnp.float32(q)
        cf = jnp.float32(c)
        l00 = l00 + jnp.where((q0 == qf) & (c0 == cf), g, 0.0)
        l01 = l01 + jnp.where((q0 == qf) & (c1 == cf), g, 0.0)
        l10 = l10 + jnp.where((q1 == qf) & (c0 == cf), g, 0.0)
        l11 = l11 + jnp.where((q1 == qf) & (c1 == cf), g, 0.0)
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

    ``y0g/y1g/fyg`` (len H = gh·th) and ``x0g/x1g/fxg`` (len W = gw·tw)
    are the global ``_interp_coords`` tables (host numpy)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    BT = tiles.shape[0]
    thp = _round_up(th, 8)
    twp = _round_up(tw, _LANES)
    if (thp, twp) != (th, tw):
        tiles = jnp.pad(tiles, ((0, 0), (0, thp - th), (0, twp - tw)))
    # row sub-blocks keep the [16, pt] one-hots inside VMEM (pt ≤ 2^15
    # → ~7 MB working set); thp % 8 == 0 so ss = 8 always qualifies
    ss = max(s for s in range(8, thp + 1, 8)
             if thp % s == 0 and s * twp <= (1 << 15))
    nsub = thp // ss

    # ytab[gh·nsub, ss, 8]: (q0, q1, fy) per global row, padded rows clipped
    rr = np.arange(gh * thp) % thp
    valid = rr < th
    ysrc = np.minimum(np.arange(gh * thp) // thp * th + np.minimum(rr, th - 1),
                      gh * th - 1)
    q0 = (y0g[ysrc] - np.arange(gh * thp) // thp + 1).astype(np.float32)
    q1 = (y1g[ysrc] - np.arange(gh * thp) // thp + 1).astype(np.float32)
    fy = fyg[ysrc].astype(np.float32)
    ytab = np.zeros((gh * thp, 8), np.float32)
    ytab[:, 0] = np.where(valid, q0, 0.0)
    ytab[:, 1] = np.where(valid, q1, 0.0)
    ytab[:, 2] = np.where(valid, fy, 0.0)
    ytab = ytab.reshape(gh * nsub, ss, 8)

    cc = np.arange(gw * twp) % twp
    cvalid = cc < tw
    xsrc = np.minimum(np.arange(gw * twp) // twp * tw + np.minimum(cc, tw - 1),
                      gw * tw - 1)
    c0 = (x0g[xsrc] - np.arange(gw * twp) // twp + 1).astype(np.float32)
    c1 = (x1g[xsrc] - np.arange(gw * twp) // twp + 1).astype(np.float32)
    fx = fxg[xsrc].astype(np.float32)
    xtab = np.zeros((8, gw * twp), np.float32)
    xtab[0] = np.where(cvalid, c0, 0.0)
    xtab[1] = np.where(cvalid, c1, 0.0)
    xtab[2] = np.where(cvalid, fx, 0.0)
    xtab = xtab.reshape(8, gw, twp).transpose(1, 0, 2)  # [gw, 8, twp]

    lut3 = luts9.reshape(BT, 9 * 16, 16)

    def x_idx(t, s):
        return (t, s, 0)

    out = pl.pallas_call(
        _blend_kernel,
        grid=(BT, nsub),
        out_shape=jax.ShapeDtypeStruct((BT, thp, twp), jnp.uint8),
        in_specs=[
            pl.BlockSpec((1, ss, twp), x_idx),
            pl.BlockSpec((1, 9 * 16, 16), lambda t, s: (t, 0, 0)),
            # tile t = ((b·gh + r)·gw + c): row-class = r·nsub + s
            pl.BlockSpec((1, ss, 8),
                         lambda t, s: ((t // gw) % gh * nsub + s, 0, 0)),
            pl.BlockSpec((1, 8, twp), lambda t, s: (t % gw, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ss, twp), x_idx),
        interpret=interpret,
    )(tiles, jnp.asarray(lut3), jnp.asarray(ytab), jnp.asarray(xtab))
    return out[:, :th, :tw]
