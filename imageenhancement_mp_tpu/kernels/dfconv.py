"""Fused double-float separable conv + adaptiveThreshold epilogue (Pallas).

``cv2.adaptiveThreshold(GAUSSIAN_C)`` computes its local mean with cv2's
FLOAT σ=0 kernel in f64 (a pinned quirk — ref/ops.py adaptive_threshold),
so the device path emulates f64 with double-float f32 (utils/fma.py
Dekker/Knuth).  The XLA formulation (ops/threshold.py _df_sep_conv_round)
materializes every tap's two_prod/two_sum intermediate in HBM — measured
0.88 GPix/s on 4K (3.6× the CPU baseline, VERDICT r04 weak #5).  This
kernel keeps the whole chain — u8 → vertical df conv → horizontal df conv
→ half-even round → threshold compare — in ONE VMEM residency per row
stripe: HBM traffic is one u8 read + one u8 write.

Layout mirrors kernels/conv2.py: ``[th, W]`` row stripes via BlockSpec
pipelining, BORDER_REPLICATE vertical halos as a small side array, and
horizontal REPLICATE handled by recomputing the 128-lane edge strips
(lane rolls leave wraparound garbage only in the outer r columns, inside
those strips).  Requirements: u8, W % 128 == 0, W ≥ 256, H % 8 == 0,
r = block_size//2 ≤ 8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageenhancement_mp_tpu.utils.fma import two_prod, two_sum

__all__ = ["supports_athresh_wide", "adaptive_threshold_gaussian_pallas"]

_LANES = 128
# the unrolled df chains keep ~35 stripe-sized f32 temps live (measured:
# 18.6 MiB at 256·512); keep th·W·140 B within ~13 MiB VMEM
_PXBUDGET = 24 * 3840


def _tile_rows(H: int, W: int) -> int | None:
    cap = max(8, _PXBUDGET // W // 8 * 8)
    best = None
    for th in range(8, min(H, cap) + 1, 8):
        if H % th == 0:
            best = th
    return best


def supports_athresh_wide(shape, dtype, block_size: int) -> bool:
    H, W = shape[-2], shape[-1]
    return (
        dtype == jnp.uint8
        and W % _LANES == 0
        and W >= 2 * _LANES
        and H % 8 == 0
        and block_size // 2 <= 8
        and _tile_rows(H, W) is not None
    )


def _sh(v, j):
    """Centered lane shift: out[:, c] = v[:, c - j]."""
    if j == 0:
        return v
    return pltpu.roll(v, j if j > 0 else v.shape[-1] + j, axis=1)


def _rep_ext(a, r, W):
    """Replicate column extensions for the two 128-lane edge strips."""
    lext = jnp.concatenate([a[:, 0:1]] * r + [a[:, 0 : _LANES + r]], axis=1)
    rext = jnp.concatenate(
        [a[:, W - _LANES - r : W]] + [a[:, W - 1 : W]] * r, axis=1
    )
    return lext, rext


def _df_round(s, e):
    """Half-even round of the double-float (s+e) — ops/threshold.py law."""
    r0 = jnp.round(s)
    d = (s - r0) + e
    adj = jnp.where(d > 0.5, 1.0, jnp.where(d < -0.5, -1.0, 0.0))
    odd = jnp.mod(r0, 2.0) != 0
    adj = jnp.where((d == 0.5) & odd, 1.0, adj)
    adj = jnp.where((d == -0.5) & odd, -1.0, adj)
    return (r0 + adj).astype(jnp.int32)


def _kernel(x_ref, ht_ref, hb_ref, o_ref, *, hi, lo, rv, mv, idelta, inv):
    th = x_ref.shape[1]
    W = x_ref.shape[2]
    k = len(hi)
    rh = ht_ref.shape[2]
    # u8 → i32 → f32: Mosaic has no direct u8→f32 cast on hardware
    x = jnp.concatenate(
        [
            ht_ref[0, 0, rh - rv : rh].astype(jnp.int32),
            x_ref[0].astype(jnp.int32),
            hb_ref[0, 0, 0:rv].astype(jnp.int32),
        ],
        axis=0,
    ).astype(jnp.float32)  # [th+2rv, W]

    # vertical df conv → (vs, ve): pixels are ≤ 2^8 integers, hi taps have
    # full f32 mantissas → two_prod needed even for the hi parts
    vs = ve = None
    for i in range(k):
        v = x[i : i + th, :]
        ph, pe = two_prod(v, jnp.float32(hi[i]))
        pl_ = v * jnp.float32(lo[i]) if lo[i] != 0.0 else None
        err = pe if pl_ is None else pe + pl_
        if vs is None:
            vs, ve = ph, err
        else:
            vs, te = two_sum(vs, ph)
            ve = ve + (te + err)

    # horizontal df conv on (vs, ve) with replicate edge strips
    def hpass(get_s, get_e, width):
        s = e = None
        for i in range(k):
            a, ae0 = two_prod(get_s(i), jnp.float32(hi[i]))
            al = get_s(i) * jnp.float32(lo[i]) + get_e(i) * jnp.float32(hi[i])
            err = ae0 + al
            if s is None:
                s, e = a, err
            else:
                s, te = two_sum(s, a)
                e = e + (te + err)
        return s, e

    hs, he = hpass(lambda i: _sh(vs, rv - i), lambda i: _sh(ve, rv - i), W)
    ls_s, rs_s = _rep_ext(vs, rv, W)
    ls_e, rs_e = _rep_ext(ve, rv, W)
    hls, hle = hpass(
        lambda i: ls_s[:, i : i + _LANES], lambda i: ls_e[:, i : i + _LANES], _LANES
    )
    hrs, hre = hpass(
        lambda i: rs_s[:, i : i + _LANES], lambda i: rs_e[:, i : i + _LANES], _LANES
    )
    s = jnp.concatenate([hls, hs[:, _LANES : W - _LANES], hrs], axis=1)
    e = jnp.concatenate([hle, he[:, _LANES : W - _LANES], hre], axis=1)

    mean = _df_round(s, e)
    src = x[rv : rv + th, :].astype(jnp.int32)
    hit = src > mean - idelta
    if inv:
        res = jnp.where(hit, 0, mv)
    else:
        res = jnp.where(hit, mv, 0)
    o_ref[...] = res.astype(jnp.uint8)[None]


def _halo_replicate(planes, th, rv, rh):
    """[B, n, rh, W] row blocks whose last rv rows (tops) / first rv rows
    (bots) are the REPLICATE vertical halos of each stripe."""
    H = planes.shape[1]
    n = H // th
    top_idx = np.zeros((n, rh), np.int32)
    bot_idx = np.zeros((n, rh), np.int32)
    for t in range(n):
        for j in range(rv):
            top_idx[t, rh - rv + j] = np.clip(t * th - rv + j, 0, H - 1)
            bot_idx[t, j] = np.clip(t * th + th + j, 0, H - 1)
    return planes[:, jnp.asarray(top_idx), :], planes[:, jnp.asarray(bot_idx), :]


@functools.partial(
    jax.jit, static_argnames=("taps", "mv", "idelta", "inv", "interpret")
)
def _athresh_jit(planes, taps, mv, idelta, inv, interpret):
    B, H, W = planes.shape
    k = len(taps)
    rv = k // 2
    th = _tile_rows(H, W)
    n = H // th
    hi = tuple(float(np.float32(t)) for t in taps)
    lo = tuple(float(np.float32(t - float(np.float32(t)))) for t in taps)
    tops, bots = _halo_replicate(planes, th, rv, 8)
    kern = functools.partial(
        _kernel, hi=hi, lo=lo, rv=rv, mv=mv, idelta=idelta, inv=inv
    )
    return pl.pallas_call(
        kern,
        grid=(B, n),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
        in_specs=[
            pl.BlockSpec((1, th, W), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, 1, 8, W), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, 8, W), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W), lambda b, t: (b, t, 0)),
        interpret=interpret,
    )(planes, tops, bots)


def adaptive_threshold_gaussian_pallas(
    planes: jnp.ndarray,
    taps64,
    maxval_sat: int,
    idelta: int,
    inv: bool,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused GAUSSIAN_C adaptiveThreshold over ``[B, H, W] u8`` planes.

    ``taps64``: cv2's float σ=0 kernel (ref/ops.py gaussian_kernel) as
    f64 floats; ``maxval_sat``: round(maxval) pre-saturated to [0,255];
    ``idelta``: ceil(C) for binary / floor(C) for binary_inv; ``inv``:
    binary_inv.  Callers must check :func:`supports_athresh_wide`.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _athresh_jit(
        planes,
        tuple(float(t) for t in taps64),
        int(maxval_sat),
        int(idelta),
        bool(inv),
        interpret,
    )
