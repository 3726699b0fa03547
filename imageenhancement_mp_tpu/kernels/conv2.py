"""Round-5 wide-layout separable conv kernels: packed pixel pairs + MXU.

The round-4 conv kernel (kernels/conv.py) measures 34 GPix/s on u8 4K —
VPU-bound: this chip's vector unit sustains ~1.5 Tops/s of i32 elementwise
work (experiments/exp01), and the i32 tap math costs ~25 ops/px on top of
a full-array host pad (an extra 2 B/px HBM pass).  This kernel removes
both costs (SURVEY.md §3.3's fused tile kernel, VERDICT r04 items 1/4):

* **No host pad.**  The image streams through BlockSpec-pipelined
  ``[th, W]`` row stripes; the 2-row vertical halos ride as a tiny
  side array (``[B, n_tiles, 8, W]``, built by one XLA row gather with
  REFLECT_101 rows baked in at the image edges), and the horizontal
  REFLECT_101 border is handled by recomputing the 128-lane edge strips
  exactly (lane rolls leave wraparound garbage only in the outer 2
  columns, inside those strips).
* **Packed pixel pairs.**  Two u8 pixels travel in one i32 lane
  (lo + hi·2^16).  With reduced fixed-point taps whose scale product
  ``qv·qh ≤ 257`` (σ=0 binomial k3/k5 — cv2's Q8 taps are 16·Q4 there,
  SURVEY.md §8.2), every intermediate half stays < 2^16: the vertical
  accumulator ≤ 255·qv, the horizontal ≤ 255·qv·qh, so no carry ever
  crosses the half boundary and the maths is bit-exact at twice the
  VPU element rate.  cv2's u8 rounding ``(acc8 + 2^15) >> 16`` equals
  ``(acc + q/2) >> log2(q)`` for the reduced scale q = qv·qh, applied
  packed as ``((h + (q/2)·0x00010001) >> s) & 0x00FF00FF``.
  The raw experiment kernel measured 117 GPix/s on 4K
  (experiments/exp03); certified production rows (docs/BENCH_TPU_r09):
  unsharp 80.3 / gaussian5 87.7 GPix/s at 1080p×8 — ~2.5× the round-4
  kernel, ~25 % of the 657 GB/s roofline at 2 B/px.
* **General taps ride the MXU.**  For arbitrary σ (Q8 taps up to 255 —
  exact in bf16), the vertical pass is one banded-matrix matmul
  ``[th, th+4]·[th+4, W]`` in bf16 with f32 accumulation (all integer
  values < 2^24: exact), and the horizontal pass runs in f32 on the VPU.
  Measured 84 GPix/s.
* **Optional fused LUT prologue** (the SURVEY §3.3 flagship): a 256-entry
  u8 LUT applied with two vreg dynamic-gathers + select per 128-lane
  block before the conv, keeping hist-eq's LUT apply, the 5×5 conv and
  the unsharp epilogue in ONE VMEM residency.  Measured 64 GPix/s for
  the full LUT+conv+unsharp stage.

Exactness: identical results to kernels/conv.py (itself bit-exact vs
cv2 — the fixed-point taps come from the same cumulative quantization,
ref/ops.py gaussian_kernel_fixed); integral unsharp amounts are pure
int32, fractional amounts reproduce cv2's two single-rounded f32 FMAs
(utils/fma.py).  tests/test_conv2.py pins every path against ref/.

Layout requirements (callers fall back to kernels/conv.py otherwise):
u8 planes, W a multiple of 128 with W ≥ 256, H a multiple of 8 with a
tile divisor ≤ 272.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageenhancement_mp_tpu.utils.fma import fma32 as _fma32

__all__ = [
    "supports_wide",
    "wide_tile_rows",
    "sep_conv5_wide",
]

_LANES = 128
_MAX_TH = 272  # stripe rows cap: packed working set ~8 MB at 4K width


def wide_tile_rows(H: int, max_rows: int = _MAX_TH) -> int | None:
    """Largest divisor of H that is a multiple of 8 and ≤ ``max_rows``."""
    if H % 8:
        return None
    best = None
    for th in range(8, min(H, max_rows) + 1, 8):
        if H % th == 0:
            best = th
    return best


# VMEM row-stripe budgets (empirical, v5e 16 MiB scoped vmem): the packed
# kernel compiles at th·W = 240·3840; the MXU kernel's f32 intermediates
# (v0 i32 + bf16 copy + a/h/src f32) are ~2× heavier and OOM there —
# 120·3840 fits with ~6 MiB headroom.
_PACKED_PXBUDGET = 240 * 3840
_MXU_PXBUDGET = 120 * 3840


def _tile_rows_for(H: int, W: int, budget: int) -> int | None:
    return wide_tile_rows(H, min(_MAX_TH, max(8, budget // W // 8 * 8)))


def supports_wide(planes_shape, dtype) -> bool:
    """True when the wide-layout kernel covers this plane stack."""
    H, W = planes_shape[-2], planes_shape[-1]
    return (
        dtype == jnp.uint8
        and W % _LANES == 0
        and W >= 2 * _LANES
        and _tile_rows_for(H, W, _MXU_PXBUDGET) is not None
    )


def _reduce_taps(taps8: tuple[int, ...]) -> tuple[tuple[int, ...], int]:
    """Divide Q8 taps by their common power of two; return (taps, log2 q)."""
    z = 8
    for t in taps8:
        if t:
            z = min(z, (t & -t).bit_length() - 1)
    return tuple(t >> z for t in taps8), 8 - z


def _sh(v, j):
    """Centered lane shift: out[:, c] = v[:, c - j] (wraparound garbage
    lands in the outer |j| columns, which the edge strips recompute)."""
    if j == 0:
        return v
    return pltpu.roll(v, j if j > 0 else v.shape[-1] + j, axis=1)


def _lut_apply_blocks(v0, lut2):
    """256-entry LUT on an i32 array via the vreg dynamic-gather, one
    128-lane block at a time (the hardware shuffle spans a single vreg
    along the gather dimension — docs/DESIGN.md §9d)."""
    nb = v0.shape[1] // _LANES
    cols = []
    for b in range(nb):
        vb = v0[:, b * _LANES:(b + 1) * _LANES]
        low = vb & 127
        g0 = jnp.take_along_axis(
            jnp.broadcast_to(lut2[0:1], vb.shape), low, axis=1,
            mode="promise_in_bounds")
        g1 = jnp.take_along_axis(
            jnp.broadcast_to(lut2[1:2], vb.shape), low, axis=1,
            mode="promise_in_bounds")
        cols.append(jnp.where(vb >= 128, g1, g0))
    return jnp.concatenate(cols, axis=1)


def _hconv_int(a, taps, W):
    """Centered horizontal conv with exact REFLECT_101 edge strips."""
    r = len(taps) // 2
    h = taps[r] * a
    for j in range(1, r + 1):
        h = h + taps[r - j] * (_sh(a, j) + _sh(a, -j))
    # edge strips: assemble reflected column extensions a[-r..127+r] /
    # a[W-128-r..W-1+r] and redo the 128-lane blocks with static slices
    lext = jnp.concatenate(
        [a[:, j:j + 1] for j in range(r, 0, -1)] + [a[:, 0:_LANES + r]],
        axis=1)  # cols [-r..127+r]; reflect101: col -j = col j
    rext = jnp.concatenate(
        [a[:, W - _LANES - r:W]]
        + [a[:, W - 1 - k:W - k] for k in range(1, r + 1)],
        axis=1)  # cols [W-128-r..W-1+r]; col W-1+k = col W-1-k
    hl = sum(taps[j] * lext[:, j:j + _LANES] for j in range(2 * r + 1))
    hr = sum(taps[j] * rext[:, j:j + _LANES] for j in range(2 * r + 1))
    mid = [h[:, _LANES:W - _LANES]] if W > 2 * _LANES else []
    return jnp.concatenate([hl] + mid + [hr], axis=1)


def _hconv_f32(a, taps, W):
    r = len(taps) // 2
    tf = [jnp.float32(t) for t in taps]
    h = tf[r] * a
    for j in range(1, r + 1):
        h = h + tf[r - j] * (_sh(a, j) + _sh(a, -j))
    lext = jnp.concatenate(
        [a[:, j:j + 1] for j in range(r, 0, -1)] + [a[:, 0:_LANES + r]],
        axis=1)
    rext = jnp.concatenate(
        [a[:, W - _LANES - r:W]]
        + [a[:, W - 1 - k:W - k] for k in range(1, r + 1)],
        axis=1)
    hl = sum(tf[j] * lext[:, j:j + _LANES] for j in range(2 * r + 1))
    hr = sum(tf[j] * rext[:, j:j + _LANES] for j in range(2 * r + 1))
    mid = [h[:, _LANES:W - _LANES]] if W > 2 * _LANES else []
    return jnp.concatenate([hl] + mid + [hr], axis=1)


def _kernel_packed(x_ref, ht_ref, hb_ref, *rest,
                   taps_v, taps_h, qlog, amount, use_lut):
    """Two pixels per i32 lane; halves never carry (qv·qh ≤ 257)."""
    if use_lut:
        lut_ref, o_ref = rest
    else:
        (o_ref,) = rest
    th = x_ref.shape[1]
    W = x_ref.shape[2]
    K = th // 2
    rv = len(taps_v) // 2
    v0 = jnp.concatenate(
        [ht_ref[0, 0, 8 - rv:8].astype(jnp.int32),
         x_ref[0].astype(jnp.int32),
         hb_ref[0, 0, 0:rv].astype(jnp.int32)], axis=0)  # [th+2rv, W]
    if use_lut:
        v0 = _lut_apply_blocks(v0, lut_ref[0])
    # overlap-pack: rows [0:K+2rv] low halves, rows [K:th+2rv] high halves
    p = v0[0:K + 2 * rv, :] + (v0[K:th + 2 * rv, :] << 16)
    a = taps_v[rv] * p[rv:rv + K, :]
    for j in range(1, rv + 1):
        a = a + taps_v[rv - j] * (p[rv - j:rv - j + K, :] + p[rv + j:rv + j + K, :])
    h = _hconv_int(a, taps_h, W)
    half = 1 << (qlog - 1)
    blur = ((h + half * 0x00010001) >> qlog) & 0x00FF00FF
    src = p[rv:rv + K, :]
    if amount is None:
        lo = blur & 0xFFFF
        hi = (blur >> 16) & 0xFFFF
    elif amount == int(amount):
        am = int(amount)
        t = (1 + am) * src - am * blur + am * 0x01000100
        lo = jnp.clip((t & 0xFFFF) - 256 * am, 0, 255)
        hi = jnp.clip(((t >> 16) & 0xFFFF) - 256 * am, 0, 255)
    else:
        # cv2's fractional addWeighted: two single-rounded f32 FMAs on
        # the unpacked halves (values < 2^24: exact in f32)
        def upk(w):
            return (w & 0xFFFF).astype(jnp.float32), \
                   ((w >> 16) & 0xFFFF).astype(jnp.float32)

        s_lo, s_hi = upk(src)
        b_lo, b_hi = upk(blur)
        ga = jnp.float32(1.0 + amount)
        lo = jnp.clip(jnp.round(_fma32(s_lo, ga, b_lo * jnp.float32(-amount))),
                      0.0, 255.0).astype(jnp.int32)
        hi = jnp.clip(jnp.round(_fma32(s_hi, ga, b_hi * jnp.float32(-amount))),
                      0.0, 255.0).astype(jnp.int32)
    o_ref[0, 0:K, :] = lo.astype(jnp.uint8)
    o_ref[0, K:th, :] = hi.astype(jnp.uint8)


def _kernel_mxu(x_ref, ht_ref, hb_ref, vm_ref, *rest,
                taps_h, amount, use_lut):
    """General Q8 taps: banded-matrix vertical pass on the MXU (bf16 taps
    ≤ 255 and u8 pixels are exact in bf16; f32 accumulation of integers
    < 2^24 is exact), horizontal pass + epilogue in f32 on the VPU."""
    if use_lut:
        lut_ref, o_ref = rest
    else:
        (o_ref,) = rest
    th = x_ref.shape[1]
    W = x_ref.shape[2]
    rv = (vm_ref.shape[1] - vm_ref.shape[0]) // 2
    v0 = jnp.concatenate(
        [ht_ref[0, 0, 8 - rv:8].astype(jnp.int32),
         x_ref[0].astype(jnp.int32),
         hb_ref[0, 0, 0:rv].astype(jnp.int32)], axis=0)
    if use_lut:
        v0 = _lut_apply_blocks(v0, lut_ref[0])
    a = jax.lax.dot_general(
        vm_ref[...], v0.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [th, W] ints < 2^16
    h = _hconv_f32(a, taps_h, W)  # ints < 2^24: exact f32
    blur = jnp.floor((h + 32768.0) * jnp.float32(2.0 ** -16))
    if amount is None:
        res = blur
    else:
        src = v0[rv:rv + th, :].astype(jnp.float32)
        if amount == int(amount):
            res = jnp.clip(src + amount * (src - blur), 0.0, 255.0)
        else:
            res = jnp.clip(
                jnp.round(_fma32(src, jnp.float32(1.0 + amount),
                                 blur * jnp.float32(-amount))), 0.0, 255.0)
    o_ref[...] = res.astype(jnp.int32).astype(jnp.uint8)[None]


def _halo_arrays(planes, th, rv):
    """[B, n, 8, W] row blocks whose last rv rows (tops) / first rv rows
    (bots) are the REFLECT_101 vertical halos of each stripe."""
    H = planes.shape[1]
    n = H // th
    top_idx = np.zeros((n, 8), np.int32)
    bot_idx = np.zeros((n, 8), np.int32)
    for t in range(n):
        for j in range(rv):
            r = t * th - rv + j
            top_idx[t, 8 - rv + j] = -r if r < 0 else r
            r = t * th + th + j
            bot_idx[t, j] = 2 * (H - 1) - r if r > H - 1 else r
    tops = planes[:, jnp.asarray(top_idx), :]
    bots = planes[:, jnp.asarray(bot_idx), :]
    return tops, bots


@functools.partial(
    jax.jit,
    static_argnames=("taps_v", "taps_h", "amount", "interpret"))
def _sep_conv5_wide_jit(planes, lut2, taps_v, taps_h, amount, interpret):
    B, H, W = planes.shape
    rv = len(taps_v) // 2
    tv_red, zv = _reduce_taps(taps_v)
    th_red, zh = _reduce_taps(taps_h)
    packed = zv + zh <= 8  # both halves stay < 2^16 through the H pass
    th = _tile_rows_for(H, W, _PACKED_PXBUDGET if packed else _MXU_PXBUDGET)
    n = H // th
    tops, bots = _halo_arrays(planes, th, rv)
    use_lut = lut2 is not None

    in_specs = [
        pl.BlockSpec((1, th, W), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, 1, 8, W), lambda b, t: (b, t, 0, 0)),
        pl.BlockSpec((1, 1, 8, W), lambda b, t: (b, t, 0, 0)),
    ]
    args = [planes, tops, bots]
    if packed:
        kern = functools.partial(
            _kernel_packed, taps_v=tv_red, taps_h=th_red, qlog=zv + zh,
            amount=amount, use_lut=use_lut)
    else:
        vm = np.zeros((th, th + 2 * rv), np.float32)
        for j, t in enumerate(taps_v):
            for r in range(th):
                vm[r, r + j] = float(t)
        in_specs.append(pl.BlockSpec((th, th + 2 * rv), lambda b, t: (0, 0)))
        args.append(jnp.asarray(vm, jnp.bfloat16))
        kern = functools.partial(
            _kernel_mxu, taps_h=taps_h, amount=amount, use_lut=use_lut)
    if use_lut:
        in_specs.append(pl.BlockSpec((1, 2, _LANES), lambda b, t: (b, 0, 0)))
        args.append(lut2)

    out = pl.pallas_call(
        kern,
        grid=(B, n),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, W), lambda b, t: (b, t, 0)),
        interpret=interpret,
    )(*args)
    return out


def sep_conv5_wide(
    planes: jnp.ndarray,
    taps_v: tuple[int, ...],
    taps_h: tuple[int, ...],
    amount: float | None = None,
    lut2: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Separable fixed-point conv over ``[B, H, W] u8`` planes, wide layout.

    ``taps_v``/``taps_h``: cv2 Q8 integer taps (ref/ops.py
    gaussian_kernel_fixed).  ``amount``: None → blur output; else the
    unsharp `addWeighted(src, 1+a, blur, −a)` epilogue.  ``lut2``:
    optional ``[B, 2, 128]`` i32 per-plane 256-entry LUT applied to the
    pixels before the conv (the hist-eq flagship prologue).

    Callers must check :func:`supports_wide` first.
    """
    if planes.dtype != jnp.uint8:
        raise TypeError(f"sep_conv5_wide expects uint8, got {planes.dtype}")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    return _sep_conv5_wide_jit(
        planes, lut2, tuple(int(t) for t in taps_v),
        tuple(int(t) for t in taps_h),
        None if amount is None else float(amount), interpret)
