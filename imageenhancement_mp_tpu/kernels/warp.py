"""Pallas TPU kernel: windowed per-pixel 2D gather for the warp family.

The warp ops (warpAffine/warpPerspective/undistort interior) need
``src[y(px), x(px)]`` — a true per-pixel 2D gather.  XLA lowers that to a
per-element scalar loop (~10 ns/element; warp/rot15 4K measured
0.099 GPix/s = 0.4x the CPU baseline — docs/DESIGN.md §11), and the
hardware shuffle (``tpu.dynamic_gather``) spans only one vreg.  This
kernel closes the gap with the windowed candidate-select scheme sketched
in DESIGN §11:

* The output is tiled into ``[BH, 128]`` blocks.  For a STATIC map
  (warpAffine/warpPerspective bake their coordinate fields at trace
  time) the source footprint of every block is known on the host, so
  each grid step DMAs a small ``[SH, SW]`` source window into VMEM
  (double-buffered across grid steps; window origins ride scalar
  prefetch).
* Each window row pair is packed into a 2x2 "quad" i32
  (``p00 | p01<<8 | p10<<16 | p11<<24``), so ONE vreg gather per
  (candidate row, lane segment) fetches all four bilinear taps: the
  kernel chains ``SH * SW/128`` hardware shuffles with candidate-select
  folds (`ly == r & lx>>7 == c`) — ~``SH*SW/(128*BH*128)`` ops/px
  instead of XLA's scalar loop.
* The epilogue is cv2 5.0's exact float bilinear (two single-rounded
  f32 FMAs per lerp stage via ``utils.fma.fma32``) + cvRound/saturate,
  so the kernel output is bitwise-identical to the XLA device path and
  the ref oracle for replicate-clamped sampling.

Border semantics: the kernel itself implements CLAMPED (replicate)
sampling — the source is edge-padded one row/column so the quad packing
is exact at the image edges, and the host zeroes the x/y fractions where
``ix0 < 0`` / ``iy0 < 0`` (both taps clamp to the same texel, so the
lerp must degenerate — exact for integer dtypes).  Constant-border
callers overlay the (static) fully-outside region with the border value
and fix up the thin partial-footprint band with the exact XLA path
(`ops/warp.py` wires this).

Reference semantics: ref/ops.py ``warp_affine`` (SURVEY.md §2 row class;
the reference repo's cv2.warpAffine calls — BASELINE.json:5 families).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageenhancement_mp_tpu.kernels.common import LANES as _LANES
from imageenhancement_mp_tpu.kernels.common import round_up as _round_up
from imageenhancement_mp_tpu.kernels.common import shift_left as _shift_left
from imageenhancement_mp_tpu.utils.fma import fma32 as _fma32

__all__ = ["gather_bilinear_pallas", "gather_nearest_pallas", "window_plan"]

_BH = 16            # output block sublane rows
# SH * (SW/128) candidate-select budget per block.  Even at the cap the
# kernel does ~chain/2048 shuffle+select ops per output pixel — at 512
# that is 0.25 ops/px, still ~40x under XLA's ~10 ns/element scalar
# loop; the real limit is the window DMA traffic, bounded separately.
_MAX_CHAIN = 512
# VMEM window budget.  Real per-window VMEM pressure is ~6 bytes/elem —
# the DOUBLE-BUFFERED u8 window (2x) plus the i32 quad intermediate
# (4x) — so the 2 MiB cap admits at most ~12 MiB of window state; the
# remaining ~4 MiB of the 16 MiB VMEM holds the [BH,128] block I/O and
# Mosaic temporaries.  window_plan checks the full 6x figure (ADVICE
# r04: the old 5x heuristic undercounted the double buffer).
_MAX_WIN_BYTES = 1 << 21


class WindowTooLarge(ValueError):
    """The per-block source footprint exceeds the kernel's budget —
    caller must fall back to the XLA gather path."""


def window_plan(cy: np.ndarray, cx: np.ndarray, BH: int = _BH):
    """Host-side window geometry for a static map.

    ``cy``/``cx``: CLAMPED int32 top-left tap coords, shape (ohp, owp)
    (already padded to block multiples).  Returns
    ``(y0, x0, SH, SW)`` with per-block origins ``y0/x0`` of shape
    (gI, gJ) and global window size ``SH x SW``.
    """
    ohp, owp = cy.shape
    gI, gJ = ohp // BH, owp // _LANES
    cyb = cy.reshape(gI, BH, gJ, _LANES)
    cxb = cx.reshape(gI, BH, gJ, _LANES)
    ylo = cyb.min(axis=(1, 3))
    yhi = cyb.max(axis=(1, 3))
    xlo = cxb.min(axis=(1, 3))
    xhi = cxb.max(axis=(1, 3))
    y0 = (ylo // 8) * 8                     # 8-aligned DMA row origin
    x0 = (xlo // _LANES) * _LANES           # lane-aligned column origin
    # +1 quad row/col, +1 spare so the lane-roll wraparound never lands
    # on a used index
    SH = _round_up(int((yhi - y0).max()) + 2, 8)
    SW = _round_up(int((xhi - x0).max()) + 2, _LANES)
    if SH * (SW // _LANES) > _MAX_CHAIN or SH * SW * 6 > _MAX_WIN_BYTES:
        raise WindowTooLarge(
            f"window {SH}x{SW} exceeds the candidate-select budget")
    # the pk packing (ly<<14 | lx) requires lx < 2^14 and ly < 2^17;
    # the chain/VMEM budgets imply both today, but guard explicitly so a
    # future budget retune cannot silently corrupt coordinates (ADVICE r04)
    assert SW < (1 << 14) and SH < (1 << 17), (SH, SW)
    return y0.astype(np.int32), x0.astype(np.int32), SH, SW


def _warp_kernel(y0_ref, x0_ref, pk_ref, tx_ref, ty_ref, src_hbm, out_ref,
                 win, sem, *, SH: int, SW: int, gI: int, gJ: int, B: int,
                 nearest: bool):
    b = pl.program_id(0)
    gi = pl.program_id(1)
    gj = pl.program_id(2)
    t = (b * gI + gi) * gJ + gj
    n_blocks = B * gI * gJ
    per_img = gI * gJ

    def dma(slot, step):
        rem = jax.lax.rem(step, per_img)
        bb = jax.lax.div(step, per_img)
        # origins ride SMEM pre-divided by the u8 memref tiling (8, 128)
        # and are re-scaled here: Mosaic must PROVE the dynamic slice
        # start is tile-aligned, and `8 * k` is provable where a raw
        # SMEM load is not.
        return pltpu.make_async_copy(
            src_hbm.at[bb, pl.ds(y0_ref[rem] * 8, SH),
                       pl.ds(x0_ref[rem] * _LANES, SW)],
            win.at[slot],
            sem.at[slot],
        )

    slot = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < n_blocks)
    def _():
        dma(1 - slot, t + 1).start()

    dma(slot, t).wait()

    pk = pk_ref[...][0]                      # [BH, 128] i32
    lx = pk & 16383
    ly = pk >> 14
    lane = lx & (_LANES - 1)
    ncb = SW // _LANES
    # combined candidate key: one compare per chain step instead of the
    # row mask AND the segment mask (r05 tuning — ~20% fewer VPU ops)
    key = ly * ncb + (lx >> 7)

    acc = jnp.zeros(pk.shape, jnp.int32)
    wv = win[slot].astype(jnp.int32)                 # [SH, SW]
    if nearest:
        q = wv
    else:
        # pack each 2x2 tap quad into one i32: a single vreg gather per
        # (candidate row, lane segment) fetches all four bilinear taps
        lo = wv[: SH - 1]
        hi = wv[1:SH]
        q = (lo
             | (_shift_left(lo, 1) << 8)
             | (hi << 16)
             | (_shift_left(hi, 1) << 24))
    for r in range(SH - 1):
        for c in range(ncb):
            seg = jnp.broadcast_to(q[r : r + 1, c * _LANES : (c + 1) * _LANES],
                                   pk.shape)
            g = jnp.take_along_axis(seg, lane, axis=1,
                                    mode="promise_in_bounds")
            acc = jnp.where(key == r * ncb + c, g, acc)

    if nearest:
        out_ref[...] = (acc & 255).astype(jnp.uint8)[None]
        return
    p00 = (acc & 255).astype(jnp.float32)
    p01 = ((acc >> 8) & 255).astype(jnp.float32)
    p10 = ((acc >> 16) & 255).astype(jnp.float32)
    p11 = ((acc >> 24) & 255).astype(jnp.float32)
    tx = tx_ref[...][0]
    ty = ty_ref[...][0]
    top = _fma32(tx, p01 - p00, p00)
    bot = _fma32(tx, p11 - p10, p10)
    res = _fma32(ty, bot - top, top)
    # Mosaic has no direct f32->u8 cast on-chip; the value is integral
    # after round+clip, so the i32 hop is exact.
    out_ref[...] = (jnp.clip(jnp.round(res), 0.0, 255.0)
                    .astype(jnp.int32).astype(jnp.uint8))[None]


def _run(planes, cy, cx, tx, ty, oh, ow, nearest, interpret):
    """Shared driver: pads, plans windows, runs the kernel, crops."""
    B, H, W = planes.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    # pick the block height minimizing per-pixel cost: the chain is
    # ~4 VPU ops per (SH·SW/128) step and the window DMA is
    # SH·SW/(BH·128) bytes/px (~2.3 op-equivalents per byte at the
    # measured 657 GB/s vs ~1.5 Tops/s VPU) — smaller BH shrinks the
    # window row span, larger BH amortizes the DMA
    best = None
    for BH_c in (8, 16, 32):
        ohp_c, owp_c = _round_up(oh, BH_c), _round_up(ow, _LANES)
        pad_c = ((0, ohp_c - oh), (0, owp_c - ow))
        cy_c = np.pad(cy, pad_c, mode="edge")
        cx_c = np.pad(cx, pad_c, mode="edge")
        try:
            plan = window_plan(cy_c, cx_c, BH_c)
        except WindowTooLarge:
            continue
        SH_c, SW_c = plan[2], plan[3]
        cost = 4.0 * (SH_c - 1) * (SW_c // _LANES) + 2.3 * SH_c * SW_c / (
            BH_c * _LANES)
        if best is None or cost < best[0]:
            best = (cost, BH_c, ohp_c, owp_c, cy_c, cx_c, plan)
    if best is None:
        raise WindowTooLarge("no block height fits the window budget")
    _, BH, ohp, owp, cy, cx, (y0, x0, SH, SW) = best
    pad = ((0, ohp - oh), (0, owp - ow))
    gI, gJ = ohp // BH, owp // _LANES
    # source: +1 edge row/col for the quad packing, then cover the
    # largest window reach
    Hs = max(H + 1, int(y0.max()) + SH)
    Ws = max(_round_up(W + 1, _LANES), int(x0.max()) + SW)
    src = jnp.pad(planes, ((0, 0), (0, Hs - H), (0, Ws - W)), mode="edge")
    ly = cy - np.kron(y0, np.ones((BH, _LANES), np.int32))
    lx = cx - np.kron(x0, np.ones((BH, _LANES), np.int32))
    pk = jnp.asarray((ly << 14) | lx, jnp.int32)
    if not nearest:
        tx = jnp.asarray(np.pad(tx, pad, mode="edge"), jnp.float32)
        ty = jnp.asarray(np.pad(ty, pad, mode="edge"), jnp.float32)
    else:
        tx = jnp.zeros((ohp, owp), jnp.float32)
        ty = tx
    kernel = functools.partial(
        _warp_kernel, SH=SH, SW=SW, gI=gI, gJ=gJ, B=B, nearest=nearest)
    blk = pl.BlockSpec((1, BH, _LANES), lambda b, i, j: (0, i, j))
    out = pl.pallas_call(
        kernel,
        grid=(B, gI, gJ),
        out_shape=jax.ShapeDtypeStruct((B, ohp, owp), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk,
            blk,
            blk,
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, BH, _LANES), lambda b, i, j: (b, i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, SH, SW), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.asarray(y0.ravel() // 8), jnp.asarray(x0.ravel() // _LANES),
      pk[None], tx[None], ty[None], src)
    return out[:, :oh, :ow]


def gather_bilinear_pallas(planes: jnp.ndarray, sx: np.ndarray,
                           sy: np.ndarray,
                           interpret: bool | None = None) -> jnp.ndarray:
    """Replicate-clamped bilinear sampling of u8 ``planes [B,H,W]`` at
    the STATIC f32 coordinate field ``(sx, sy)`` of shape (oh, ow) —
    cv2 5.0's exact float bilinear law on the clamped taps.

    Raises :class:`WindowTooLarge` when a block's source footprint
    exceeds the chain budget (caller falls back to the XLA path)."""
    if planes.dtype != jnp.uint8:
        raise TypeError(f"gather_bilinear_pallas expects uint8, got "
                        f"{planes.dtype}")
    H, W = int(planes.shape[-2]), int(planes.shape[-1])
    oh, ow = sx.shape
    fx = np.floor(sx)
    fy = np.floor(sy)
    ix0 = np.clip(fx, -2, W + 1).astype(np.int64)
    iy0 = np.clip(fy, -2, H + 1).astype(np.int64)
    tx = (sx - fx).astype(np.float32)
    ty = (sy - fy).astype(np.float32)
    # both taps clamp to texel 0 when ix0 < 0 — degenerate the lerp
    # (exact: fma(0, d, p) == p)
    tx = np.where(ix0 < 0, np.float32(0), tx)
    ty = np.where(iy0 < 0, np.float32(0), ty)
    cx = np.clip(ix0, 0, W - 1).astype(np.int32)
    cy = np.clip(iy0, 0, H - 1).astype(np.int32)
    return _run(planes, cy, cx, tx, ty, oh, ow, False, interpret)


def gather_nearest_pallas(planes: jnp.ndarray, iy: np.ndarray,
                          ix: np.ndarray,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Replicate-clamped nearest sampling of u8 ``planes [B,H,W]`` at
    STATIC integer coords ``(iy, ix)`` of shape (oh, ow)."""
    if planes.dtype != jnp.uint8:
        raise TypeError(f"gather_nearest_pallas expects uint8, got "
                        f"{planes.dtype}")
    H, W = int(planes.shape[-2]), int(planes.shape[-1])
    oh, ow = iy.shape
    cx = np.clip(ix, 0, W - 1).astype(np.int32)
    cy = np.clip(iy, 0, H - 1).astype(np.int32)
    return _run(planes, cy, cx, None, None, oh, ow, True, interpret)
