"""Pallas TPU kernel: double-buffered separable conv with fused epilogues.

The hot spatial-filter path (SURVEY.md §3.3): Gaussian blur / unsharp mask as
ONE kernel per plane that streams row stripes HBM→VMEM with double-buffered
DMA (compute stripe t while DMAing stripe t+1 in and stripe t−1 out), does
the separable 5-tap (or 3/7) conv in f32 in a single VMEM residency, applies
the epilogue (none / unsharp), and streams uint8 back out.  Traffic is the
speed-of-light 2 bytes/pixel instead of XLA's materialized f32 intermediates.

Exactness (SURVEY.md §8.2): σ=0 taps are cv2's integer binomials ·256; all
accumulators are integers < 2^24 so f32 math is exact; output is
``floor((acc + 2^15)·2^-16)`` — bit-identical to cv2's fixed-point uint8
path.  The fractional unsharp epilogue reproduces cv2's two single-rounded
f32 FMAs exactly (utils/fma.py).

Layout strategy: the caller pads the plane with the REFLECT_101 halo on all
sides and right-pads columns to a lane multiple (128).  Horizontal taps use
``pltpu.roll`` (lane rotate) — wraparound garbage lands in the crop margin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageenhancement_mp_tpu.ref.ops import gaussian_kernel_fixed

from imageenhancement_mp_tpu.kernels.common import LANES as _LANES
from imageenhancement_mp_tpu.kernels.common import round_up as _round_up
from imageenhancement_mp_tpu.utils.fma import fma32 as _fma32
from imageenhancement_mp_tpu.kernels.common import shift_left as _shift_left

__all__ = ["gaussian_blur_pallas", "unsharp_mask_pallas"]


def _conv_kernel(
    in_hbm,
    out_hbm,
    buf_in,
    buf_out,
    sem_in,
    sem_out,
    *,
    taps_v: tuple[float, ...],
    taps_h: tuple[float, ...],
    th: int,
    n_tiles: int,
    amount: float | None,
):
    """One plane: loop over row stripes with double-buffered in/out DMA."""
    b = pl.program_id(0)
    pv = len(taps_v) // 2  # vertical (row) halo
    ph = len(taps_h) // 2  # horizontal (lane) halo
    taps_v = tuple(int(t) for t in taps_v)  # int constants keep i32 math i32
    taps_h = tuple(int(t) for t in taps_h)

    halo = -(-2 * pv // 8) * 8  # DMA row counts must be 8-aligned

    def dma_in(slot, t):
        return pltpu.make_async_copy(
            in_hbm.at[b, pl.ds(t * th, th + halo), :],
            buf_in.at[slot],
            sem_in.at[slot],
        )

    def dma_out(slot, t):
        return pltpu.make_async_copy(
            buf_out.at[slot],
            out_hbm.at[b, pl.ds(t * th, th), :],
            sem_out.at[slot],
        )

    dma_in(0, 0).start()

    def body(t, _):
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < n_tiles)
        def _():
            dma_in(nxt, t + 1).start()

        dma_in(slot, t).wait()

        # output buffer slot is being DMA'd out from iteration t-2; wait it
        @pl.when(t >= 2)
        def _():
            dma_out(slot, t - 2).wait()

        # Pure int32 path: taps·256 are integers, acc < 2^24, output
        # (acc + 2^15) >> 16 — bit-exact and ~25% faster than f32
        # (smaller working set → bigger stripes).  Taps are symmetric:
        # pair the mirrored ends to halve the multiplies.
        x = buf_in[slot].astype(jnp.int32)
        v = taps_v[pv] * x[pv : pv + th, :]
        for j in range(pv):
            v = v + taps_v[j] * (x[j : j + th, :] + x[2 * pv - j : 2 * pv - j + th, :])
        h = taps_h[ph] * _shift_left(v, ph)
        for j in range(ph):
            h = h + taps_h[j] * (_shift_left(v, j) + _shift_left(v, 2 * ph - j))
        blur = jnp.clip((h + 32768) >> 16, 0, 255)
        if amount is None:
            res = blur
        else:
            src = _shift_left(x[pv : pv + th, :], ph)
            if amount == int(amount):
                # integral gain: exact in int32
                res = jnp.clip(src + int(amount) * (src - blur), 0, 255)
            else:
                # cv2's fractional addWeighted: two single-rounded f32 FMAs
                srcf = src.astype(jnp.float32)
                addend = blur.astype(jnp.float32) * jnp.float32(-amount)
                res = jnp.clip(
                    jnp.round(_fma32(srcf, jnp.float32(1.0 + amount), addend)),
                    0.0,
                    255.0,
                ).astype(jnp.int32)
        buf_out[slot] = res.astype(jnp.uint8)
        dma_out(slot, t).start()

    jax.lax.fori_loop(0, n_tiles, body, None)
    # drain the last (up to) two output DMAs
    @pl.when(n_tiles >= 2)
    def _():
        dma_out(jax.lax.rem(n_tiles - 2, 2), n_tiles - 2).wait()

    dma_out(jax.lax.rem(n_tiles - 1, 2), n_tiles - 1).wait()


def _sep_conv_planes(
    planes: jnp.ndarray,
    taps_v: tuple[float, ...],
    taps_h: tuple[float, ...],
    amount: float | None,
    tile_rows: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Run the DMA kernel over [B,H,W] u8 planes; returns [B,H,W] u8."""
    B, H, W = planes.shape
    pv = len(taps_v) // 2
    ph = len(taps_h) // 2
    if pv <= 8 and ph <= 8:
        # wide-layout fast path (packed pixel pairs / banded-MXU vertical
        # pass, no host pad): 117 vs 34 GPix/s on 4K u8 — kernels/conv2.py
        from imageenhancement_mp_tpu.kernels.conv2 import (
            sep_conv5_wide,
            supports_wide,
        )

        if supports_wide(planes.shape, planes.dtype):
            return sep_conv5_wide(
                planes,
                tuple(int(t) for t in taps_v),
                tuple(int(t) for t in taps_h),
                amount,
                interpret=interpret,
            )
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    # columns: pad-left halo + W + pad-right halo, rounded up to lanes.
    wp = _round_up(W + 2 * ph, _LANES)
    # pick stripe height (multiple of 8) minimizing padding waste, bounded so
    # the working set fits VMEM (~14 B/px int32 working set)
    bpp = 14
    vmem_cap = max(8, min(tile_rows, 11_000_000 // (bpp * wp) // 8 * 8))
    h8 = _round_up(H, 8)
    if h8 <= vmem_cap:
        th = h8
    else:
        th = min(
            range(8, vmem_cap + 1, 8),
            key=lambda cand: (_round_up(h8, cand), -cand),
        )
    hp = _round_up(h8, th)
    # rows: top halo + H + bottom fill to hp + 8 (8-aligned DMA row blocks)
    halo = -(-2 * pv // 8) * 8
    p = jnp.pad(planes, ((0, 0), (pv, pv), (ph, ph)), mode="reflect")
    p = jnp.pad(p, ((0, 0), (0, hp + halo - H - 2 * pv), (0, wp - W - 2 * ph)), mode="edge")
    n_tiles = hp // th

    kernel = functools.partial(
        _conv_kernel,
        taps_v=taps_v,
        taps_h=taps_h,
        th=th,
        n_tiles=n_tiles,
        amount=amount,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, hp, wp), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, th + halo, wp), jnp.uint8),
            pltpu.VMEM((2, th, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(p)
    return out[:, :H, :W]


def gaussian_blur_pallas(
    planes: jnp.ndarray,
    ksize=5,
    sigma: float = 0.0,
    sigma_y: float = 0.0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``cv2.GaussianBlur`` as a double-buffered Pallas kernel.

    Bit-exact for ANY σ (and rectangular ksize): cv2's Q8 fixed-point taps
    (cumulative-quantized, ref/ops.py) feed the integer tile math."""
    from imageenhancement_mp_tpu.ref.ops import gaussian_axes

    kh, kw, sy, sx = gaussian_axes(ksize, sigma, sigma_y, True)
    tv = tuple(float(t) for t in gaussian_kernel_fixed(kh, sy))
    th = tuple(float(t) for t in gaussian_kernel_fixed(kw, sx))
    return _sep_conv_planes(planes, tv, th, None, interpret=interpret)


def unsharp_mask_pallas(
    planes: jnp.ndarray,
    amount: float = 1.0,
    ksize: int = 5,
    sigma: float = 0.0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused GaussianBlur + addWeighted epilogue in one VMEM residency
    (blur bit-exact for any σ via the Q8 fixed-point taps)."""
    taps = tuple(float(t) for t in gaussian_kernel_fixed(ksize, sigma))
    return _sep_conv_planes(planes, taps, taps, float(amount), interpret=interpret)
