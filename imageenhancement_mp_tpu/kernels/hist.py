"""Pallas TPU kernel: exact 256-bin histogram at HBM speed-of-light.

Round 4 finding (docs/DESIGN.md §9c): the XLA nibble-matmul histogram
(ops/histogram.py) MATERIALIZES its [P, 16] one-hots in HBM — and pads the
16-wide minor dim to 128 lanes — so a 1080p×8 batch really costs ~175 ms
on the chip (chain-clock measured), ~70× the roofline and SLOWER than the
single-thread OpenCV baseline.  Every earlier fast reading of that path was
the tunnel's early-ack lie.

This kernel keeps the same exact formulation — ``hist[hi·16+lo] =
Σ onehot(hi)ᵀ·onehot(lo)`` — but builds the one-hots PER STRIPE in VMEM
and contracts them on the MXU immediately, so nothing wider than the
input stripe ever touches HBM:

    grid = (B, n_tiles); block = one stripe of 2^17 pixels (flattened plane)
    a[16, Pt] = (iota == hi)        # VMEM-resident, i8-sized compares
    h[16,16] += a @ bᵀ              # one MXU dot per stripe, f32 accum
    out[b] revisited across t       # [1, 256] accumulator stays in VMEM

HBM traffic = exactly one read of the image (1 B/px).  The f32 MXU
accumulation is exact: per-stripe counts ≤ 2^17 < 2^24, and the cross-
stripe accumulation happens in int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageenhancement_mp_tpu.kernels.common import round_up as _round_up

__all__ = [
    "hist256_pallas",
    "apply_lut256_pallas",
    "apply_luts_multi_pallas",
    "equalize_hist_pallas",
]

_LANES = 128
_S = 1024  # stripe sublane rows: 1024·128 px → [16, 2^17] f32 one-hots ≤ 8 MB


def _hist_kernel(x_ref, out_ref, *, n_valid: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    s, lanes = x_ref.shape[1], x_ref.shape[2]
    pt = s * lanes
    # Mosaic lowers [S,128]→[1, S·128] collapses and 2D lane-contracting
    # dots; it rejects multi-dim contractions (probed r04) — hence flatten
    x = x_ref[...].astype(jnp.int32).reshape(1, pt)
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, pt), 0)
    # mask the flat-pixel padding OUT OF the hi one-hot (a zero column of
    # ``a`` zeroes the product for every lo bin, so one side suffices)
    pix = t * pt + jax.lax.broadcasted_iota(jnp.int32, (16, pt), 1)
    oh_hi = jnp.where((bins == (x >> 4)) & (pix < n_valid), 1.0, 0.0)
    oh_lo = jnp.where(bins == (x & 15), 1.0, 0.0)
    h = jax.lax.dot_general(
        oh_hi, oh_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [16, 16]; per-stripe counts ≤ Pt < 2^24 → exact in f32
    # whole-[B,16,16] output block (sublane-1 blocks and [16,16]→[1,256]
    # collapses don't lower); plane b's accumulator is dynamically indexed
    # and the 256-bin flatten happens outside the kernel (free row-major)
    cur = out_ref[pl.ds(b, 1)]
    out_ref[pl.ds(b, 1)] = cur + h[None].astype(jnp.int32)


def hist256_pallas(planes: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """Exact per-plane 256-bin histogram: ``[B, H, W] u8 → [B, 256] i32``.

    Also accepts ``[B, P]`` pre-flattened pixel rows (the CLAHE tile path).
    """
    if planes.dtype != jnp.uint8:
        raise TypeError(f"hist256_pallas expects uint8, got {planes.dtype}")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B = planes.shape[0]
    n = 1
    for d in planes.shape[1:]:
        n *= int(d)
    # [B, rows, 128] view: row-major, so the reshape is free in HBM
    rows = _round_up(n, _LANES) // _LANES
    s = min(_S, _round_up(rows, 8))
    rpad = _round_up(rows, s)
    flat = planes.reshape(B, n)
    if rpad * _LANES != n:
        flat = jnp.pad(flat, ((0, 0), (0, rpad * _LANES - n)))
    x3 = flat.reshape(B, rpad, _LANES)
    n_tiles = rpad // s

    kernel = functools.partial(_hist_kernel, n_valid=n)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        out_shape=jax.ShapeDtypeStruct((B, 16, 16), jnp.int32),
        in_specs=[pl.BlockSpec((1, s, _LANES), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((B, 16, 16), lambda b, t: (0, 0, 0)),
        interpret=interpret,
    )(x3)
    return out.reshape(B, 256)  # hist[v] = H[v>>4, v&15]: row-major ✓


def _lut_kernel(x_ref, lut_ref, out_ref, *, out_int: bool):
    b = pl.program_id(0)
    s, lanes = x_ref.shape[1], x_ref.shape[2]
    pt = s * lanes
    x = x_ref[...].astype(jnp.int32).reshape(1, pt)
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, pt), 0)
    oh_hi = jnp.where(bins == (x >> 4), 1.0, 0.0)
    oh_lo = jnp.where(bins == (x & 15), 1.0, 0.0)
    lut2d = lut_ref[pl.ds(b, 1)][0]  # [16, 16]
    if jnp.issubdtype(lut2d.dtype, jnp.integer):
        lut2d = lut2d.astype(jnp.int32)  # Mosaic lacks direct u8→f32
    lut2d = lut2d.astype(jnp.float32)
    # m[h, px] = lut2d[h, lo(px)] — the lo-gather as one MXU dot; the
    # hi-gather is the masked row-sum.  Every per-pixel sum has exactly
    # ONE nonzero term, so arbitrary f32 LUT values come through EXACT.
    # HIGHEST precision: v5e's default f32 matmul runs bf16 passes, which
    # would truncate u16/f32 LUT values (>8 mantissa bits); the 6-pass
    # HIGHEST algorithm is exact f32 and the matrix is only 16×16
    m = jax.lax.dot_general(
        lut2d, oh_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.sum(oh_hi * m, axis=0, keepdims=True).reshape(s, lanes)
    if out_int:
        out = out.astype(jnp.int32)
    out_ref[...] = out.astype(out_ref.dtype)[None]


def apply_lut256_pallas(
    planes: jnp.ndarray, luts: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """``cv2.LUT`` for u8 planes as a Pallas kernel — EXACT for any LUT
    dtype (u8/u16/i32/f32): the gather is reformulated as the bilinear
    form ``out = onehot(hi)ᵀ · LUT₁₆ₓ₁₆ · onehot(lo)`` whose per-pixel
    sums each have a single nonzero term.

    XLA's native 256-entry gather lowers to a per-element loop on TPU
    (~173 ms for a 1080p×8 batch — docs/DESIGN.md §9c); this kernel reads
    and writes each pixel once (chain-clock measured, kernels tier).

    ``planes``: ``[B, ...]`` u8.  ``luts``: ``[256]`` shared or
    ``[B, 256]`` per plane.  Returns ``planes.shape`` in ``luts.dtype``.
    """
    if planes.dtype != jnp.uint8:
        raise TypeError(f"apply_lut256_pallas expects uint8, got {planes.dtype}")
    if luts.shape[-1] != 256:
        raise ValueError(f"expected 256-entry LUTs, got {luts.shape}")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B = planes.shape[0]
    if luts.ndim == 1:
        luts = jnp.broadcast_to(luts, (B, 256))
    lut3 = luts.reshape(B, 16, 16)
    n = 1
    for d in planes.shape[1:]:
        n *= int(d)
    rows = _round_up(n, _LANES) // _LANES
    s = min(_S, _round_up(rows, 8))
    rpad = _round_up(rows, s)
    flat = planes.reshape(B, n)
    if rpad * _LANES != n:
        flat = jnp.pad(flat, ((0, 0), (0, rpad * _LANES - n)))
    x3 = flat.reshape(B, rpad, _LANES)

    out_int = jnp.issubdtype(luts.dtype, jnp.integer)
    out = pl.pallas_call(
        functools.partial(_lut_kernel, out_int=out_int),
        grid=(B, rpad // s),
        out_shape=jax.ShapeDtypeStruct((B, rpad, _LANES), luts.dtype),
        in_specs=[
            pl.BlockSpec((1, s, _LANES), lambda b, t: (b, t, 0)),
            pl.BlockSpec((B, 16, 16), lambda b, t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, _LANES), lambda b, t: (b, t, 0)),
        interpret=interpret,
    )(x3, lut3)
    return out.reshape(B, rpad * _LANES)[:, :n].reshape(planes.shape)


def _lut_multi_kernel(x_ref, lut_ref, *out_refs, out_int: bool):
    b = pl.program_id(0)
    s, lanes = x_ref.shape[1], x_ref.shape[2]
    pt = s * lanes
    x = x_ref[...].astype(jnp.int32).reshape(1, pt)
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, pt), 0)
    oh_hi = jnp.where(bins == (x >> 4), 1.0, 0.0)
    oh_lo = jnp.where(bins == (x & 15), 1.0, 0.0)
    luts = lut_ref[pl.ds(b, 1)][0]  # [K·16, 16]
    if jnp.issubdtype(luts.dtype, jnp.integer):
        luts = luts.astype(jnp.int32)
    luts = luts.astype(jnp.float32)
    for k, out_ref in enumerate(out_refs):
        m = jax.lax.dot_general(
            luts[16 * k : 16 * (k + 1)], oh_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out = jnp.sum(oh_hi * m, axis=0, keepdims=True).reshape(s, lanes)
        if out_int:
            out = out.astype(jnp.int32)
        out_ref[...] = out.astype(out_ref.dtype)[None]


def apply_luts_multi_pallas(
    planes: jnp.ndarray, luts: jnp.ndarray, interpret: bool | None = None
) -> tuple[jnp.ndarray, ...]:
    """K LUTs applied to the same u8 planes in ONE pass: the per-pixel
    one-hots are built once and dotted with each of the K tables (the
    CLAHE stage-C workhorse: its 9 neighbor-tile gathers share one image
    read instead of nine).

    ``planes``: ``[B, ...]`` u8.  ``luts``: ``[B, K, 256]``.
    Returns a K-tuple of ``planes.shape`` arrays in ``luts.dtype``.
    """
    if planes.dtype != jnp.uint8:
        raise TypeError(f"apply_luts_multi_pallas expects uint8, got {planes.dtype}")
    B, K = luts.shape[0], luts.shape[1]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    lut3 = luts.reshape(B, K * 16, 16)
    n = 1
    for d in planes.shape[1:]:
        n *= int(d)
    rows = _round_up(n, _LANES) // _LANES
    # smaller stripes than the single-LUT kernel: K m-buffers of [16, pt]
    s = min(256, _round_up(rows, 8))
    rpad = _round_up(rows, s)
    flat = planes.reshape(B, n)
    if rpad * _LANES != n:
        flat = jnp.pad(flat, ((0, 0), (0, rpad * _LANES - n)))
    x3 = flat.reshape(B, rpad, _LANES)

    out_int = jnp.issubdtype(luts.dtype, jnp.integer)
    blk = pl.BlockSpec((1, s, _LANES), lambda b, t: (b, t, 0))
    outs = pl.pallas_call(
        functools.partial(_lut_multi_kernel, out_int=out_int),
        grid=(B, rpad // s),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, rpad, _LANES), luts.dtype) for _ in range(K)
        ),
        in_specs=[
            blk,
            pl.BlockSpec((B, K * 16, 16), lambda b, t: (0, 0, 0)),
        ],
        out_specs=tuple(blk for _ in range(K)),
        interpret=interpret,
    )(x3, lut3)
    return tuple(
        o.reshape(B, rpad * _LANES)[:, :n].reshape(planes.shape) for o in outs
    )


def _equalize_kernel(x_ref, out_ref, hist_ref, lut_ref, *, n_valid: int,
                     total: int):
    b = pl.program_id(0)
    ph = pl.program_id(1)
    t = pl.program_id(2)
    s, lanes = x_ref.shape[1], x_ref.shape[2]
    pt = s * lanes
    x = x_ref[...].astype(jnp.int32).reshape(1, pt)
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, pt), 0)
    oh_lo = jnp.where(bins == (x & 15), 1.0, 0.0)

    @pl.when((ph == 0) & (t == 0))
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref)

    @pl.when(ph == 0)
    def _():
        pix = t * pt + jax.lax.broadcasted_iota(jnp.int32, (16, pt), 1)
        oh_hi_m = jnp.where((bins == (x >> 4)) & (pix < n_valid), 1.0, 0.0)
        h = jax.lax.dot_general(
            oh_hi_m, oh_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hist_ref[...] += h
        out_ref[...] = x_ref[...]  # placeholder; phase 1 rewrites the block

    @pl.when((ph == 1) & (t == 0))
    def _():
        # cv2 equalize LUT, entirely in VMEM (ops/histogram.equalize_lut's
        # law): cdf via triangular dots, i0 = #(cdf == 0), f32 scale
        # 255/(N − hist[i0]), one half-even round per entry
        hist = hist_ref[...]  # [16,16] f32 (counts ≤ 2^24: exact)
        li = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
        lj = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
        upper = jnp.where(li <= lj, 1.0, 0.0)   # U[l', l]: l' ≤ l
        strict = jnp.where(li > lj, 1.0, 0.0)   # L[h, h']: h' < h
        rowcum = jax.lax.dot_general(
            hist, upper, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [16,16] prefix along lanes
        rowsum = rowcum[:, 15:16]  # [16,1]
        rowpref = jax.lax.dot_general(
            strict, rowsum, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [16,1] exclusive prefix of row sums
        cdf = rowcum + rowpref  # [16,16] = cdf over flat v = h·16+l
        fi = (li * 16 + lj).astype(jnp.float32)
        i0n = jnp.sum(jnp.where(cdf == 0.0, 1.0, 0.0))  # = i0 (first nonzero)
        h0 = jnp.sum(jnp.where(fi == i0n, hist, 0.0))   # hist[i0] = cdf[i0]
        denom = jnp.maximum(jnp.float32(total) - h0, 1.0)
        scale = jnp.float32(255.0) / denom
        lut = jnp.clip(jnp.round((cdf - h0) * scale), 0.0, 255.0)
        identity = fi
        lut_ref[...] = jnp.where(h0 == jnp.float32(total), identity, lut)

    @pl.when(ph == 1)
    def _():
        m = jax.lax.dot_general(
            lut_ref[...], oh_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        oh_hi = jnp.where(bins == (x >> 4), 1.0, 0.0)
        out = jnp.sum(oh_hi * m, axis=0, keepdims=True).reshape(s, lanes)
        out_ref[...] = out.astype(jnp.int32).astype(jnp.uint8)[None]


def equalize_hist_pallas(planes: jnp.ndarray,
                         interpret: bool | None = None) -> jnp.ndarray:
    """``cv2.equalizeHist`` as ONE Pallas kernel per batch: histogram
    accumulation, the cv2 LUT build (triangular-dot cumsums + the f32
    lutScale law), and the bilinear-form LUT apply share a single
    pallas_call — two image reads, one write, no XLA round trips (the
    config-1 small-image dispatch fix, VERDICT r03 item 7)."""
    if planes.dtype != jnp.uint8:
        raise TypeError(f"equalize_hist_pallas expects uint8, got {planes.dtype}")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B, H, W = planes.shape[0], planes.shape[-2], planes.shape[-1]
    n = H * W
    rows = _round_up(n, _LANES) // _LANES
    s = min(_S, _round_up(rows, 8))
    rpad = _round_up(rows, s)
    flat = planes.reshape(B, n)
    if rpad * _LANES != n:
        flat = jnp.pad(flat, ((0, 0), (0, rpad * _LANES - n)))
    x3 = flat.reshape(B, rpad, _LANES)
    blk = pl.BlockSpec((1, s, _LANES), lambda b, ph, t: (b, t, 0))
    out = pl.pallas_call(
        functools.partial(_equalize_kernel, n_valid=n, total=n),
        grid=(B, 2, rpad // s),
        out_shape=jax.ShapeDtypeStruct((B, rpad, _LANES), jnp.uint8),
        in_specs=[blk],
        out_specs=blk,
        scratch_shapes=[
            pltpu.VMEM((16, 16), jnp.float32),
            pltpu.VMEM((16, 16), jnp.float32),
        ],
        interpret=interpret,
    )(x3)
    return out.reshape(B, rpad * _LANES)[:, :n].reshape(planes.shape)
