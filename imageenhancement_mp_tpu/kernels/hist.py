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
    "take_table_pallas",
    "gather_width_supported",
    "apply_lut256_pallas",
    "apply_luts_multi_pallas",
    "equalize_hist_pallas",
]

_LANES = 128
_S = 1024  # stripe sublane rows: 1024·128 px → [16, 2^17] f32 one-hots ≤ 8 MB

# ---------------------------------------------------------------------------
# tpu.dynamic_gather capability probe (round 4): Mosaic lowers
# jnp.take_along_axis on 2D VMEM operands to the hardware per-lane
# shuffle — orders of magnitude cheaper than the one-hot bilinear form
# when available.  Probed lazily ON DEVICE once per process; interpret
# mode always supports it (pure NumPy semantics).
# ---------------------------------------------------------------------------
_DG_OK: bool | None = None


def _dg_supported() -> bool:
    global _DG_OK
    if _DG_OK is None:
        if jax.devices()[0].platform != "tpu":
            _DG_OK = True  # interpret mode
        else:
            try:
                def k(t_ref, i_ref, o_ref):
                    o_ref[...] = jnp.take_along_axis(
                        t_ref[...], i_ref[...], axis=1,
                        mode="promise_in_bounds")

                t = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
                ix = (t * 7 + 3) % 256
                r = pl.pallas_call(
                    k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
                )(t, ix)
                import numpy as _np

                tn = _np.asarray(t)
                _DG_OK = bool(
                    _np.array_equal(
                        _np.asarray(r),
                        tn[_np.arange(8)[:, None], _np.asarray(ix)],
                    )
                )
            except Exception:
                _DG_OK = False
    return _DG_OK


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


def _lut_dg_kernel(x_ref, lut_ref, out_ref, *, out_int: bool):
    s = x_ref.shape[1]
    v = x_ref[...][0].astype(jnp.int32)  # [s, 256] pixel block
    lut = lut_ref[...][0]  # [1, 256]
    if jnp.issubdtype(lut.dtype, jnp.integer) and lut.dtype != jnp.int32:
        lut = lut.astype(jnp.int32)
    lutb = jnp.broadcast_to(lut, v.shape)
    g = jnp.take_along_axis(lutb, v, axis=1, mode="promise_in_bounds")
    out_ref[...] = g.astype(out_ref.dtype)[None]


def _apply_lut_dg(planes, luts, interpret):
    """LUT apply on the hardware shuffle: pixels blocked [s, 256] lanes,
    one ``tpu.dynamic_gather`` per block (~2 ops/px vs the bilinear
    form's ~100)."""
    B = planes.shape[0]
    n = 1
    for d in planes.shape[1:]:
        n *= int(d)
    lanes = 256
    rows = _round_up(n, lanes) // lanes
    s = min(512, _round_up(rows, 8))
    rpad = _round_up(rows, s)
    flat = planes.reshape(B, n)
    if rpad * lanes != n:
        flat = jnp.pad(flat, ((0, 0), (0, rpad * lanes - n)))
    x3 = flat.reshape(B, rpad, lanes)
    out_int = jnp.issubdtype(luts.dtype, jnp.integer)
    out = pl.pallas_call(
        functools.partial(_lut_dg_kernel, out_int=out_int),
        grid=(B, rpad // s),
        out_shape=jax.ShapeDtypeStruct((B, rpad, lanes), luts.dtype),
        in_specs=[
            pl.BlockSpec((1, s, lanes), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, 1, 256), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, lanes), lambda b, t: (b, t, 0)),
        interpret=interpret,
    )(x3, luts.reshape(B, 1, 256))
    return out.reshape(B, rpad * lanes)[:, :n].reshape(planes.shape)


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
    if _dg_supported():
        return _apply_lut_dg(planes, luts, interpret)
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


def _take_kernel(i_ref, tab_ref, out_ref):
    idx = i_ref[...][0]  # [s, L] i32
    tab = tab_ref[...][0]  # [1, L]
    if jnp.issubdtype(tab.dtype, jnp.integer) and tab.dtype != jnp.int32:
        tab = tab.astype(jnp.int32)
    tb = jnp.broadcast_to(tab, idx.shape)
    g = jnp.take_along_axis(tb, idx, axis=1, mode="promise_in_bounds")
    out_ref[...] = g.astype(out_ref.dtype)[None]


def take_table_pallas(idx: jnp.ndarray, table: jnp.ndarray,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Generic per-pixel table gather on the hardware shuffle:
    ``out[...] = table[..., idx[...]]``.

    ``idx``: ``[B, ...]`` int32 (values in ``[0, L)``); ``table``:
    ``[L]`` shared or ``[B, L]`` per plane, ``L`` a multiple of 128.
    XLA lowers this gather to a per-element scalar loop on TPU
    (docs/DESIGN.md §9c); ``tpu.dynamic_gather`` does it at VPU speed.
    The maximum supported ``L`` is hardware/Mosaic-dependent — callers
    gate on :func:`gather_width_supported`.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    B = idx.shape[0]
    if table.ndim == 1:
        table = jnp.broadcast_to(table, (B,) + table.shape)
    L = table.shape[-1]
    if L % _LANES:
        raise ValueError(f"table width {L} must be a multiple of {_LANES}")
    n = 1
    for d in idx.shape[1:]:
        n *= int(d)
    rows = _round_up(n, L) // L
    smax = max(8, (1 << 19) // L // 8 * 8)  # ≤ 0.5M-elem blocks
    s = min(smax, _round_up(rows, 8))
    rpad = _round_up(rows, s)
    flat = idx.reshape(B, n).astype(jnp.int32)
    if rpad * L != n:
        flat = jnp.pad(flat, ((0, 0), (0, rpad * L - n)))
    x3 = flat.reshape(B, rpad, L)
    out = pl.pallas_call(
        _take_kernel,
        grid=(B, rpad // s),
        out_shape=jax.ShapeDtypeStruct((B, rpad, L), table.dtype),
        in_specs=[
            pl.BlockSpec((1, s, L), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, 1, L), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, L), lambda b, t: (b, t, 0)),
        interpret=interpret,
    )(x3, table.reshape(B, 1, L))
    return out.reshape(B, rpad * L)[:, :n].reshape(idx.shape)


_DG_WIDTHS: dict[int, bool] = {}


def gather_width_supported(L: int) -> bool:
    """Probe (once per width per process) whether the dynamic-gather
    kernel compiles AND returns correct values for ``L``-wide tables."""
    if jax.devices()[0].platform != "tpu":
        return True
    ok = _DG_WIDTHS.get(L)
    if ok is None:
        try:
            import numpy as _np

            tab = jnp.arange(L, dtype=jnp.int32) * 3 + 1
            idx = (jnp.arange(8 * L, dtype=jnp.int32).reshape(1, 8, L) * 7 + 5) % L
            got = take_table_pallas(idx.reshape(1, -1), tab)
            want = (_np.asarray(idx).reshape(-1) * 1) * 0 + _np.asarray(tab)[
                _np.asarray(idx).reshape(-1)]
            ok = bool(_np.array_equal(_np.asarray(got).reshape(-1), want))
        except Exception:
            ok = False
        _DG_WIDTHS[L] = ok
    return ok


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
