"""Pallas TPU kernel: median filter via sorting networks (SURVEY.md §2 #9).

Same double-buffered row-stripe streaming skeleton as kernels/conv.py, with
the stencil replaced by a branch-free selection network over the k² window
taps (vectorized min/max on the VPU):

* 3×3 — Paeth's optimal 19-comparator median-of-9 network;
* 5×5 — forgetful-selection median-of-25 (≤14 live arrays; see
  kernels/networks.py for the construction and correctness argument).

Border = replicate (cv2.medianBlur semantics, pinned in SURVEY.md §8.2).
Integers only — exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imageenhancement_mp_tpu.kernels.common import LANES as _LANES
from imageenhancement_mp_tpu.kernels.common import round_up as _round_up
from imageenhancement_mp_tpu.kernels.common import shift_left as _shift_left
from imageenhancement_mp_tpu.kernels.networks import median9 as _median9
from imageenhancement_mp_tpu.kernels.networks import median25 as _median25

__all__ = ["median_blur_pallas"]






def _median_kernel(
    in_hbm, out_hbm, buf_in, buf_out, sem_in, sem_out, *, ksize, th, n_tiles, halo
):
    b = pl.program_id(0)

    def dma_in(slot, t):
        return pltpu.make_async_copy(
            in_hbm.at[b, pl.ds(t * th, th + halo), :], buf_in.at[slot], sem_in.at[slot]
        )

    def dma_out(slot, t):
        return pltpu.make_async_copy(
            buf_out.at[slot], out_hbm.at[b, pl.ds(t * th, th), :], sem_out.at[slot]
        )

    dma_in(0, 0).start()

    def body(t, _):
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < n_tiles)
        def _():
            dma_in(nxt, t + 1).start()

        dma_in(slot, t).wait()

        @pl.when(t >= 2)
        def _():
            dma_out(slot, t - 2).wait()

        x = buf_in[slot].astype(jnp.int32)  # u8/u16 -> i32 for VPU min/max
        # window taps: rows j (0..k-1), cols shifted left by j
        taps = [
            _shift_left(x[dy : dy + th, :], dx)
            for dy in range(ksize)
            for dx in range(ksize)
        ]
        med = _median9(taps) if ksize == 3 else _median25(taps)
        buf_out[slot] = med.astype(buf_out.dtype)
        dma_out(slot, t).start()

    jax.lax.fori_loop(0, n_tiles, body, None)

    @pl.when(n_tiles >= 2)
    def _():
        dma_out(jax.lax.rem(n_tiles - 2, 2), n_tiles - 2).wait()

    dma_out(jax.lax.rem(n_tiles - 1, 2), n_tiles - 1).wait()


def median_blur_pallas(
    planes: jnp.ndarray, ksize: int = 3, tile_rows: int = 256, interpret: bool | None = None
) -> jnp.ndarray:
    """``cv2.medianBlur`` on uint8/uint16/int16 planes — exact; border =
    replicate.  int16 needs no special casing: the window taps are widened
    to int32 in-kernel, where the min/max network is sign-correct."""
    if ksize not in (3, 5):
        raise ValueError("pallas median supports ksize in (3, 5)")
    if planes.dtype not in (jnp.uint8, jnp.uint16, jnp.int16):
        raise TypeError(f"pallas median supports uint8/uint16/int16, got {planes.dtype}")
    B, H, W = planes.shape
    pad = ksize // 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # DMA row slices must be aligned to the dtype's sublane packing:
    # 8 rows for u8 (measured), 16 for 2-byte types ((16,128) native tile)
    ra = 8 if planes.dtype == jnp.uint8 else 16
    wp = _round_up(W + 2 * pad, _LANES)
    # i32 working set: ~k^2 window taps + sorting temps, 4B each; bound th
    # so the live set stays well under the 16MB VMEM scoped limit
    bytes_per_row = (ksize * ksize + 10) * 4 * wp
    vmem_cap = max(ra, min(tile_rows, 6_000_000 // bytes_per_row // ra * ra))
    h8 = _round_up(H, ra)
    if h8 <= vmem_cap:
        th = h8
    else:
        th = min(range(ra, vmem_cap + 1, ra), key=lambda c: (_round_up(h8, c), -c))
    hp = _round_up(h8, th)
    halo = _round_up(2 * pad, ra)

    p = jnp.pad(planes, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    p = jnp.pad(p, ((0, 0), (0, hp + halo - H - 2 * pad), (0, wp - W - 2 * pad)), mode="edge")
    n_tiles = hp // th

    kernel = functools.partial(
        _median_kernel, ksize=ksize, th=th, n_tiles=n_tiles, halo=halo
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, hp, wp), planes.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, th + halo, wp), planes.dtype),
            pltpu.VMEM((2, th, wp), planes.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(p)
    return out[:, :H, :W]
