"""Exp 03 v2: fastest 5x5 separable conv + unsharp patterns, 4K x2 u8.

New structure: BlockSpec grid (auto-pipelined), halo rows passed as small
side arrays, in-kernel concat.  Edge fixups omitted (timing only).

Variants:
  A. i32 VPU conv (current compute pattern, new structure)
  B. packed-pair i32: two pixels per lane in 16-bit halves (Q4 taps)
  C. V-pass on MXU bf16 (banded matrix), H on VPU f32
  D. LUT prologue (2 gathers + select) + A
  E. LUT prologue + B     <- flagship pass-2 candidate
  F. current unsharp_mask_pallas for reference
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from imageenhancement_mp_tpu.profiling import time_op_chained

dev = jax.devices()[0]
print("device:", dev.device_kind, dev.platform, flush=True)

rng = np.random.default_rng(0)
B, H, W = 2, 2160, 3840  # W = 30*128 aligned
NPIX = B * H * W
x = rng.integers(0, 256, (B, H, W), dtype=np.uint8)
xd = jax.device_put(jnp.asarray(x))

TAPS = (1, 4, 6, 4, 1)  # Q4 per axis


def sh(v, j):
    """centered lane shift: out[:, c] = v[:, c - j] (roll right by j)."""
    if j == 0:
        return v
    return pltpu.roll(v, j if j > 0 else v.shape[-1] + j, axis=1)


def make_halos(xx, th):
    """top/bot halo arrays [B, n_tiles, 8, W] (reflect at image edges)."""
    n = H // th
    tops, bots = [], []
    for t in range(n):
        lo = t * th - 8
        if lo < 0:
            rows = jnp.concatenate([xx[:, 6:8][:, ::-1], xx[:, 0:6]], 1)  # junk ok
        else:
            rows = xx[:, lo:t * th]
        hi = t * th + th
        if hi + 8 > H:
            rows2 = jnp.concatenate([xx[:, hi:H], xx[:, H - 8:H]], 1)[:, :8]
        else:
            rows2 = xx[:, hi:hi + 8]
        tops.append(rows)
        bots.append(rows2)
    return (jnp.stack(tops, 1), jnp.stack(bots, 1))  # [B, n, 8, W]


def vconv_i32(v, th):
    t = TAPS
    a = t[2] * v[2:2 + th, :]
    a = a + t[0] * (v[0:th, :] + v[4:4 + th, :])
    a = a + t[1] * (v[1:1 + th, :] + v[3:3 + th, :])
    return a


def hconv(a):
    t = TAPS
    h = t[2] * a
    h = h + t[0] * (sh(a, 2) + sh(a, -2))
    h = h + t[1] * (sh(a, 1) + sh(a, -1))
    return h


def kern_a(x_ref, ht_ref, hb_ref, o_ref):
    th = x_ref.shape[1]
    v = jnp.concatenate(
        [ht_ref[0, 0, 6:8].astype(jnp.int32), x_ref[0].astype(jnp.int32),
         hb_ref[0, 0, 0:2].astype(jnp.int32)], axis=0)  # [th+4, W]
    a = vconv_i32(v, th)
    h = hconv(a)
    blur = jnp.clip((h + 128) >> 8, 0, 255)
    src = v[2:2 + th, :]
    res = jnp.clip(2 * src - blur, 0, 255)
    o_ref[...] = res.astype(jnp.uint8)[None]


def kern_b(x_ref, ht_ref, hb_ref, o_ref):
    th = x_ref.shape[1]
    K = th // 2
    v = jnp.concatenate(
        [ht_ref[0, 0, 6:8].astype(jnp.int32), x_ref[0].astype(jnp.int32),
         hb_ref[0, 0, 0:2].astype(jnp.int32)], axis=0)  # [th+4, W]
    # overlap-pack: rows [0:K+4] low half, rows [K:th+4] high half
    p = v[0:K + 4, :] + (v[K:th + 4, :] << 16)  # [K+4, W] packed
    a = vconv_i32(p, K)          # halves < 2^16 (<=4080)
    h = hconv(a)                 # halves <= 65280 < 2^16
    # unsharp packed: 2*src - blur + bias(256) per half stays in [1,1021]
    srcp = p[2:2 + K, :]
    blurp = ((h >> 8) + ((h >> 7) & 1)) if False else ((h + (128 << 16) + 128) >> 8)
    # NOTE (timing): (h+128)>>8 per half via adding 128 to both halves;
    # >>8 smears 8 bits of hi half into lo - mask it off:
    blurp = blurp & 0x00FF01FF  # keep 9 bits lo, 9 bits hi (approx; timing)
    resp = (srcp << 1) - blurp + 0x01000100
    lo = jnp.clip((resp & 0xFFFF) - 256, 0, 255)
    hi = jnp.clip((resp >> 16) - 256, 0, 255)
    o_ref[0, 0:K, :] = lo.astype(jnp.uint8)
    o_ref[0, K:th, :] = hi.astype(jnp.uint8)


def kern_c(x_ref, ht_ref, hb_ref, vm_ref, o_ref):
    th = x_ref.shape[1]
    v = jnp.concatenate(
        [ht_ref[0, 0, 6:8].astype(jnp.int32), x_ref[0].astype(jnp.int32),
         hb_ref[0, 0, 0:2].astype(jnp.int32)], axis=0).astype(jnp.bfloat16)
    a = jax.lax.dot_general(vm_ref[...], v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [th, W]
    t = [float(ti) for ti in TAPS]
    h = t[2] * a
    h = h + t[0] * (sh(a, 2) + sh(a, -2))
    h = h + t[1] * (sh(a, 1) + sh(a, -1))
    blur = jnp.floor((h + 128.0) * (1.0 / 256.0))
    src = v[2:2 + th, :].astype(jnp.float32)
    res = jnp.clip(2.0 * src - blur, 0.0, 255.0)
    o_ref[...] = res.astype(jnp.int32).astype(jnp.uint8)[None]


def lut_apply(v0, lut2):
    """per-128-lane-block vreg gather (gather dim must stay in one vreg)."""
    nb = v0.shape[1] // 128
    cols = []
    for b in range(nb):
        vb = v0[:, b * 128:(b + 1) * 128]
        low = vb & 127
        g0 = jnp.take_along_axis(jnp.broadcast_to(lut2[0:1], vb.shape), low,
                                 axis=1, mode="promise_in_bounds")
        g1 = jnp.take_along_axis(jnp.broadcast_to(lut2[1:2], vb.shape), low,
                                 axis=1, mode="promise_in_bounds")
        cols.append(jnp.where(vb >= 128, g1, g0))
    return jnp.concatenate(cols, axis=1)


def kern_d(x_ref, ht_ref, hb_ref, lut_ref, o_ref):
    th = x_ref.shape[1]
    v0 = jnp.concatenate(
        [ht_ref[0, 0, 6:8].astype(jnp.int32), x_ref[0].astype(jnp.int32),
         hb_ref[0, 0, 0:2].astype(jnp.int32)], axis=0)
    v = lut_apply(v0, lut_ref[0])
    a = vconv_i32(v, th)
    h = hconv(a)
    blur = jnp.clip((h + 128) >> 8, 0, 255)
    src = v[2:2 + th, :]
    res = jnp.clip(2 * src - blur, 0, 255)
    o_ref[...] = res.astype(jnp.uint8)[None]


def kern_e(x_ref, ht_ref, hb_ref, lut_ref, o_ref):
    th = x_ref.shape[1]
    K = th // 2
    v0 = jnp.concatenate(
        [ht_ref[0, 0, 6:8].astype(jnp.int32), x_ref[0].astype(jnp.int32),
         hb_ref[0, 0, 0:2].astype(jnp.int32)], axis=0)
    v = lut_apply(v0, lut_ref[0])
    p = v[0:K + 4, :] + (v[K:th + 4, :] << 16)
    a = vconv_i32(p, K)
    h = hconv(a)
    srcp = p[2:2 + K, :]
    blurp = ((h + (128 << 16) + 128) >> 8) & 0x00FF01FF
    resp = (srcp << 1) - blurp + 0x01000100
    lo = jnp.clip((resp & 0xFFFF) - 256, 0, 255)
    hi = jnp.clip((resp >> 16) - 256, 0, 255)
    o_ref[0, 0:K, :] = lo.astype(jnp.uint8)
    o_ref[0, K:th, :] = hi.astype(jnp.uint8)


def run(kern, name, th, extras=()):
    n = H // th
    ht, hb = make_halos(xd, th)
    in_specs = [
        pl.BlockSpec((1, th, W), lambda b, t: (b, t, 0)),
        pl.BlockSpec((1, 1, 8, W), lambda b, t: (b, t, 0, 0)),
        pl.BlockSpec((1, 1, 8, W), lambda b, t: (b, t, 0, 0)),
    ]
    args = [ht, hb]
    for e in extras:
        in_specs.append(pl.BlockSpec(e.shape, lambda b, t, _s=e.shape: tuple(0 for _ in _s)))
        args.append(e)
    f = pl.pallas_call(
        kern,
        grid=(B, n),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.uint8),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, W), lambda b, t: (b, t, 0)),
    )
    g = jax.jit(lambda a: f(a, *args))
    try:
        secs = time_op_chained(g, xd, target_secs=0.4, repeats=2)
    except Exception as ex:
        print(f"{name:40s} th={th:4d} FAILED: {str(ex)[:140]}", flush=True)
        return
    print(f"{name:40s} th={th:4d} {secs*1e6:9.1f} us  {NPIX/secs/1e9:8.1f} GPix/s",
          flush=True)


def vmat(th):
    m = np.zeros((th, th + 4), np.float32)
    for j, t in enumerate(TAPS):
        for r in range(th):
            m[r, r + j] = float(t)
    return jnp.asarray(m, jnp.bfloat16)


lut2 = jnp.asarray(rng.integers(0, 256, (1, 2, 128)), jnp.int32)

run(kern_a, "A: i32 VPU", 216)
run(kern_a, "A: i32 VPU", 432)
run(kern_b, "B: packed-pair i32", 216)
run(kern_b, "B: packed-pair i32", 432)
run(kern_c, "C: V-MXU bf16 + H-VPU f32", 216, extras=(vmat(216),))
run(kern_d, "D: LUT + i32 VPU", 216, extras=(lut2,))
run(kern_e, "E: LUT + packed-pair", 216, extras=(lut2,))
run(kern_e, "E: LUT + packed-pair", 432, extras=(lut2,))

from imageenhancement_mp_tpu.kernels.conv import unsharp_mask_pallas
g = jax.jit(lambda a: unsharp_mask_pallas(a, 1.0, 5))
secs = time_op_chained(g, xd, target_secs=0.4, repeats=2)
print(f"{'F: current unsharp_mask_pallas':40s}         {secs*1e6:9.1f} us  "
      f"{NPIX/secs/1e9:8.1f} GPix/s", flush=True)
