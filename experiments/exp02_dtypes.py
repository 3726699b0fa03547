"""Exp 02: does narrow-dtype elementwise work run wider than i32 on the VPU?

Probes, chain-clocked on chip:
  A. k adds on i32 / i8 / u8 / bf16 / f32 arrays (same element count)
  B. compare-to-broadcast-iota producing one-hot rows: i32 vs i8 vs bf16 out
  C. MXU dot lowering for bf16 one-hot contraction [16,pt]x[16,pt] and i8
  D. cast costs u8->i32, u8->bf16, i32->bf16
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
print("device:", dev.device_kind, dev.platform)

rng = np.random.default_rng(0)
B = 8
rpad, LANES = 16384, 128
NPIX = B * rpad * LANES
flat = rng.integers(0, 256, (B, rpad, LANES), dtype=np.uint8)
xd = jax.device_put(jnp.asarray(flat), dev)

S = 2048


def run(kern, name, out_dtype=jnp.uint8, s=S, **kw):
    grid = (B, rpad // s)
    f = pl.pallas_call(
        functools.partial(kern, **kw) if kw else kern,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, rpad, LANES), out_dtype),
        in_specs=[pl.BlockSpec((1, s, LANES), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, s, LANES), lambda b, t: (b, t, 0)),
    )
    g = jax.jit(lambda a: f(a))
    try:
        secs = time_op_chained(g, xd, target_secs=0.4, repeats=2)
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:100]}")
        return None
    gpix = NPIX / secs / 1e9
    print(f"{name:44s} {secs*1e6:9.1f} us  {gpix:8.1f} GPix/s")
    return secs


def adds_dtype(i_ref, o_ref, *, k, dt):
    v = i_ref[...].astype(dt)
    acc = v
    for _ in range(k):
        acc = acc + v
    o_ref[...] = acc.astype(jnp.int32).astype(jnp.uint8) if dt != jnp.uint8 else acc


print("\n-- A: 32 adds by dtype --")
base = {}
for dt, nm in ((jnp.int32, "i32"), (jnp.int8, "i8"), (jnp.uint8, "u8"),
               (jnp.bfloat16, "bf16"), (jnp.float32, "f32"), (jnp.int16, "i16")):
    base[nm] = run(adds_dtype, f"adds k=32 {nm}", k=32, dt=dt)

print("\n-- B: one-hot build cost (16-row compare over 4-bit field) --")
# emulate: x [s,128] -> oh [16, s*128/16?]. To keep output size equal, write
# back a reduction. We time JUST the one-hot build + fold.


def onehot_kernel(i_ref, o_ref, *, oh_dt, reps):
    v = i_ref[...].astype(jnp.int32).reshape(1, -1)  # [1, s*128]
    pt = v.shape[1]
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, pt), 0)
    acc = None
    for r in range(reps):
        oh = ((v >> 4) == bins).astype(oh_dt)  # [16, pt]
        a = jnp.sum(oh.astype(jnp.float32) if oh_dt == jnp.bfloat16 else oh.astype(jnp.int32), axis=0).reshape(i_ref.shape[1], LANES)
        acc = a if acc is None else acc + a
    o_ref[...] = acc.astype(jnp.uint8)[None]


for oh_dt, nm in ((jnp.int32, "i32"), (jnp.int8, "i8"), (jnp.bfloat16, "bf16"),
                  (jnp.float32, "f32")):
    run(onehot_kernel, f"onehot16 build+fold x2 {nm}", s=512, oh_dt=oh_dt, reps=2)

print("\n-- C: hist dot [16,pt]x[16,pt] by one-hot dtype --")


def hist_kernel(i_ref, o_ref, *, oh_dt, acc_dt):
    v = i_ref[...].astype(jnp.int32).reshape(1, -1)
    pt = v.shape[1]
    bins = jax.lax.broadcasted_iota(jnp.int32, (16, pt), 0)
    oh_hi = ((v >> 4) == bins).astype(oh_dt)
    oh_lo = ((v & 15) == bins).astype(oh_dt)
    h = jax.lax.dot_general(oh_hi, oh_lo, (((1,), (1,)), ((), ())),
                            preferred_element_type=acc_dt)
    # write something tiny but data-dependent
    o_ref[0, 0:16, 0:16] = h.astype(jnp.uint8) if h.dtype != jnp.uint8 else h


def run_hist(name, oh_dt, acc_dt, s=512):
    grid = (B, rpad // s)
    f = pl.pallas_call(
        functools.partial(hist_kernel, oh_dt=oh_dt, acc_dt=acc_dt),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, rpad, LANES), jnp.uint8),
        in_specs=[pl.BlockSpec((1, s, LANES), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, s, LANES), lambda b, t: (b, t, 0)),
    )
    g = jax.jit(lambda a: f(a))
    try:
        secs = time_op_chained(g, xd, target_secs=0.4, repeats=2)
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:120]}")
        return
    gpix = NPIX / secs / 1e9
    print(f"{name:44s} {secs*1e6:9.1f} us  {gpix:8.1f} GPix/s")


run_hist("hist dot bf16->f32", jnp.bfloat16, jnp.float32)
run_hist("hist dot i8->i32", jnp.int8, jnp.int32)
run_hist("hist dot f32->f32", jnp.float32, jnp.float32)

print("\n-- D: cast chain costs --")


def cast_kernel(i_ref, o_ref, *, path):
    v = i_ref[...]
    if path == "u8->i32->u8":
        o_ref[...] = v.astype(jnp.int32).astype(jnp.uint8)
    elif path == "u8->bf16->i32->u8":
        o_ref[...] = v.astype(jnp.bfloat16).astype(jnp.int32).astype(jnp.uint8)
    elif path == "u8->f32->i32->u8":
        o_ref[...] = v.astype(jnp.float32).astype(jnp.int32).astype(jnp.uint8)


for p in ("u8->i32->u8", "u8->bf16->i32->u8", "u8->f32->i32->u8"):
    run(cast_kernel, f"cast {p}", path=p)
