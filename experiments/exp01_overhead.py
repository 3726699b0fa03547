"""Exp 01: where does the time go in the small-block Pallas kernels?

Measures, under the chain clock, on the real chip:
  A. passthrough copy kernel (u8) at several block shapes/grid sizes
     -> per-grid-step overhead + DMA efficiency
  B. k sequential VPU adds per block at a fixed block size
     -> effective VPU throughput (ops/s)
  C. k sequential vreg gathers per block
     -> effective dynamic_gather throughput
All on a 1080p x 8 u8 batch (16.6 MPix, 16.6 MB).
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
B, H, W = 8, 1080, 1920
x = rng.integers(0, 256, (B, H, W), dtype=np.uint8)
NPIX = x.size
# flat layout [B, rows, 128] like the LUT kernels
n = H * W
rows = n // 128  # 16200
# pad rows to multiples of 8
rpad = (rows + 511) // 512 * 512  # 16384
flat = np.zeros((B, rpad, 128), np.uint8)
flat.reshape(B, -1)[:, :n] = x.reshape(B, n)
xd = jax.device_put(jnp.asarray(flat), dev)


def copy_kernel(i_ref, o_ref):
    o_ref[...] = i_ref[...]


def adds_kernel(i_ref, o_ref, *, k):
    v = i_ref[...].astype(jnp.int32)
    acc = v
    for _ in range(k):
        acc = acc + v
    o_ref[...] = (acc & 255).astype(jnp.uint8)


def gather_kernel(i_ref, o_ref, *, k):
    v = i_ref[...][0].astype(jnp.int32)  # [s,128]
    idx = v & 127
    g = v
    for _ in range(k):
        tb = jnp.broadcast_to(g[0:1, :], v.shape)
        g = jnp.take_along_axis(tb, idx, axis=1, mode="promise_in_bounds")
        idx = (idx + 1) & 127
    o_ref[...] = (g & 255).astype(jnp.uint8)[None]


def run(kern, s, name, **kw):
    grid = (B, rpad // s)
    f = pl.pallas_call(
        functools.partial(kern, **kw) if kw else kern,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, rpad, 128), jnp.uint8),
        in_specs=[pl.BlockSpec((1, s, 128), lambda b, t: (b, t, 0))],
        out_specs=pl.BlockSpec((1, s, 128), lambda b, t: (b, t, 0)),
    )
    g = jax.jit(lambda a: f(a))
    secs = time_op_chained(g, xd, target_secs=0.5, repeats=2)
    gpix = NPIX / secs / 1e9
    nsteps = grid[0] * grid[1]
    print(f"{name:34s} s={s:5d} steps={nsteps:4d}  {secs*1e6:9.1f} us  "
          f"{gpix:8.1f} GPix/s  {secs/nsteps*1e9:8.0f} ns/step")
    return secs


print("\n-- A: passthrough copy, block height sweep --")
for s in (512, 1024, 2048, 4096, 8192, 16384):
    run(copy_kernel, s, "copy")

print("\n-- B: k adds per block (s=2048) --")
t = {}
for k in (0, 8, 32, 64):
    t[k] = run(adds_kernel, 2048, f"adds k={k}", k=k)
ops = (64 - 8) * NPIX
print(f"   VPU adds: {(ops / (t[64] - t[8]) / 1e12):.2f} Top/s effective")

print("\n-- C: k gathers per block (s=2048) --")
tg = {}
for k in (1, 8, 32):
    tg[k] = run(gather_kernel, 2048, f"gathers k={k}", k=k)
print(f"   gathers: {((32 - 8) * NPIX / (tg[32] - tg[8]) / 1e12):.2f} Tgather/s effective")
