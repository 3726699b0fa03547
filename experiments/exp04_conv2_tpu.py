"""Validate kernels/conv2.py on the real TPU: bitwise parity + chain-clock perf."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.kernels.conv2 import sep_conv5_wide
from imageenhancement_mp_tpu.kernels.conv import unsharp_mask_pallas
from imageenhancement_mp_tpu.ref.ops import gaussian_kernel_fixed
from imageenhancement_mp_tpu.profiling import time_op_chained

print("devices:", jax.devices())
rng = np.random.default_rng(7)


def q8(k, s=0.0):
    return tuple(int(t) for t in gaussian_kernel_fixed(k, s))


def md(a, b):
    return int(np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)).max())


# ---- parity on chip (small 4K-slice shapes) ----
t5 = q8(5)
cases = []
x = rng.integers(0, 256, (1, 256, 512), np.uint8)
xd = jax.device_put(jnp.asarray(x))
cases.append(("blur5", md(sep_conv5_wide(xd, t5, t5, None),
                          np.stack([ref.gaussian_blur(p, 5, 0.0) for p in x]))))
cases.append(("unsharp a=1", md(sep_conv5_wide(xd, t5, t5, 1.0),
                                np.stack([ref.unsharp_mask(p, 1.0, 5, 0.0) for p in x]))))
cases.append(("unsharp a=0.7", md(sep_conv5_wide(xd, t5, t5, 0.7),
                                  np.stack([ref.unsharp_mask(p, 0.7, 5, 0.0) for p in x]))))
tg = q8(5, 1.5)
cases.append(("mxu s=1.5", md(sep_conv5_wide(xd, tg, tg, 1.0),
                              np.stack([ref.unsharp_mask(p, 1.0, 5, 1.5) for p in x]))))
lut = rng.integers(0, 256, (256,), np.uint8)
lut2 = jnp.asarray(np.broadcast_to(
    np.stack([lut[:128], lut[128:]]).astype(np.int32), (1, 2, 128)).copy())
cases.append(("lut+unsharp", md(sep_conv5_wide(xd, t5, t5, 1.0, lut2=lut2),
                                np.stack([ref.unsharp_mask(lut[p], 1.0, 5, 0.0) for p in x]))))
t3 = q8(3)
cases.append(("blur3", md(sep_conv5_wide(xd, t3, t3, None),
                          np.stack([ref.gaussian_blur(p, 3, 0.0) for p in x]))))
for name, d in cases:
    print(f"parity {name}: maxdiff={d}")
assert all(d == 0 for _, d in cases), "ON-CHIP PARITY FAILURE"

# ---- chain-clock perf: 4K x batch 8 ----
B, H, W = 8, 2160, 3840
xb = jax.device_put(jnp.asarray(rng.integers(0, 256, (B, H, W), np.uint8)))
lut2b = jnp.asarray(np.broadcast_to(
    np.stack([lut[:128], lut[128:]]).astype(np.int32), (B, 2, 128)).copy())

px = B * H * W / 1e9
for name, fn in [
    ("conv2 unsharp a=1 (packed)", lambda v: sep_conv5_wide(v, t5, t5, 1.0)),
    ("conv2 blur (packed)", lambda v: sep_conv5_wide(v, t5, t5, None)),
    ("conv2 lut+unsharp (flagship p2)", lambda v: sep_conv5_wide(v, t5, t5, 1.0, lut2=lut2b)),
    ("conv2 mxu s=1.5 unsharp", lambda v: sep_conv5_wide(v, tg, tg, 1.0)),
    ("conv.py unsharp (r04)", lambda v: unsharp_mask_pallas(v, 1.0, 5, 0.0)),
]:
    s = time_op_chained(fn, xb)
    print(f"{name}: {px / s:.1f} GPix/s  ({s*1e3:.3f} ms)")

# 1080p batch 32
B2, H2, W2 = 32, 1080, 1920
x2 = jax.device_put(jnp.asarray(rng.integers(0, 256, (B2, H2, W2), np.uint8)))
lut2c = jnp.asarray(np.broadcast_to(
    np.stack([lut[:128], lut[128:]]).astype(np.int32), (B2, 2, 128)).copy())
px2 = B2 * H2 * W2 / 1e9
for name, fn in [
    ("1080p conv2 unsharp", lambda v: sep_conv5_wide(v, t5, t5, 1.0)),
    ("1080p conv2 lut+unsharp", lambda v: sep_conv5_wide(v, t5, t5, 1.0, lut2=lut2c)),
]:
    s = time_op_chained(fn, x2)
    print(f"{name}: {px2 / s:.1f} GPix/s  ({s*1e3:.3f} ms)")
