#!/usr/bin/env python
"""Physical-constant probe: HBM bandwidth + MXU int8 peak, canary-sandwiched.

VERDICT r03 item 2: docs/DESIGN.md claimed "~2.5 TB/s HBM (measured)" on a
device that self-reports as TPU v5e (spec: 819 GB/s HBM, 394 TOPS int8).
A measurement 3x over spec is exactly the tunnel's early-ack lying mode.
This probe re-measures both constants inside a canary-certified window so
every roofline statement in the repo can be reconciled with physics:

* canary: the 61-offset bilateral (VPU compute-bound, physically <= ~20
  GPix/s on v5e) measured BEFORE and AFTER the probe rows (bench.py:429).
* HBM: f32 copy-with-add over ~1 GiB (read+write = 2x bytes); also a u8
  variant matching the image hot path.
* MXU: int8[M,K] @ int8[K,N] -> int32, FLOPs = 2*M*N*K.  v5e int8 peak is
  394.7 TOPS -- a physical constant; if the probe "measures" above spec,
  the window lies regardless of what the canary said.

Run fresh-process (no prior d2h), e.g.:
    python tools/physics_probe.py --json-out docs/PHYSICS_r04.json
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--clock",
        choices=("wall", "chain"),
        default="wall",
        help="wall = block_until_ready wall clock (lies under the tunnel's "
        "early-ack mode — docs/PHYSICS_r04.json measured 40-80x over spec); "
        "chain = tunnel-independent lax.scan chain + d2h fence "
        "(profiling.time_op_chained)",
    )
    ap.add_argument(
        "--target-secs", type=float, default=1.0,
        help="chain clock: differenced device time to aim for per row")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import imageenhancement_mp_tpu as ie
    from imageenhancement_mp_tpu.profiling import time_op, time_op_chained

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}), clock={args.clock}",
          file=sys.stderr)
    rng = np.random.default_rng(0)

    def measure(fn, x, iters) -> float:
        if args.clock == "chain":
            return time_op_chained(fn, x, target_secs=args.target_secs)
        return time_op(fn, x, iters=iters, reduce="median")

    # -------- canary (same op + bound as bench.py:429) --------
    canary_x = jax.device_put(
        rng.integers(0, 256, (1, 1080, 1920), dtype=np.uint8), dev)

    def canary_gpix() -> float:
        if dev.platform == "cpu":
            return 0.0
        secs = measure(lambda x: ie.bilateral_filter(x, 9, 75.0, 75.0),
                       canary_x, 3)
        return float(np.prod(canary_x.shape) / secs / 1e9)

    rows: dict[str, dict] = {}
    canary_pre = canary_gpix()
    print(f"canary pre:  {canary_pre:.2f} GPix/s (bound 20)", file=sys.stderr)

    # -------- HBM bandwidth: f32 copy+add over ~1 GiB --------
    n_f32 = 256 * 1024 * 1024  # 1 GiB in, 1 GiB out
    xf = jax.device_put(jnp.zeros((n_f32,), jnp.float32), dev)
    add1 = jax.jit(lambda x: x + 1.0)
    secs = measure(add1, xf, args.iters)
    bw_f32 = 2.0 * n_f32 * 4 / secs / 1e9  # GB/s, read+write
    rows["hbm_f32_copyadd"] = {"gbps": round(bw_f32, 1), "secs": secs,
                               "bytes_moved": 2 * n_f32 * 4}
    print(f"HBM f32 copy+add: {bw_f32:.1f} GB/s", file=sys.stderr)

    # u8 variant (image hot-path dtype): x ^ 1 (pure VPU, 2 bytes/elem HBM)
    n_u8 = 1024 * 1024 * 1024
    xu = jax.device_put(jnp.zeros((n_u8,), jnp.uint8), dev)
    xor1 = jax.jit(lambda x: x ^ np.uint8(1))
    secs = measure(xor1, xu, args.iters)
    bw_u8 = 2.0 * n_u8 / secs / 1e9
    rows["hbm_u8_xor"] = {"gbps": round(bw_u8, 1), "secs": secs,
                          "bytes_moved": 2 * n_u8}
    print(f"HBM u8 xor:       {bw_u8:.1f} GB/s", file=sys.stderr)

    # -------- MXU int8 peak: M=N=K=8192 matmul, int32 accum --------
    m = 8192
    a = jax.device_put(rng.integers(-4, 4, (m, m), dtype=np.int8), dev)
    b = jax.device_put(rng.integers(-4, 4, (m, m), dtype=np.int8), dev)
    mm = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    secs = measure(lambda a: mm(a, b), a, args.iters)
    tops_i8 = 2.0 * m ** 3 / secs / 1e12
    rows["mxu_int8_8192"] = {"tops": round(tops_i8, 1), "secs": secs,
                             "flops": 2 * m ** 3}
    print(f"MXU int8 8192^3:  {tops_i8:.1f} TOPS", file=sys.stderr)

    # bf16 variant (spec 197 TFLOP/s on v5e).  mb=4096 keeps the chained
    # program's closure-captured B constant at 32 MB — the tunnel's
    # remote_compile rejects request bodies much past ~64 MB (HTTP 413)
    mb = 4096
    ab = jax.device_put(
        rng.standard_normal((mb, mb)).astype(jnp.bfloat16), dev)
    bb = jax.device_put(
        rng.standard_normal((mb, mb)).astype(jnp.bfloat16), dev)
    mmb = jax.jit(lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    secs = measure(lambda a: mmb(a, bb), ab, args.iters)
    tflops_bf16 = 2.0 * mb ** 3 / secs / 1e12
    rows["mxu_bf16_4096"] = {"tflops": round(tflops_bf16, 1), "secs": secs}
    print(f"MXU bf16 4096^3:  {tflops_bf16:.1f} TFLOP/s", file=sys.stderr)

    canary_post = canary_gpix()
    print(f"canary post: {canary_post:.2f} GPix/s (bound 20)", file=sys.stderr)

    # certification: canary sandwich AND physics sanity (measured <= spec*1.15)
    V5E_SPEC = {"hbm_gbps": 819.0, "int8_tops": 394.7, "bf16_tflops": 197.0}
    over_spec = (bw_f32 > V5E_SPEC["hbm_gbps"] * 1.15
                 or tops_i8 > V5E_SPEC["int8_tops"] * 1.15
                 or tflops_bf16 > V5E_SPEC["bf16_tflops"] * 1.15)
    suspect = bool(canary_pre > 20.0 or canary_post > 20.0 or over_spec)
    out = {
        "device": str(dev.device_kind),
        "canary_pre_gpix": round(canary_pre, 2),
        "canary_post_gpix": round(canary_post, 2),
        "v5e_spec": V5E_SPEC,
        "over_spec": over_spec,
        "timing_suspect": suspect,
        "clock": args.clock,
        "rows": rows,
    }
    print(json.dumps(out))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(out, indent=1) + "\n")
    return 0 if not suspect else 1


if __name__ == "__main__":
    raise SystemExit(main())
