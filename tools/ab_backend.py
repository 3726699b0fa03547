#!/usr/bin/env python
"""Chain-clock A/B: Pallas kernels vs XLA stages (DESIGN.md §4 re-derivation).

The round-1/2 'XLA-vs-Pallas equal in chains' decision was taken on the
lying wall clock (§9c).  This re-measures both backends for the
backend-aware ops, standalone and inside the judged chains, with the
tunnel-independent chain clock, and writes a JSON artifact.

Run fresh-process on the TPU:  python tools/ab_backend.py --out docs/AB_BACKEND_r04.json
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--target-secs", type=float, default=0.5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from imageenhancement_mp_tpu.ops.filters import (
        gaussian_blur_planes,
        unsharp_mask_planes,
    )
    from imageenhancement_mp_tpu.ops.median import median_blur_planes
    from imageenhancement_mp_tpu.ops.clahe import clahe_planes
    from imageenhancement_mp_tpu.ops.histogram import equalize_hist_planes
    from imageenhancement_mp_tpu.profiling import time_op_chained

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (8, 1080, 1920), np.uint8)), dev)

    rows = {}

    def ab(name, fn_x, fn_p):
        tx = time_op_chained(fn_x, x, target_secs=args.target_secs)
        tp = time_op_chained(fn_p, x, target_secs=args.target_secs)
        gx = x.size / tx / 1e9
        gp = x.size / tp / 1e9
        rows[name] = {"xla_gpix": round(gx, 2), "pallas_gpix": round(gp, 2),
                      "pallas_speedup": round(gx and tp and tx / tp, 2)}
        print(f"{name:34s} xla {gx:8.2f}  pallas {gp:8.2f}  "
              f"(pallas {tx/tp:5.2f}x)", file=sys.stderr)

    ab("unsharp5 1080p b8",
       lambda v: unsharp_mask_planes(v, 1.0, 5, 0.0, backend="xla"),
       lambda v: unsharp_mask_planes(v, 1.0, 5, 0.0, backend="pallas"))
    ab("gaussian5 1080p b8",
       lambda v: gaussian_blur_planes(v, 5, backend="xla"),
       lambda v: gaussian_blur_planes(v, 5, backend="pallas"))
    ab("median5 1080p b8",
       lambda v: median_blur_planes(v, 5, backend="xla"),
       lambda v: median_blur_planes(v, 5, backend="pallas"))
    # the judged chains: all-XLA stages vs Pallas backend-aware stages
    ab("histeq>unsharp (north star)",
       lambda v: unsharp_mask_planes(equalize_hist_planes(v), 1.0, 5, 0.0,
                                     backend="xla"),
       lambda v: unsharp_mask_planes(equalize_hist_planes(v), 1.0, 5, 0.0,
                                     backend="pallas"))
    ab("median5>clahe>unsharp (config 5)",
       lambda v: unsharp_mask_planes(
           clahe_planes(median_blur_planes(v, 5, backend="xla"), 2.0, (8, 8)),
           1.0, 5, 0.0, backend="xla"),
       lambda v: unsharp_mask_planes(
           clahe_planes(median_blur_planes(v, 5, backend="pallas"), 2.0, (8, 8)),
           1.0, 5, 0.0, backend="pallas"))

    out = {"device": f"{dev.device_kind} ({dev.platform})", "clock": "chain",
           "rows": rows}
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
        print(f"written to {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
