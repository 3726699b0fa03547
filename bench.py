"""Benchmark harness (BASELINE.json:2): GPix/s/chip + max-LSB parity.

Prints ONE JSON line for the driver:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: fused hist-eq + unsharp throughput on 1080p grayscale
(north star, BASELINE.json:2).  vs_baseline is the speedup over the
reference backend measured in this environment: OpenCV 5.0.0, 1 CPU thread,
0.607 GPix/s on the same pipeline (BASELINE.md).

Extra rows (all five judged configs) go to stderr; run with --all to see
them.  Run on the real TPU (default platform); first compile is slow.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_HISTEQ_UNSHARP_1080P = 0.607  # GPix/s, reference backend (BASELINE.md)
BASELINE_HISTEQ_UNSHARP_4K = 0.294
BASELINE_CLAHE_4K = 0.224
BASELINE_PIPE_4K = 0.122


def _time(fn, *args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="run all judged configs")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    import imageenhancement_mp_tpu as ie
    from imageenhancement_mp_tpu import ref
    from imageenhancement_mp_tpu.models.presets import get_preset
    from imageenhancement_mp_tpu.pipeline import equalize_unsharp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    rng = np.random.default_rng(0)

    def gpixs(shape, secs):
        n = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
        return n * shape[-2] * shape[-1] / secs / 1e9

    rows = []

    def bench(name, fn, x, baseline=None, pix_shape=None, parity=None):
        xd = jax.device_put(x, dev)
        secs = _time(fn, xd, iters=args.iters)
        g = gpixs(pix_shape or x.shape, secs)
        lsb = None
        if parity is not None:
            got = np.asarray(fn(xd))
            lsb = int(np.abs(got.astype(np.int64) - parity.astype(np.int64)).max())
        rows.append((name, g, baseline, lsb))
        print(
            f"{name:40s} {g:8.3f} GPix/s"
            + (f"  ({g/baseline:5.1f}x baseline)" if baseline else "")
            + (f"  max-LSB={lsb}" if lsb is not None else ""),
            file=sys.stderr,
        )
        return g

    # ---- headline: fused hist-eq + unsharp, 1080p gray (batch 8) ----
    b1080 = rng.integers(0, 256, (8, 1080, 1920), dtype=np.uint8)
    par = np.stack([ref.unsharp_mask(ref.equalize_hist(p), 1.0, 5, 0.0) for p in b1080])
    headline = bench(
        "histeq+unsharp 1080p gray b8",
        lambda x: equalize_unsharp(x, 1.0, 5, 0.0),
        b1080,
        BASELINE_HISTEQ_UNSHARP_1080P,
        parity=par,
    )

    if args.all:
        b4k = rng.integers(0, 256, (2, 2160, 3840), dtype=np.uint8)
        par4 = np.stack([ref.unsharp_mask(ref.equalize_hist(p), 1.0, 5, 0.0) for p in b4k])
        bench(
            "histeq+unsharp 4K gray b2",
            lambda x: equalize_unsharp(x, 1.0, 5, 0.0),
            b4k,
            BASELINE_HISTEQ_UNSHARP_4K,
            parity=par4,
        )

        # config 1: 512x512 histeq
        i512 = rng.integers(0, 256, (512, 512), dtype=np.uint8)
        bench("equalize_hist 512x512", ie.equalize_hist, i512, parity=ref.equalize_hist(i512))

        # config 2: gamma + stretch on batch 32 RGB 1080p
        b32 = rng.integers(0, 256, (32, 1080, 1920, 3), dtype=np.uint8)
        pipe2 = get_preset("gamma_stretch")
        bench("gamma+stretch 1080p rgb b32", pipe2, b32)

        # config 3: fused filters
        bench("unsharp 1080p gray b8", lambda x: ie.unsharp_mask(x, 1.0, 5), b1080)
        bench("gaussian5 1080p gray b8", lambda x: ie.gaussian_blur(x, 5), b1080)
        bench("median3 1080p gray b8", lambda x: ie.median_blur(x, 3), b1080)
        bench("median5 1080p gray b8", lambda x: ie.median_blur(x, 5), b1080)

        # config 4: CLAHE 4K RGB
        rgb4k = rng.integers(0, 256, (1, 2160, 3840, 3), dtype=np.uint8)
        par_c = ref.clahe(np.asarray(rgb4k[0, :, :, 0]), 2.0, (8, 8))
        g = bench(
            "clahe 4K rgb",
            lambda x: ie.clahe(x, 2.0, (8, 8)),
            rgb4k,
            BASELINE_CLAHE_4K,
            pix_shape=(3, 2160, 3840),
        )
        got = np.asarray(ie.clahe(jax.device_put(rgb4k, dev), 2.0, (8, 8)))[0, :, :, 0]
        print(
            f"{'  clahe parity (plane 0)':40s} max-LSB="
            f"{int(np.abs(got.astype(np.int64)-par_c.astype(np.int64)).max())}",
            file=sys.stderr,
        )

        # config 5: median5 -> clahe -> unsharp, 4K
        pipe5 = get_preset("denoise_clahe_sharpen")
        bench("median5>clahe>unsharp 4K gray b2", pipe5, b4k, BASELINE_PIPE_4K)

    print(
        json.dumps(
            {
                "metric": "fused_histeq_unsharp_1080p_gray",
                "value": round(headline, 4),
                "unit": "GPix/s/chip",
                "vs_baseline": round(headline / BASELINE_HISTEQ_UNSHARP_1080P, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
