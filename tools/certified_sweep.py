#!/usr/bin/env python
"""Certified full-suite TPU bench sweep (docs/DESIGN.md §9).

The axon tunnel has two timing failure modes that make a single-process
27-row sweep uncertifiable: the ~150-execution degradation cliff and the
early-ack mode where ``block_until_ready`` returns before the device
finishes.  bench.py defends each PROCESS with a canary sandwich; this
driver defends the SWEEP by splitting the suite into small row chunks,
running each in a FRESH process (its own canary sandwich, well under the
execution cliff), retrying chunks whose window was flagged, and merging
the per-chunk results into one artifact:

    python tools/certified_sweep.py --out docs/BENCH_TPU_rNN.json

The merged JSON carries ``timing_suspect`` = OR over the accepted
chunks, plus per-chunk canary readings so a reader can audit exactly
which window certified which rows.
"""
from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Canonical row order (== bench.py --all suite order).  Chunks are kept
# to <=4 rows: ~10-15 executions/row + 2 canary probes stays far under
# the ~150-execution cliff.
ROWS = [
    "histeq+unsharp 1080p gray b8",
    "histeq+unsharp 4K gray b2",
    "equalize_hist 512x512",
    "gamma+stretch 1080p rgb b32",
    "unsharp 1080p gray b8",
    "gaussian5 1080p gray b8",
    "median3 1080p gray b8",
    "median5 1080p gray b8",
    "gaussian5 4K gray b2",
    "median5 4K gray b2",
    "clahe 4K rgb",
    "median5>clahe>unsharp 4K gray b2",
    "box5 4K gray b2",
    "bilateral9 4K gray b2",
    "resize/lin 4K->1440p gray b2",
    "resize/area 4K->1440p gray b2",
    "nlmeans 1080p gray",
    "canny 4K gray b2",
    "warp/rot15 4K gray b2",
    "sobel3 4K gray b2",
    "open3 4K gray b2",
    "athresh/gauss11 4K gray b2",
    "resize/lanczos4 4K->1440p gray b2",
    "warp_polar 4K gray b2",
    "cvt/hls 1080p rgb b8",
    "clahe/u16 4K gray b2",
    "median5/u16 4K gray b2",
    "gaussian5/u16 4K gray b2",
    "median5/i16 4K gray b2",
    "gaussian5/i16 4K gray b2",
    # r05 additions: the geometry/tonemap rows bench --all already
    # carried, plus the new tonemap/mantiuk op
    "warp/cubic 4K gray b2",
    "warp/lanczos4 4K gray b2",
    "remap/cubic 4K gray b2",
    "cvt/luv 1080p rgb b8",
    "dist/l2m3 1080p gray",
    "tonemap/reinhard 1080p rgb",
    "tonemap/drago 1080p rgb",
    "tonemap/mantiuk 1080p rgb",
]


def chunk_regex(names: list[str]) -> str:
    return "^(?:" + "|".join(re.escape(n) for n in names) + ")$"


def run_chunk(names: list[str], iters: int, timeout: float,
              clock: str = "chain") -> dict | None:
    """One fresh-process bench run over ``names``; parsed JSON or None."""
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out_path = tf.name
    cmd = [sys.executable, str(REPO / "bench.py"), "--rows", chunk_regex(names),
           "--iters", str(iters), "--gate", "0", "--clock", clock,
           "--json-out", out_path]
    try:
        proc = subprocess.run(cmd, cwd=REPO, timeout=timeout,
                              capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        print(f"  chunk TIMED OUT after {timeout:.0f}s", file=sys.stderr)
        return None
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(f"  chunk exited {proc.returncode}", file=sys.stderr)
        return None
    try:
        return json.loads(Path(out_path).read_text())
    except (OSError, json.JSONDecodeError) as e:
        print(f"  chunk JSON unreadable: {e}", file=sys.stderr)
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="merged JSON artifact path")
    ap.add_argument("--chunk-size", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--retries", type=int, default=3,
                    help="max attempts per chunk before accepting a "
                    "timing_suspect window (parity is still valid)")
    ap.add_argument("--clock", choices=("wall", "chain"), default="chain",
                    help="bench.py clock (chain = tunnel-independent, the "
                    "certifying default; docs/DESIGN.md §9b)")
    ap.add_argument("--chunk-timeout", type=float, default=2400.0)
    ap.add_argument("--cooldown", type=float, default=20.0,
                    help="seconds between retry attempts (lets the tunnel "
                    "leave a lying state)")
    ap.add_argument("--merge-into", default=None,
                    help="existing artifact: preload its rows/chunk meta "
                    "and only re-run the chunks named by --chunks (for "
                    "repairing failed chunks without re-timing the rest)")
    ap.add_argument("--chunks", default=None,
                    help="comma-separated 1-based chunk indices to run "
                    "(default: all)")
    args = ap.parse_args()

    if args.chunks and not args.merge_into:
        # without a prior artifact the skipped chunks contribute neither
        # rows nor chunk meta — the output would LOOK like a complete
        # sweep with rows silently missing (ADVICE r04)
        ap.error("--chunks requires --merge-into (a partial run must merge "
                 "into a prior artifact, or the output silently drops the "
                 "skipped chunks' rows)")

    chunks = [ROWS[i:i + args.chunk_size]
              for i in range(0, len(ROWS), args.chunk_size)]
    merged_rows: dict[str, dict] = {}
    chunk_meta = []
    device = None
    run_set = (set(int(s) - 1 for s in args.chunks.split(","))
               if args.chunks else set(range(len(chunks))))
    if args.merge_into:
        prior = json.loads(Path(args.merge_into).read_text())
        device = prior.get("device")
        for row in prior.get("rows", []):
            merged_rows[row["name"]] = row
        prior_meta = {tuple(c["rows"]): c for c in prior.get("chunks", [])}
    else:
        prior_meta = {}
    for ci, names in enumerate(chunks):
        if ci not in run_set:
            if tuple(names) in prior_meta:
                chunk_meta.append(prior_meta[tuple(names)])
            else:
                print(f"WARNING: skipped chunk {ci + 1} ({names}) has no "
                      "matching meta in the prior artifact — its rows/meta "
                      "are missing from the merged output", file=sys.stderr)
                chunk_meta.append({"rows": names, "status": "missing"})
            continue
        print(f"=== chunk {ci + 1}/{len(chunks)}: {names}", file=sys.stderr)
        best = None
        for attempt in range(args.retries):
            data = run_chunk(names, args.iters, args.chunk_timeout,
                             args.clock)
            if data is None:
                continue
            best = data
            if not data.get("timing_suspect"):
                break
            print(f"  attempt {attempt + 1} flagged timing_suspect — "
                  f"retrying in {args.cooldown:.0f}s", file=sys.stderr)
            time.sleep(args.cooldown)
        if best is None:
            print(f"  chunk {ci + 1} FAILED every attempt — rows omitted",
                  file=sys.stderr)
            chunk_meta.append({"rows": names, "status": "failed"})
            continue
        device = best.get("device", device)
        for row in best.get("rows", []):
            row = dict(row)
            row["chunk"] = ci
            merged_rows[row["name"]] = row
        chunk_meta.append({
            "rows": names,
            "status": "ok",
            "timing_suspect": bool(best.get("timing_suspect")),
            "canary_pre_gpix": best.get("canary_pre_gpix"),
            "canary_post_gpix": best.get("canary_post_gpix"),
        })

    ordered = [merged_rows[n] for n in ROWS if n in merged_rows]
    suspect = any(c.get("timing_suspect") for c in chunk_meta
                  if c["status"] == "ok") or any(
                      c["status"] in ("failed", "missing") for c in chunk_meta)
    out = {
        "device": device,
        "clock": args.clock,
        "method": "chunked fresh-process sweep, per-chunk canary sandwich "
                  "(tools/certified_sweep.py; docs/DESIGN.md §9)",
        "timing_suspect": suspect,
        "chunks": chunk_meta,
        "rows": ordered,
    }
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(f"merged {len(ordered)}/{len(ROWS)} rows -> {args.out} "
          f"(timing_suspect={suspect})", file=sys.stderr)
    return 0 if (len(ordered) == len(ROWS) and not suspect) else 1


if __name__ == "__main__":
    raise SystemExit(main())
