"""Demo CLI: ``python -m imageenhancement_mp_tpu.cli <image> --op clahe ...``

The reference's entry points are per-technique demo scripts (load image →
apply one enhancement → save; SURVEY.md §3.5).  This thin CLI is the
equivalent: host-side image IO (cv2/Pillow/.npy), one op or pipeline on
device, save the result.  Not on the perf path.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _load(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        try:
            from PIL import Image
        except ImportError:
            raise SystemExit(
                "error: reading non-.npy images needs opencv-python or Pillow "
                "(pip install 'imageenhancement-mp-tpu[io]')"
            )
        return np.asarray(Image.open(path))


def _save(path: str, img: np.ndarray) -> None:
    if path.endswith(".npy"):
        np.save(path, img)
        return
    try:
        import cv2

        cv2.imwrite(path, img)
    except ImportError:
        try:
            from PIL import Image
        except ImportError:
            raise SystemExit(
                "error: writing non-.npy images needs opencv-python or Pillow "
                "(pip install 'imageenhancement-mp-tpu[io]')"
            )
        Image.fromarray(img).save(path)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="imageenhancement_mp_tpu",
        description="TPU-native image enhancement (demo CLI)",
    )
    p.add_argument("input", help="input image (.png/.jpg/.npy)")
    p.add_argument("-o", "--output", default="out.png", help="output path")
    p.add_argument(
        "--op",
        action="append",
        default=None,
        help="op to apply, repeatable to build a pipeline "
        "(gamma:2.2 | log | stretch | histeq | clahe[:clip[:gh[:gw]]] | "
        "gauss[:k[:sigma]] | lapsharp | unsharp[:amount[:k]] | median[:k])",
    )
    args = p.parse_args(argv)

    # Allow forcing a backend (e.g. IE_MP_TPU_PLATFORM=cpu) — needed where a
    # site plugin force-registers an accelerator via jax.config and the
    # JAX_PLATFORMS env var alone is ignored.
    platform = os.environ.get("IE_MP_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    import imageenhancement_mp_tpu as ie

    img = _load(args.input)
    if img.dtype != np.uint8:
        print(f"error: expected uint8 input, got {img.dtype}", file=sys.stderr)
        return 2
    out = np.asarray(img)
    for spec in args.op or ["histeq"]:
        name, _, rest = spec.partition(":")
        ps = rest.split(":") if rest else []
        if name == "gamma":
            out = ie.gamma(out, float(ps[0]) if ps else 2.2)
        elif name == "log":
            out = ie.log_transform(out)
        elif name == "stretch":
            out = ie.contrast_stretch(out)
        elif name == "histeq":
            out = ie.equalize_hist(out)
        elif name == "clahe":
            clip = float(ps[0]) if ps else 40.0
            grid = (int(ps[1]), int(ps[2])) if len(ps) >= 3 else (8, 8)
            out = ie.clahe(out, clip, grid)
        elif name == "gauss":
            out = ie.gaussian_blur(out, int(ps[0]) if ps else 5, float(ps[1]) if len(ps) > 1 else 0.0)
        elif name == "lapsharp":
            out = ie.laplacian_sharpen(out)
        elif name == "unsharp":
            out = ie.unsharp_mask(out, float(ps[0]) if ps else 1.0, int(ps[1]) if len(ps) > 1 else 5)
        elif name == "median":
            out = ie.median_blur(out, int(ps[0]) if ps else 3)
        else:
            print(f"error: unknown op {name!r}", file=sys.stderr)
            return 2
        out = np.asarray(out)
    _save(args.output, out)
    print(f"wrote {args.output} {out.shape} {out.dtype}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
