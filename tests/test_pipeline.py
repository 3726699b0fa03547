"""Tier-3 integration: composed pipelines vs chained oracle (SURVEY.md §4).

Acceptance: ≤1 LSB vs the `ref/` pipeline (chains may amplify single-LSB
ties, so per-stage-exact chains are compared stage-for-stage against the
oracle chain, which uses identical f32 math).
"""

import numpy as np
import pytest

from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.models.presets import PRESETS, get_preset
from imageenhancement_mp_tpu.pipeline import equalize_unsharp, make_pipeline


def maxdiff(a, b):
    return int(np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)).max())


def test_histeq_unsharp_fused_exact(rng):
    batch = rng.integers(0, 256, (3, 128, 131), dtype=np.uint8)
    want = np.stack([ref.unsharp_mask(ref.equalize_hist(p), 1.0, 5, 0.0) for p in batch])
    assert maxdiff(equalize_unsharp(batch, 1.0, 5, 0.0), want) == 0


def test_config5_pipeline_1lsb(rng):
    batch = rng.integers(0, 256, (2, 128, 131), dtype=np.uint8)
    pipe = get_preset("denoise_clahe_sharpen")
    want = np.stack(
        [
            ref.unsharp_mask(ref.clahe(ref.median_blur(p, 5), 2.0, (8, 8)), 1.0, 5, 0.0)
            for p in batch
        ]
    )
    # CLAHE is exact vs oracle on most shapes; unsharp (gain 2) may amplify a
    # single-LSB CLAHE tie flip to 2 — budget 2 for the 3-stage chain.
    assert maxdiff(pipe(batch), want) <= 2


def test_all_presets_run(rng):
    img = rng.integers(0, 256, (2, 64, 64), dtype=np.uint8)
    for name in PRESETS:
        out = np.asarray(get_preset(name)(img))
        assert out.shape == img.shape and out.dtype == np.uint8, name


def test_make_pipeline_rgb(rng):
    img = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    pipe = make_pipeline([("gamma", {"gamma": 2.2}), "contrast_stretch"])
    out = np.asarray(pipe(img))
    want = np.zeros_like(img)
    for n in range(2):
        for c in range(3):
            want[n, :, :, c] = ref.contrast_stretch(ref.gamma_transform(img[n, :, :, c], 2.2))
    assert maxdiff(out, want) == 0


def test_unknown_op_raises():
    with pytest.raises(KeyError):
        make_pipeline(["no_such_op"])


def test_stream_frames_matches_direct(rng):
    from imageenhancement_mp_tpu.pipeline import stream_frames

    pipe = get_preset("histeq_unsharp")
    frames = [rng.integers(0, 256, (2, 48, 56), dtype=np.uint8) for _ in range(5)]
    streamed = [np.asarray(o) for o in stream_frames(pipe, frames, depth=2)]
    assert len(streamed) == 5
    for got, f in zip(streamed, frames):
        assert maxdiff(got, pipe(f)) == 0


def test_profiling_helpers(rng):
    from imageenhancement_mp_tpu.profiling import time_op, throughput_gpixs

    img = rng.integers(0, 256, (2, 32, 32), dtype=np.uint8)
    pipe = get_preset("histeq")
    secs = time_op(pipe, img, iters=2, warmup=1)
    assert secs > 0
    assert throughput_gpixs(img.shape, secs) > 0


def test_pipeline_channels_last_false(rng):
    """make_pipeline(channels_last=False) treats [N,H,W<=4] as gray frames."""
    from imageenhancement_mp_tpu.pipeline import make_pipeline
    from imageenhancement_mp_tpu import ref

    x = rng.integers(0, 256, (5, 24, 3), dtype=np.uint8)
    pipe = make_pipeline([("equalize_hist", {})], channels_last=False)
    got = np.asarray(pipe(x))
    want = np.stack([ref.equalize_hist(p) for p in x])
    assert np.array_equal(got, want)
