"""Multi-chip batch-DP sharding on the virtual 8-device CPU mesh
(SURVEY.md §2 'Parallelism strategies')."""

import numpy as np
import jax

from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.ref import ops as ref_ops
from imageenhancement_mp_tpu.ops.filters import unsharp_mask_planes
from imageenhancement_mp_tpu.ops.histogram import equalize_hist_planes
from imageenhancement_mp_tpu.parallel.sharding import (
    device_put_sharded_batch,
    make_mesh,
    shard_pipeline,
)


def maxdiff(a, b):
    return int(np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)).max())


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_flagship_matches_oracle(rng):
    mesh = make_mesh(8)
    batch = rng.integers(0, 256, (16, 48, 56), dtype=np.uint8)
    x = device_put_sharded_batch(batch, mesh)

    def flagship(planes):
        return unsharp_mask_planes(equalize_hist_planes(planes), 1.0, 5, 0.0)

    out = np.asarray(shard_pipeline(flagship, mesh)(x))
    want = np.stack([ref.unsharp_mask(ref.equalize_hist(p), 1.0, 5, 0.0) for p in batch])
    assert maxdiff(out, want) == 0


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_jittable():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape and out.dtype == np.uint8


def test_sharded_u16_pipeline(rng):
    from imageenhancement_mp_tpu.ops.filters import gaussian_blur_planes
    from imageenhancement_mp_tpu.ops.median import median_blur_planes

    mesh = make_mesh(8)
    batch = rng.integers(0, 65536, (8, 40, 48), dtype=np.uint16)
    x = device_put_sharded_batch(batch, mesh)

    def pipe(planes):
        return gaussian_blur_planes(median_blur_planes(planes, 3), 5)

    out = np.asarray(shard_pipeline(pipe, mesh)(x))
    want = np.stack([ref.gaussian_blur(ref.median_blur(p, 3), 5, 0.0) for p in batch])
    assert maxdiff(out, want) == 0


def test_global_histeq_collective_matches_pooled_oracle(rng):
    """The psum-pooled global LUT must equal the single-device pooled LUT."""
    from imageenhancement_mp_tpu.ops.histogram import equalize_hist_global_planes
    from imageenhancement_mp_tpu.parallel.sharding import equalize_hist_global_sharded

    mesh = make_mesh(8)
    batch = rng.integers(0, 256, (16, 37, 43), dtype=np.uint8)
    x = device_put_sharded_batch(batch, mesh)
    got = np.asarray(equalize_hist_global_sharded(mesh)(x))

    # oracle: pool all histograms, one cv2-style LUT, apply everywhere
    hist = np.bincount(batch.ravel(), minlength=256)
    want_lut = ref_ops._equalize_lut(hist, batch.size)
    want = want_lut[batch]
    assert maxdiff(got, want) == 0

    # single-device path agrees
    single = np.asarray(equalize_hist_global_planes(batch))
    assert maxdiff(single, want) == 0


def test_global_histeq_per_channel_sharded(rng):
    """channels>1: each channel pools its own histogram across frames+shards."""
    from imageenhancement_mp_tpu.parallel.sharding import equalize_hist_global_sharded

    mesh = make_mesh(8)
    N, C, H, W = 16, 3, 21, 26
    batch = rng.integers(0, 256, (N * C, H, W), dtype=np.uint8)  # frame-major
    x = device_put_sharded_batch(batch, mesh)
    got = np.asarray(equalize_hist_global_sharded(mesh, channels=C)(x))

    want = np.empty_like(batch)
    for c in range(C):
        idx = [n * C + c for n in range(N)]
        stack = batch[idx]
        hist = np.bincount(stack.ravel(), minlength=256)
        lut = ref_ops._equalize_lut(hist, stack.size)
        want[idx] = lut[stack]
    assert maxdiff(got, want) == 0


# ---------------------------------------------------------------------------
# Mesh-aware front door (round 4, VERDICT r03 item 6): make_pipeline(mesh=),
# get_preset(mesh=), stream_frames(mesh=) — scale-out reachable from the
# documented API, bit-identical to the single-device programs.
# ---------------------------------------------------------------------------


def test_make_pipeline_mesh_batch_bitwise(rng):
    from imageenhancement_mp_tpu.pipeline import make_pipeline

    stages = [("median_blur", {"ksize": 3}),
              ("clahe", {"clip_limit": 2.0, "tile_grid": (2, 2)}),
              ("unsharp_mask", {"amount": 1.0, "ksize": 5})]
    mesh = make_mesh(8)
    single = make_pipeline(stages)
    sharded = make_pipeline(stages, mesh=mesh)
    batch = rng.integers(0, 256, (8, 48, 56), dtype=np.uint8)
    want = np.asarray(single(batch))
    got = np.asarray(sharded(device_put_sharded_batch(batch, mesh)))
    assert maxdiff(got, want) == 0
    # unsharded host input works too (XLA inserts the scatter)
    assert maxdiff(np.asarray(sharded(batch)), want) == 0
    # rgb batch: planes count N*C = 24 divisible by 8
    rgb = rng.integers(0, 256, (8, 48, 56, 3), dtype=np.uint8)
    assert maxdiff(np.asarray(sharded(rgb)), np.asarray(single(rgb))) == 0


def test_make_pipeline_mesh_spatial_bitwise(rng):
    from imageenhancement_mp_tpu.pipeline import make_pipeline

    stages = [("median_blur", {"ksize": 3}),
              ("clahe", {"clip_limit": 2.0, "tile_grid": (8, 8)}),
              ("unsharp_mask", {"amount": 1.0, "ksize": 5})]
    mesh = make_mesh(8, axis_name="y")
    single = make_pipeline(stages)
    sharded = make_pipeline(stages, mesh=mesh, shard="spatial")
    img = rng.integers(0, 256, (2, 64, 56), dtype=np.uint8)
    assert maxdiff(np.asarray(sharded(img)), np.asarray(single(img))) == 0


def test_make_pipeline_mesh_divisibility_errors(rng):
    import pytest

    from imageenhancement_mp_tpu.pipeline import make_pipeline

    mesh = make_mesh(8)
    pipe = make_pipeline([("gamma", {"gamma": 2.2})], mesh=mesh)
    with pytest.raises(ValueError, match="divisible"):
        pipe(np.zeros((3, 16, 16), np.uint8))
    meshy = make_mesh(8, axis_name="y")
    spipe = make_pipeline([("gamma", {"gamma": 2.2})], mesh=meshy, shard="spatial")
    with pytest.raises(ValueError, match="divisible"):
        spipe(np.zeros((2, 36, 16), np.uint8))


def test_get_preset_mesh_and_stream_frames(rng):
    from imageenhancement_mp_tpu.models.presets import get_preset
    from imageenhancement_mp_tpu.pipeline import stream_frames

    mesh = make_mesh(8)
    pipe = get_preset("denoise_clahe_sharpen", mesh=mesh)
    single = get_preset("denoise_clahe_sharpen")
    frames = [rng.integers(0, 256, (8, 40, 48), dtype=np.uint8)
              for _ in range(3)]
    outs = list(stream_frames(pipe, frames, depth=2, mesh=mesh))
    assert len(outs) == 3
    for f, o in zip(frames, outs):
        assert maxdiff(np.asarray(o), np.asarray(single(f))) == 0

    # spatial variant through the same front door
    meshy = make_mesh(8, axis_name="y")
    spipe = get_preset("denoise_clahe_sharpen", mesh=meshy, shard="spatial")
    souts = list(stream_frames(spipe, frames, depth=2, mesh=meshy,
                               shard="spatial"))
    for f, o in zip(frames, souts):
        assert maxdiff(np.asarray(o), np.asarray(single(f))) == 0
