"""FrameWriter (native + fallback): encode/write roundtrips through
FrameLoader and cross-checks against cv2's decoders."""

import numpy as np
import pytest

from imageenhancement_mp_tpu.io import FrameLoader, FrameWriter

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@pytest.fixture(params=[False, True], ids=["native", "fallback"])
def writer_kind(request):
    if not request.param and not FrameWriter(threads=1).native:
        pytest.skip("native writer unavailable (no C++ toolchain)")
    return request.param


def roundtrip(tmp_path, name, frame, force_fallback, **save_kw):
    path = tmp_path / name
    with FrameWriter(threads=2, force_fallback=force_fallback) as fw:
        fw.save(path, frame, **save_kw)
    assert fw.failures == []
    got = next(iter(FrameLoader([path])))
    return path, got


@pytest.mark.parametrize(
    "name,shape,dtype",
    [
        ("gray.pgm", (33, 47), np.uint8),
        ("gray16.pgm", (21, 17), np.uint16),
        ("rgb.ppm", (19, 23, 3), np.uint8),
        ("rgb16.ppm", (11, 13, 3), np.uint16),
        ("gray.png", (33, 47), np.uint8),
        ("gray16.png", (21, 17), np.uint16),
        ("rgb.png", (19, 23, 3), np.uint8),
        ("rgb16.png", (11, 13, 3), np.uint16),
        ("rgba.png", (9, 14, 4), np.uint8),
    ],
)
def test_lossless_roundtrip(tmp_path, rng, writer_kind, name, shape, dtype):
    hi = 256 if dtype == np.uint8 else 65536
    frame = rng.integers(0, hi, shape, dtype=dtype)
    _, got = roundtrip(tmp_path, name, frame, writer_kind)
    assert got.dtype == dtype
    np.testing.assert_array_equal(got, frame)


@pytest.mark.skipif(cv2 is None, reason="cv2 unavailable")
def test_png_decodable_by_cv2(tmp_path, rng, writer_kind):
    """Our PNG encoder must produce files other decoders accept."""
    frame = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    path, _ = roundtrip(tmp_path, "x.png", frame, writer_kind)
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    assert img is not None
    np.testing.assert_array_equal(img[..., ::-1], frame)  # cv2 gives BGR
    frame16 = rng.integers(0, 65536, (12, 9), dtype=np.uint16)
    path, _ = roundtrip(tmp_path, "x16.png", frame16, writer_kind)
    img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(img, frame16)


@pytest.mark.skipif(cv2 is None, reason="cv2 unavailable")
def test_jpeg_roundtrip_lossy(tmp_path, rng, writer_kind):
    frame = rng.integers(100, 156, (32, 32), dtype=np.uint8)  # low contrast
    path, got = roundtrip(tmp_path, "x.jpg", frame, writer_kind, quality=95)
    assert got.shape == frame.shape
    assert np.abs(got.astype(int) - frame.astype(int)).mean() < 12
    assert cv2.imread(str(path), cv2.IMREAD_UNCHANGED) is not None


def test_many_frames_stress(tmp_path, rng, writer_kind):
    frames = [
        rng.integers(0, 256, (8 + i % 5, 9 + i % 7), dtype=np.uint8)
        for i in range(40)
    ]
    with FrameWriter(threads=4, force_fallback=writer_kind) as fw:
        for i, f in enumerate(frames):
            fw.save(tmp_path / f"f{i:03d}.png", f)
    assert fw.failures == []
    paths = [tmp_path / f"f{i:03d}.png" for i in range(40)]
    for got, want in zip(FrameLoader(paths), frames):
        np.testing.assert_array_equal(got, want)


def test_failure_reported_not_raised(tmp_path, rng, writer_kind):
    frame = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    with FrameWriter(threads=2, force_fallback=writer_kind) as fw:
        fw.save(tmp_path / "ok.png", frame)
        fw.save(tmp_path / "no_such_dir" / "x.png", frame)  # open fails
        fails = fw.flush()
    assert len(fails) == 1
    assert "no_such_dir" in str(fails[0])
    got = next(iter(FrameLoader([tmp_path / "ok.png"])))
    np.testing.assert_array_equal(got, frame)


def test_invalid_frames_raise(tmp_path, writer_kind):
    with FrameWriter(threads=1, force_fallback=writer_kind) as fw:
        with pytest.raises(TypeError):
            fw.save(tmp_path / "f.png", np.zeros((4, 4), np.float32))
        with pytest.raises(ValueError):
            fw.save(tmp_path / "f.png", np.zeros((4, 4, 7), np.uint8))


def test_raw_extension_writes_bytes(tmp_path, rng, writer_kind):
    frame = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    with FrameWriter(threads=1, force_fallback=writer_kind) as fw:
        fw.save(tmp_path / "f.u8", frame)
    assert (tmp_path / "f.u8").read_bytes() == frame.tobytes()


def test_pnm_16bit_is_big_endian_per_spec(tmp_path, rng, writer_kind):
    frame = rng.integers(0, 65536, (4, 3), dtype=np.uint16)
    with FrameWriter(threads=1, force_fallback=writer_kind) as fw:
        fw.save(tmp_path / "f.pgm", frame)
    data = (tmp_path / "f.pgm").read_bytes()
    header_end = data.index(b"65535\n") + 6
    samples = np.frombuffer(data[header_end:], ">u2").reshape(4, 3)
    np.testing.assert_array_equal(samples.astype(np.uint16), frame)


def test_fallback_save_copies_buffer(tmp_path, rng):
    """The fallback must snapshot the frame at save() time (same contract
    as the native fw_submit copy): reusing the buffer can't corrupt output."""
    frames = [rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(8)]
    buf = np.empty((16, 16), np.uint8)
    with FrameWriter(threads=2, force_fallback=True) as fw:
        for i, f in enumerate(frames):
            buf[:] = f
            fw.save(tmp_path / f"r{i}.png", buf)
    assert fw.failures == []
    for i, f in enumerate(frames):
        got = next(iter(FrameLoader([tmp_path / f"r{i}.png"])))
        np.testing.assert_array_equal(got, f)


def test_jpeg_quality_clamped_consistently(tmp_path, rng, writer_kind):
    """quality is clamped to [1,100] identically on both backends; a low
    quality must actually produce a smaller file than a high one."""
    frame = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    with FrameWriter(threads=1, force_fallback=writer_kind) as fw:
        fw.save(tmp_path / "q_low.jpg", frame, quality=-5)   # -> 1
        fw.save(tmp_path / "q_hi.jpg", frame, quality=400)   # -> 100
    assert fw.failures == []
    lo = (tmp_path / "q_low.jpg").stat().st_size
    hi = (tmp_path / "q_hi.jpg").stat().st_size
    assert lo < hi


def test_save_after_close_raises(tmp_path, rng, writer_kind):
    """A closed writer must reject save() with a clear error (not an
    AttributeError from the wrong backend branch) and keep flush() safe."""
    frame = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    fw = FrameWriter(threads=1, force_fallback=writer_kind)
    fw.save(tmp_path / "a.png", frame)
    fw.close()
    with pytest.raises(RuntimeError, match="closed"):
        fw.save(tmp_path / "b.png", frame)
    assert fw.flush() == []  # no-op, returns recorded failures
    fw.close()  # idempotent


def test_fallback_backpressure_blocks_at_cap(tmp_path, rng, monkeypatch):
    """The fallback honors max_queue_bytes like the native queue: save()
    blocks once the queued frame copies reach the cap, instead of growing
    memory without bound."""
    import threading

    import imageenhancement_mp_tpu.io.writer as W

    gate = threading.Event()
    real = W.encode_frame

    def slow_encode(path, frame, quality=95):
        gate.wait(10)
        return real(path, frame, quality)

    monkeypatch.setattr(W, "encode_frame", slow_encode)
    frame = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    fw = FrameWriter(
        threads=1, max_queue_bytes=2 * frame.nbytes, force_fallback=True
    )
    fw.save(tmp_path / "a.png", frame)  # worker holds this one at the gate
    fw.save(tmp_path / "b.png", frame)  # queued: at the cap now
    unblocked = threading.Event()

    def third():
        fw.save(tmp_path / "c.png", frame)  # must block until a drains
        unblocked.set()

    t = threading.Thread(target=third, daemon=True)
    t.start()
    assert not unblocked.wait(0.3), "save() did not block at max_queue_bytes"
    gate.set()
    assert unblocked.wait(10)
    t.join(10)
    fw.close()
    assert fw.failures == []
    for name in ("a.png", "b.png", "c.png"):
        got = next(iter(FrameLoader([tmp_path / name])))
        np.testing.assert_array_equal(got, frame)
