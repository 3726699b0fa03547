"""Native frame loader: C++ prefetcher vs pure-Python fallback vs ground truth."""

import numpy as np
import pytest

from imageenhancement_mp_tpu.io import FrameLoader


def _write_pgm(path, arr):
    with open(path, "wb") as f:
        f.write(b"P5\n# comment\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.tobytes())


def _write_ppm(path, arr):
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.tobytes())


@pytest.fixture
def frame_files(tmp_path, rng):
    frames = []
    paths = []
    for i in range(6):
        if i % 2:
            a = rng.integers(0, 256, (37 + i, 53), dtype=np.uint8)
            p = tmp_path / f"f{i}.pgm"
            _write_pgm(p, a)
        else:
            a = rng.integers(0, 256, (24, 31 + i, 3), dtype=np.uint8)
            p = tmp_path / f"f{i}.ppm"
            _write_ppm(p, a)
        frames.append(a)
        paths.append(p)
    return paths, frames


def test_native_loader(frame_files):
    paths, frames = frame_files
    loader = FrameLoader(paths, threads=3)
    if not loader.native:
        pytest.skip("no C++ toolchain available")
    got = list(loader)
    assert len(got) == len(frames)
    for g, w in zip(got, frames):
        assert g.shape == w.shape and np.array_equal(g, w)


def test_fallback_loader(frame_files):
    paths, frames = frame_files
    got = list(FrameLoader(paths, threads=2, force_fallback=True))
    for g, w in zip(got, frames):
        assert np.array_equal(g, w)


def test_raw_blob(tmp_path, rng):
    blob = rng.integers(0, 256, 1000, dtype=np.uint8)
    p = tmp_path / "frame.u8"
    p.write_bytes(blob.tobytes())
    loader = FrameLoader([p], threads=1)
    (got,) = list(loader)
    assert np.array_equal(got, blob)


def test_missing_file(tmp_path):
    loader = FrameLoader([tmp_path / "nope.pgm"], threads=1)
    if not loader.native:
        pytest.skip("no C++ toolchain available")
    with pytest.raises(IOError):
        list(loader)


def test_order_preserved_many(tmp_path, rng):
    paths = []
    want = []
    for i in range(32):
        a = np.full((8, 8), i, np.uint8)
        p = tmp_path / f"o{i:02d}.pgm"
        _write_pgm(p, a)
        paths.append(p)
        want.append(a)
    loader = FrameLoader(paths, threads=8)
    got = list(loader)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_png_decode(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    paths, want = [], []
    for i, shape in enumerate([(37, 53), (24, 31, 3)]):
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        p = tmp_path / f"p{i}.png"
        assert cv2.imwrite(str(p), a)
        paths.append(p)
        # cv2 treats arrays as BGR; the loader returns the file's RGB order
        want.append(a[..., ::-1] if a.ndim == 3 else a)
    for force in (False, True):
        loader = FrameLoader(paths, threads=2, force_fallback=force)
        if not force and not loader.native:
            continue
        got = list(loader)
        for g, w in zip(got, want):
            assert g.shape == w.shape, (force, g.shape, w.shape)
            assert np.array_equal(g, w), force


def test_loader_feeds_stream_pipeline(tmp_path, rng):
    """io.FrameLoader -> pipeline.stream_frames -> preset, end to end."""
    from imageenhancement_mp_tpu.models.presets import get_preset
    from imageenhancement_mp_tpu.pipeline import stream_frames
    from imageenhancement_mp_tpu import ref

    paths, want = [], []
    for i in range(4):
        a = rng.integers(0, 256, (32, 40), dtype=np.uint8)
        p = tmp_path / f"s{i}.pgm"
        _write_pgm(p, a)
        paths.append(p)
        want.append(ref.unsharp_mask(ref.equalize_hist(a), 1.0, 5, 0.0))

    pipe = get_preset("histeq_unsharp")
    frames = (f[None] for f in FrameLoader(paths, threads=2))  # batch of 1
    outs = [np.asarray(o)[0] for o in stream_frames(pipe, frames, depth=2)]
    assert len(outs) == 4
    for got, w in zip(outs, want):
        assert np.array_equal(got, w)


def test_jpeg_decode(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    # JPEG is lossy: compare against cv2's own decode of the same file
    gray = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    rgbish = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    pg = tmp_path / "g.jpg"
    pc = tmp_path / "c.jpg"
    assert cv2.imwrite(str(pg), gray)
    assert cv2.imwrite(str(pc), rgbish)
    want_g = cv2.imread(str(pg), cv2.IMREAD_UNCHANGED)
    want_c = cv2.imread(str(pc), cv2.IMREAD_UNCHANGED)[..., ::-1]  # BGR->RGB
    for force in (False, True):
        loader = FrameLoader([pg, pc], threads=2, force_fallback=force)
        if not force and not loader.native:
            continue
        got_g, got_c = list(loader)
        assert got_g.shape == want_g.shape
        assert got_c.shape == want_c.shape
        # decoders may differ by a few LSB (IDCT variants); keep a loose bound
        assert np.abs(got_g.astype(int) - want_g.astype(int)).max() <= 2
        assert np.abs(got_c.astype(int) - want_c.astype(int)).max() <= 2


def _write_pgm16(path, arr):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n65535\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.astype(">u2").tobytes())


def _write_ppm16(path, arr):
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n65535\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.astype(">u2").tobytes())


@pytest.mark.parametrize("force", [False, True])
def test_u16_pnm_decode(tmp_path, rng, force):
    g = rng.integers(0, 65536, (29, 41), dtype=np.uint16)
    c = rng.integers(0, 65536, (13, 18, 3), dtype=np.uint16)
    pg = tmp_path / "g16.pgm"
    pc = tmp_path / "c16.ppm"
    _write_pgm16(pg, g)
    _write_ppm16(pc, c)
    loader = FrameLoader([pg, pc], threads=2, force_fallback=force)
    if not force and not loader.native:
        pytest.skip("no C++ toolchain available")
    got_g, got_c = list(loader)
    assert got_g.dtype == np.uint16 and np.array_equal(got_g, g)
    assert got_c.dtype == np.uint16 and np.array_equal(got_c, c)


@pytest.mark.parametrize("force", [False, True])
def test_u16_png_decode(tmp_path, rng, force):
    cv2 = pytest.importorskip("cv2")
    g = rng.integers(0, 65536, (21, 33), dtype=np.uint16)
    c = rng.integers(0, 65536, (11, 15, 3), dtype=np.uint16)
    pg = tmp_path / "g16.png"
    pc = tmp_path / "c16.png"
    assert cv2.imwrite(str(pg), g)
    assert cv2.imwrite(str(pc), c)
    loader = FrameLoader([pg, pc], threads=2, force_fallback=force)
    if not force and not loader.native:
        pytest.skip("no C++ toolchain available")
    got_g, got_c = list(loader)
    assert got_g.dtype == np.uint16 and np.array_equal(got_g, g)
    # cv2 wrote BGR; the loader yields the file's natural RGB order
    assert got_c.dtype == np.uint16 and np.array_equal(got_c, c[..., ::-1])


@pytest.mark.parametrize("force", [False, True])
def test_sentinel_error_recovery(tmp_path, rng, force):
    """A corrupt frame mid-stream must not end iteration in sentinel mode."""
    from imageenhancement_mp_tpu.io import FrameError

    good = [rng.integers(0, 256, (8, 9), dtype=np.uint8) for _ in range(3)]
    paths = []
    for i, a in enumerate(good):
        p = tmp_path / f"g{i}.pgm"
        _write_pgm(p, a)
        paths.append(p)
    bad = tmp_path / "bad.pgm"
    bad.write_bytes(b"P5\ngarbage header")
    paths.insert(1, bad)  # g0, bad, g1, g2
    loader = FrameLoader(paths, threads=2, force_fallback=force, on_error="sentinel")
    if not force and not loader.native:
        pytest.skip("no C++ toolchain available")
    got = list(loader)
    assert len(got) == 4
    assert np.array_equal(got[0], good[0])
    assert isinstance(got[1], FrameError) and "bad.pgm" in str(got[1])
    assert np.array_equal(got[2], good[1])
    assert np.array_equal(got[3], good[2])
    # default (raise) mode still raises at the bad frame
    with pytest.raises(IOError):
        list(FrameLoader(paths, threads=2, force_fallback=force))


def test_u16_stream_clahe_end_to_end(tmp_path, rng):
    """16-bit files on disk -> loader -> u16 CLAHE pipeline -> oracle parity."""
    from imageenhancement_mp_tpu import clahe, ref

    frames = [rng.integers(0, 65536, (64, 72), dtype=np.uint16) for _ in range(3)]
    paths = []
    for i, a in enumerate(frames):
        p = tmp_path / f"u{i}.pgm"
        _write_pgm16(p, a)
        paths.append(p)
    for got_in, want_in in zip(FrameLoader(paths, threads=2), frames):
        got = np.asarray(clahe(got_in, 2.0, (4, 4)))
        want = ref.clahe(want_in, 2.0, (4, 4))
        assert got.dtype == np.uint16
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_order_preserved_with_errors_at_scale(tmp_path, rng):
    """32 files, 5 corrupt, 8 threads, sentinel mode: slots stay aligned."""
    from imageenhancement_mp_tpu.io import FrameError

    paths, want = [], []
    bad_idx = {3, 7, 15, 16, 29}
    for i in range(32):
        p = tmp_path / f"s{i:02d}.pgm"
        if i in bad_idx:
            p.write_bytes(b"P5\nbroken")
            want.append(None)
        else:
            a = np.full((6, 7), i, np.uint8)
            _write_pgm(p, a)
            want.append(a)
        paths.append(p)
    for force in (False, True):
        loader = FrameLoader(paths, threads=8, force_fallback=force, on_error="sentinel")
        if not force and not loader.native:
            continue
        got = list(loader)
        assert len(got) == 32
        for i, (g, w) in enumerate(zip(got, want)):
            if w is None:
                assert isinstance(g, FrameError), (force, i)
            else:
                assert np.array_equal(g, w), (force, i)
