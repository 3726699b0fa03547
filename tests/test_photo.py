"""cv2.photo domain-transform family parity (docs/PARITY.md):
edgePreservingFilter RECURS bit-exact (rare powf-ulp ±1); NORMCONV ±1
on ~3 % px; detailEnhance ±3 (the analytic-vs-interpolated f32 Lab
deviation); stylization ±1."""

import numpy as np

from detseed import seed
import pytest

import jax.numpy as jnp

import imageenhancement_mp_tpu as ie
from imageenhancement_mp_tpu import ref

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)


def _img(rng, h, w):
    base = rng.integers(0, 256, (h, w, 3)).astype(np.float64)
    return np.clip(base * 0.6 + rng.normal(80, 40, (h, w, 3)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("flags,cvflag,budget,frac", [
    ("recursive", 1, 1, 0.001),   # bit-exact up to rare powf-ulp px
    ("normconv", 2, 1, 0.05),
])
def test_epf_ref_vs_cv2(flags, cvflag, budget, frac):
    rng = np.random.default_rng(seed("epf", flags))
    for t in range(6):
        img = _img(rng, int(rng.integers(14, 64)), int(rng.integers(14, 64)))
        ss = float(rng.uniform(8, 160))
        sr = float(rng.uniform(0.05, 0.8))
        want = cv2.edgePreservingFilter(img, flags=cvflag, sigma_s=ss, sigma_r=sr)
        got = ref.edge_preserving_filter(img, flags, ss, sr)
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.max() <= budget, (t, ss, sr, int(d.max()))
        assert (d > 0).mean() <= frac, (t, ss, sr, float((d > 0).mean()))


def test_detail_enhance_ref_vs_cv2():
    rng = np.random.default_rng(seed("detail"))
    for t in range(4):
        img = _img(rng, int(rng.integers(16, 56)), int(rng.integers(16, 56)))
        ss = float(rng.uniform(5, 60))
        sr = float(rng.uniform(0.05, 0.4))
        want = cv2.detailEnhance(img, sigma_s=ss, sigma_r=sr)
        got = ref.detail_enhance(img, ss, sr, order="bgr")
        d = np.abs(got.astype(int) - want.astype(int))
        # the ±3 is entirely the analytic-vs-interpolated f32 Lab legs
        assert d.max() <= 4, (t, ss, sr, int(d.max()))


def test_stylization_ref_vs_cv2():
    rng = np.random.default_rng(seed("styl"))
    for t in range(4):
        img = _img(rng, int(rng.integers(16, 56)), int(rng.integers(16, 56)))
        ss = float(rng.uniform(20, 150))
        sr = float(rng.uniform(0.1, 0.6))
        want = cv2.stylization(img, sigma_s=ss, sigma_r=sr)
        got = ref.stylization(img, ss, sr)
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.max() <= 1, (t, ss, sr, int(d.max()))
        assert (d > 0).mean() <= 0.02


def test_pencil_sketch_ref_vs_cv2():
    """gray bit-exact; color exact off cv2's scalar row tail (the last
    W mod 8 px, where cv2 double-rounds instead of FMA-ing — the
    HLS/HSV tail budget class, ±1 build-dependent)."""
    rng = np.random.default_rng(seed("pencil"))
    for t in range(12):
        h, w = int(rng.integers(2, 90)), int(rng.integers(2, 90))
        if t % 4 == 0:
            img = np.zeros((h, w, 3), np.uint8)
            img[h // 2:, w // 2:] = 255
        else:
            img = _img(rng, h, w)
        if t % 3 == 0:
            ss, sr, sf = 60.0, 0.07, 0.02
        else:
            ss = float(rng.uniform(1, 150))
            sr = float(rng.uniform(0.01, 0.9))
            sf = float(rng.uniform(0.0, 0.25))
        want_g, want_c = cv2.pencilSketch(img, sigma_s=ss, sigma_r=sr,
                                          shade_factor=sf)
        got_g, got_c = ref.pencil_sketch(img, ss, sr, sf, order="bgr")
        assert np.array_equal(got_g, want_g), (t, h, w, ss, sr, sf)
        dc = np.abs(got_c.astype(int) - want_c.astype(int))
        assert dc.max() <= 1, (t, h, w, ss, sr, sf, int(dc.max()))
        body = dc[:, :w - (w % 8)]
        assert body.max() == 0, (t, h, w, ss, sr, sf)


def test_pencil_sketch_device_vs_oracle():
    rng = np.random.default_rng(seed("pencildev"))
    img = _img(rng, 41, 37)
    got_g, got_c = ie.pencil_sketch(jnp.asarray(img), 60.0, 0.07, 0.02)
    want_g, want_c = ref.pencil_sketch(img, 60.0, 0.07, 0.02)
    assert np.array_equal(np.asarray(got_g), want_g)
    assert np.array_equal(np.asarray(got_c), want_c)
    got_g, got_c = ie.pencil_sketch(jnp.asarray(img), 23.0, 0.31, 0.11,
                                    order="bgr")
    want_g, want_c = ref.pencil_sketch(img, 23.0, 0.31, 0.11, order="bgr")
    assert np.array_equal(np.asarray(got_g), want_g)
    assert np.array_equal(np.asarray(got_c), want_c)
    # batched path keeps per-frame results identical
    two = np.stack([img, img[::-1, ::-1].copy()])
    got_g, got_c = ie.pencil_sketch(jnp.asarray(two))
    for i in range(2):
        wg, wc = ref.pencil_sketch(two[i])
        assert np.array_equal(np.asarray(got_g[i]), wg)
        assert np.array_equal(np.asarray(got_c[i]), wc)


def test_pencil_sketch_rejects():
    with pytest.raises(TypeError):
        ie.pencil_sketch(jnp.zeros((8, 8, 3), jnp.float32))
    with pytest.raises(ValueError):
        ie.pencil_sketch(jnp.zeros((8, 8), jnp.uint8))
    with pytest.raises(ValueError):
        ie.pencil_sketch(jnp.zeros((8, 8, 3), jnp.uint8), order="bogus")


def test_device_vs_oracle():
    rng = np.random.default_rng(seed("photodev"))
    img = _img(rng, 30, 34)
    # RF: the lax.scan chain replays the oracle's f32 sequence
    got = np.asarray(ie.edge_preserving_filter(jnp.asarray(img), "recursive",
                                               55.0, 0.35))
    want = ref.edge_preserving_filter(img, "recursive", 55.0, 0.35)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1
    # NC: XLA's tree cumsum vs numpy's sequential cumsum is ±1-class
    got = np.asarray(ie.edge_preserving_filter(jnp.asarray(img), "normconv",
                                               55.0, 0.35))
    want = ref.edge_preserving_filter(img, "normconv", 55.0, 0.35)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1
    got = np.asarray(ie.detail_enhance(jnp.asarray(img), 10.0, 0.15))
    want = ref.detail_enhance(img, 10.0, 0.15)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1
    got = np.asarray(ie.stylization(jnp.asarray(img), 60.0, 0.45))
    want = ref.stylization(img, 60.0, 0.45)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1
    # batched path keeps per-frame results identical
    two = np.stack([img, img[::-1].copy()])
    got2 = np.asarray(ie.edge_preserving_filter(jnp.asarray(two), "recursive",
                                                55.0, 0.35))
    ref_each = np.stack([ref.edge_preserving_filter(two[i], "recursive",
                                                    55.0, 0.35)
                         for i in range(2)])
    assert int(np.abs(got2.astype(int) - ref_each.astype(int)).max()) <= 1


def test_rejects():
    with pytest.raises(TypeError):
        ie.edge_preserving_filter(jnp.zeros((8, 8, 3), jnp.uint16))
    with pytest.raises(ValueError):
        ie.edge_preserving_filter(jnp.zeros((8, 8, 3), jnp.uint8), "bogus")
    with pytest.raises(ValueError):
        ie.detail_enhance(jnp.zeros((8, 8), jnp.uint8))
    with pytest.raises(TypeError):
        ie.stylization(jnp.zeros((8, 8, 3), jnp.float32))


def test_merge_mertens_vs_cv2():
    rng = np.random.default_rng(seed("mertens"))
    for t in range(3):
        H, W = int(rng.integers(24, 64)), int(rng.integers(24, 64))
        base = np.clip(rng.normal(128, 60, (H, W, 3)), 0, 255)
        n = int(rng.integers(2, 5))
        frames = [np.clip(base * s + rng.normal(0, 6, base.shape), 0, 255)
                  .astype(np.uint8) for s in np.linspace(0.3, 2.0, n)]
        want = cv2.createMergeMertens().process(frames)
        got_ref = ref.merge_mertens(frames)
        got_dev = np.asarray(ie.merge_mertens(frames))
        assert float(np.abs(got_ref - want).max()) <= 1e-4
        assert float(np.abs(got_dev - want).max()) <= 1e-4
    # custom weight exponents
    want = cv2.createMergeMertens(0.5, 2.0, 1.0).process(frames)
    got = np.asarray(ie.merge_mertens(frames, 0.5, 2.0, 1.0))
    assert float(np.abs(got - want).max()) <= 1e-4


def test_merge_mertens_rejects():
    with pytest.raises(TypeError):
        ie.merge_mertens(jnp.zeros((3, 16, 16, 3), jnp.float32))
    with pytest.raises(ValueError):
        ie.merge_mertens(jnp.zeros((16, 16, 3), jnp.uint8))


def test_tonemap_vs_cv2():
    rng = np.random.default_rng(seed("tonemap"))
    hdr = (rng.random((20, 22, 3)).astype(np.float32) * 8.0 + 0.01).astype(np.float32)
    for g in (1.0, 2.2, 0.7):
        want = cv2.createTonemap(g).process(hdr)
        got_ref = ref.tonemap(hdr, g)
        got_dev = np.asarray(ie.tonemap(jnp.asarray(hdr), g))
        m = ~np.isnan(want)   # cv2 emits NaN at its 0/0 corner
        assert float(np.abs(got_ref[m] - want[m]).max()) <= 5e-5
        assert float(np.abs(got_dev[m] - want[m]).max()) <= 5e-5
    assert np.all(np.asarray(ie.tonemap(jnp.ones((4, 4, 3), jnp.float32))) == 0)


def test_align_mtb_vs_cv2():
    rng = np.random.default_rng(seed("alignmtb"))
    for trial in range(3):
        H, W = int(rng.integers(260, 420)), int(rng.integers(260, 420))
        big = cv2.GaussianBlur(rng.integers(0, 256, (H, W)).astype(np.uint8),
                               (0, 0), float(rng.uniform(1.0, 3.0)))
        big3 = np.dstack([np.roll(big, k, 1) for k in range(3)])
        frames = []
        for s in (-5, 0, 4):
            dy, dx = int(rng.integers(-6, 7)), int(rng.integers(-6, 7))
            frames.append(np.clip(
                big3[15 + dy:H - 15 + dy, 15 + dx:W - 15 + dx].astype(float)
                * np.exp(s * 0.2), 0, 255).astype(np.uint8))
        amtb = cv2.createAlignMTB()
        dst = [f.copy() for f in frames]
        amtb.process(frames, dst)
        got = ie.align_mtb(frames, cut=False)
        assert all(np.array_equal(a, b) for a, b in zip(dst, got))
        # shift law directly
        g0 = cv2.cvtColor(frames[1], cv2.COLOR_RGB2GRAY)
        g1 = cv2.cvtColor(frames[2], cv2.COLOR_RGB2GRAY)
        assert ref.calculate_shift_mtb(g0, g1) == tuple(amtb.calculateShift(g0, g1))
    # the aligned-stack -> fusion flow end-to-end
    fused = np.asarray(ie.merge_mertens(np.stack(ie.align_mtb(frames))))
    assert fused.ndim == 3 and fused.shape[-1] == 3


def test_merge_debevec_vs_cv2():
    rng = np.random.default_rng(seed("debevec"))
    for t in range(3):
        H, W = int(rng.integers(16, 64)), int(rng.integers(16, 64))
        base = np.clip(rng.normal(120, 70, (H, W, 3)), 0, 255)
        n = int(rng.integers(2, 5))
        times = np.sort(rng.uniform(0.01, 2.0, n)).astype(np.float32)
        frames = [np.clip(base * (tt * 3) + rng.normal(0, 4, base.shape),
                          0, 255).astype(np.uint8) for tt in times]
        want = cv2.createMergeDebevec().process(frames, times)
        got_ref = ref.merge_debevec(frames, times)
        got_dev = np.asarray(ie.merge_debevec(frames, times))
        for got in (got_ref, got_dev):
            rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-4)
            assert float(rel.max()) <= 1e-4
    with pytest.raises(ValueError):
        ie.merge_debevec(jnp.zeros((2, 8, 8, 3), jnp.uint8), [0.1])


def test_calibrate_debevec_vs_cv2():
    rng = np.random.default_rng(seed("caldeb"))
    H, W = 96, 120
    base = np.clip(rng.normal(120, 70, (H, W, 3)), 0, 255)
    times = np.array([0.05, 0.2, 0.8, 1.4], np.float32)
    frames = [np.clip(base * (t * 4) + rng.normal(0, 3, base.shape),
                      0, 255).astype(np.uint8) for t in times]
    want = cv2.createCalibrateDebevec().process(frames, times)
    got = ref.calibrate_debevec(frames, times)
    # sampled bins track cv2 within a few percent; unsampled extreme
    # bins are null-space (docs) — compare the central response range
    rel = np.abs(got[30:226] - want[30:226]) / np.maximum(np.abs(want[30:226]), 1e-6)
    assert float(rel.max()) <= 0.05, float(rel.max())


def test_tonemap_reinhard_vs_cv2():
    """Pinned ~2e-7 (docs/PARITY.md): normalize -> gray -> log stats ->
    adaptation map -> renormalize -> gamma."""
    rng = np.random.default_rng(seed("reinhard"))
    for t in range(10):
        hdr = (rng.random((16 + t, 21, 3)).astype(np.float32)
               * float(rng.uniform(0.5, 40)) + float(rng.uniform(0, 0.1)))
        g = float(rng.choice([1.0, 1.5, 2.2]))
        i = float(rng.uniform(-4, 4))
        l = float(rng.uniform(0, 1))
        c = float(rng.uniform(0, 1))
        want = cv2.createTonemapReinhard(g, i, l, c).process(hdr)
        got = ref.tonemap_reinhard(hdr, g, i, l, c)
        m = np.isfinite(want) & np.isfinite(got)
        assert float(np.abs(got[m] - want[m]).max()) <= 1e-5, (t, g, i, l, c)


def test_tonemap_drago_vs_cv2():
    """Structure exact; the global-min pixel's normalize residue sign is
    build-dependent (cv2's fractional pow NaNs negative residues) — when
    it flips, the renormalization constants shift.  The affine-refit
    residual proves the law either way (docs/PARITY.md)."""
    rng = np.random.default_rng(seed("drago"))
    for t in range(10):
        hdr = (rng.random((16 + t, 21, 3)).astype(np.float32)
               * float(rng.uniform(0.5, 40)) + float(rng.uniform(0, 0.1)))
        g = float(rng.choice([1.0, 1.5, 2.2]))
        s = float(rng.choice([0.6, 1.0, 1.3]))
        b = float(rng.uniform(0.3, 0.99))
        want = cv2.createTonemapDrago(g, s, b).process(hdr)
        got = ref.tonemap_drago(hdr, g, s, b)
        m = np.isfinite(want) & np.isfinite(got)
        d = float(np.abs(got[m] - want[m]).max())
        if d <= 1e-5:
            continue
        # residue-sign flip: undo the gamma, refit the affine
        # normalization, and require the law residual to vanish
        x = np.power(want[m].astype(np.float64), g)
        y = np.power(got[m].astype(np.float64), g)
        i1, i2 = np.argmin(x), np.argmax(x)
        a = (y[i2] - y[i1]) / max(x[i2] - x[i1], 1e-30)
        resid = np.abs(a * x + (y[i1] - a * x[i1]) - y).max()
        assert resid <= 1e-5, (t, g, s, b, d, resid)


def test_tonemap_mantiuk_vs_cv2():
    """cv2's gradient-domain CG reduced to its closed form (the contrast
    response map is linear: signedPow(signedPow(c,p)·s, 1/p) = c·s^(1/p)
    — ref/ops.py tonemap_mantiuk).  Budget = cv2's own CG stopping
    tolerance (target_error 1e-3 relative, amplified by pow(1/gamma))."""
    rng = np.random.default_rng(seed("mantiuk"))
    for t in range(10):
        hdr = (rng.random((16 + t, 21 + (t % 3), 3)).astype(np.float32)
               * float(rng.uniform(0.5, 40)) + float(rng.uniform(0, 0.1)))
        g = float(rng.choice([1.0, 1.5, 2.2]))
        s = float(rng.uniform(0.55, 1.4))
        sat = float(rng.uniform(0.4, 1.8))
        want = cv2.createTonemapMantiuk(g, s, sat).process(hdr)
        got = ref.tonemap_mantiuk(hdr, g, s, sat)
        m = np.isfinite(want) & np.isfinite(got)
        assert float(np.abs(got[m] - want[m]).max()) <= 8e-3, (t, g, s, sat)
        # cv2's fractional pow NaNs isolated pixels (negative normalize
        # residues); the closed form stays finite
        assert m.mean() > 0.99


def test_tonemap_mantiuk_constant_raises():
    import pytest as _pytest

    cst = np.full((8, 8, 3), 2.5, np.float32)
    with _pytest.raises(ValueError):
        ref.tonemap_mantiuk(cst)


def test_tonemap_device_vs_oracle():
    rng = np.random.default_rng(seed("tonemapdev"))
    hdr = (rng.random((19, 23, 3)).astype(np.float32) * 12.0 + 0.01)
    for fn_d, fn_r, kw in (
        (ie.tonemap_reinhard, ref.tonemap_reinhard,
         dict(gamma=2.2, intensity=0.5, light_adapt=0.8, color_adapt=0.4)),
        (ie.tonemap_drago, ref.tonemap_drago,
         dict(gamma=1.5, saturation=1.2, bias=0.9)),
        (ie.tonemap_mantiuk, ref.tonemap_mantiuk,
         dict(gamma=1.5, scale=0.8, saturation=1.2)),
    ):
        got = np.asarray(fn_d(jnp.asarray(hdr), **kw))
        want = fn_r(hdr, **kw)
        m = np.isfinite(want) & np.isfinite(got)
        # XLA's f32 transcendentals differ from libm by ulps; the
        # normalize constants tier adds ~2e-7
        assert float(np.abs(got[m] - want[m]).max()) <= 5e-5
        assert m.mean() > 0.999


def test_denoise_tvl1_vs_cv2():
    """Primal-dual TV-L1 (docs/PARITY.md): bit-exact modulo a
    single-pixel razor class (exact .5 output boundaries)."""
    rng = np.random.default_rng(seed("tvl1"))
    for t in range(8):
        H, W = int(rng.integers(8, 60)), int(rng.integers(8, 60))
        K = int(rng.integers(1, 4))
        obs = [np.clip(rng.normal(128, 40, (H, W)), 0, 255).astype(np.uint8)
               for _ in range(K)]
        lam = float(rng.uniform(0.3, 2.5))
        it = int(rng.integers(2, 50))
        want = np.zeros((H, W), np.uint8)
        cv2.denoise_TVL1(obs, want, lam, it)
        got = ref.denoise_tvl1(obs, lam, it)
        d = np.abs(got.astype(np.int64) - want.astype(np.int64))
        assert int(d.max()) <= 1 and int((d > 0).sum()) <= 2, (t, H, W, K, lam, it)
        dev = np.asarray(ie.denoise_tvl1(obs, lam, it))
        dd = np.abs(dev.astype(np.int64) - got.astype(np.int64))
        assert int(dd.max()) <= 1, (t, "device")


def test_denoise_tvl1_rejects():
    with pytest.raises(TypeError):
        ie.denoise_tvl1([np.zeros((4, 4), np.uint16)])
    with pytest.raises(ValueError):
        ie.denoise_tvl1([np.zeros((4, 4), np.uint8)], lam=0.0)


def test_decolor_vs_cv2():
    """Lu/Xu/Jia decolorization (docs/PARITY.md): gray +-1 on <=5% px
    (the analytic f32 Lab leg in the contrast target); boost bit-exact
    given the gray."""
    rng = np.random.default_rng(seed("decolor"))
    for t in range(4):
        H, W = int(rng.integers(30, 300)), int(rng.integers(30, 300))
        base = rng.normal(128, 60, (max(H // 8, 2), max(W // 8, 2), 3))
        img = np.clip(cv2.resize(base, (W, H), interpolation=cv2.INTER_CUBIC)
                      + rng.normal(0, 8, (H, W, 3)), 0, 255).astype(np.uint8)
        want_g, want_b = cv2.decolor(img)
        got_g, got_b = ref.decolor(img, order="bgr")
        dg = np.abs(got_g.astype(np.int64) - want_g.astype(np.int64))
        assert int(dg.max()) <= 1 and float((dg > 0).mean()) <= 0.08, t
        db = np.abs(got_b.astype(np.int64) - want_b.astype(np.int64))
        assert int(db.max()) <= 8, t
        # device f32 polynomial vs the f64 oracle: razor +-1, which the
        # Lab boost roundtrip can amplify a few LSB
        dev_g, dev_b = ie.decolor(img, order="bgr")
        assert int(np.abs(np.asarray(dev_g).astype(np.int64)
                          - got_g.astype(np.int64)).max()) <= 1, t
        assert int(np.abs(np.asarray(dev_b).astype(np.int64)
                          - got_b.astype(np.int64)).max()) <= 8, t


def test_decolor_rejects():
    with pytest.raises(TypeError):
        ie.decolor(np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError):
        ie.decolor(np.zeros((8, 8, 3), np.uint8), order="hsv")
