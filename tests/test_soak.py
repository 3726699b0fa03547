"""Opt-in soak fuzz: thousands of random (op, params, shape, dtype)
configs, oracle vs cv2 directly.  Run with ``IE_RUN_SOAK=1`` (minutes).

The per-op budgets mirror docs/PARITY.md; any violation prints the full
config for reproduction.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
cv2.setNumThreads(1)

from imageenhancement_mp_tpu import ref

pytestmark = pytest.mark.skipif(
    not os.environ.get("IE_RUN_SOAK"), reason="set IE_RUN_SOAK=1 for the soak tier"
)


def _img(rng, dt, shape):
    if dt is np.float32:
        return (rng.random(shape) * 600 - 150).astype(np.float32)
    lo, hi = (0, 256) if dt is np.uint8 else (
        (0, 65536) if dt is np.uint16 else (-32768, 32768))
    return rng.integers(lo, hi, shape).astype(dt)


def test_soak_oracle_vs_cv2():
    rng = np.random.default_rng(20260817)
    fails = []
    N = int(os.environ.get("IE_SOAK_N", "1500"))
    for trial in range(N):
        H, W = int(rng.integers(8, 96)), int(rng.integers(8, 96))
        op = trial % 21
        try:
            if op == 0:  # gaussian, any k/sigma, u8/u16
                dt = np.uint8 if trial % 2 else np.uint16
                img = _img(rng, dt, (H, W))
                k = int(rng.choice([3, 5, 7, 9, 13, 21]))
                sg = float(rng.choice([0.0, 0.6, 1.5, 3.3, 7.9]))
                d = int(np.abs(ref.gaussian_blur(img, k, sg).astype(np.int64)
                               - cv2.GaussianBlur(img, (k, k), sg).astype(np.int64)).max())
                ok = d == 0
            elif op == 1:  # clahe u8/u16
                dt = np.uint8 if trial % 2 else np.uint16
                img = _img(rng, dt, (H, W))
                clip = float(rng.choice([1.0, 2.0, 4.0, 40.0]))
                g = int(rng.choice([2, 4, 8]))
                want = cv2.createCLAHE(clip, (g, g)).apply(img)
                d = int(np.abs(ref.clahe(img, clip, (g, g)).astype(np.int64)
                               - want.astype(np.int64)).max())
                ok = d <= 1
            elif op == 2:  # equalize
                img = _img(rng, np.uint8, (H, W))
                ok = np.array_equal(ref.equalize_hist(img), cv2.equalizeHist(img))
            elif op == 3:  # normalize any range
                dt = [np.uint8, np.uint16, np.int16][trial % 3]
                img = _img(rng, dt, (H, W))
                a, b = sorted(rng.uniform(-40000, 70000, 2))
                want = cv2.normalize(img, None, a, b, cv2.NORM_MINMAX)
                ok = np.array_equal(ref.contrast_stretch(img, (a, b)), want)
            elif op == 4:  # addWeighted
                dt = [np.uint8, np.uint16, np.int16, np.float32][trial % 4]
                x, y = _img(rng, dt, (H, W)), _img(rng, dt, (H, W))
                al, be, ga = rng.uniform(-4, 4), rng.uniform(-4, 4), rng.uniform(-900, 900)
                ok = np.array_equal(ref.add_weighted(x, al, y, be, ga),
                                    cv2.addWeighted(x, al, y, be, ga))
            elif op == 5:  # median
                dt = [np.uint8, np.uint16, np.int16][trial % 3]
                img = _img(rng, dt, (H, W))
                k = int(rng.choice([3, 5]))
                ok = np.array_equal(ref.median_blur(img, k), cv2.medianBlur(img, k))
            elif op == 6:  # box
                dt = [np.uint8, np.uint16, np.int16][trial % 3]
                img = _img(rng, dt, (H, W))
                kh, kw = int(rng.choice([1, 3, 5, 9])), int(rng.choice([1, 3, 5, 9]))
                want = cv2.blur(img, (kw, kh))
                got = ref.box_blur(img, (kh, kw))
                diff = got.astype(np.int64) != want.astype(np.int64)
                ok = (not diff.any()) or (
                    int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max()) <= 1
                    and all(x >= W - 16 for x in np.argwhere(diff)[:, 1]))
            elif op == 7:  # threshold
                dt = [np.uint8, np.uint16, np.int16][trial % 3]
                img = _img(rng, dt, (H, W))
                typ, flag = [("binary", cv2.THRESH_BINARY), ("trunc", cv2.THRESH_TRUNC),
                             ("tozero_inv", cv2.THRESH_TOZERO_INV)][trial % 3]
                t, mv = rng.uniform(-70000, 70000), rng.uniform(-70000, 70000)
                wr, wd = cv2.threshold(img, t, mv, flag)
                gr, gd = ref.threshold(img, t, mv, typ)
                ok = gr == wr and np.array_equal(gd, wd)
            elif op == 8:  # morphology
                dt = [np.uint8, np.int16][trial % 2]
                img = _img(rng, dt, (H, W))
                mop, flag = [("open", cv2.MORPH_OPEN), ("gradient", cv2.MORPH_GRADIENT),
                             ("blackhat", cv2.MORPH_BLACKHAT)][trial % 3]
                kh, kw = int(rng.integers(1, 6)), int(rng.integers(2, 6))
                want = cv2.morphologyEx(img, flag, np.ones((kh, kw), np.uint8))
                ok = np.array_equal(ref.morphology(img, mop, (kh, kw)), want)
            elif op == 9:  # sobel u8
                img = _img(rng, np.uint8, (H, W))
                dx, dy = [(1, 0), (0, 1), (1, 1), (2, 0)][trial % 4]
                k = int(rng.choice([1, 3, 5, 7, -1]))
                if k == -1 and dx + dy != 1:
                    k = 3
                de = float(rng.uniform(-30, 30))
                want = (cv2.Scharr(img, cv2.CV_16S, dx, dy, delta=de) if k == -1
                        else cv2.Sobel(img, cv2.CV_16S, dx, dy, ksize=k, delta=de))
                ok = np.array_equal(ref.sobel(img, dx, dy, k, 1.0, de), want)
            elif op == 10:  # color conversions u8/u16
                dt = np.uint8 if trial % 2 else np.uint16
                img = _img(rng, dt, (H, W, 3))
                which = trial % 3
                if which == 0:
                    ok = np.array_equal(ref.cvt_gray(img), cv2.cvtColor(img, cv2.COLOR_RGB2GRAY))
                elif which == 1:
                    ok = np.array_equal(ref.rgb_to_ycrcb(img),
                                        cv2.cvtColor(img, cv2.COLOR_RGB2YCrCb))
                else:
                    ok = np.array_equal(ref.ycrcb_to_rgb(img),
                                        cv2.cvtColor(img, cv2.COLOR_YCrCb2RGB))
            elif op == 11:  # pyramids
                dt = [np.uint8, np.uint16, np.int16][trial % 3]
                img = _img(rng, dt, (H, W))
                ok = (np.array_equal(ref.pyr_down(img), cv2.pyrDown(img))
                      and np.array_equal(ref.pyr_up(img), cv2.pyrUp(img)))
            elif op == 12:  # laplacian ksize grid u8
                img = _img(rng, np.uint8, (H, W))
                k = int(rng.choice([1, 3, 5, 7]))
                de = float(rng.uniform(-20, 20)) if k > 1 else 0.0
                want = cv2.Laplacian(img, cv2.CV_16S, ksize=k, delta=de)
                got = ref.laplacian(img, k, de)
                d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
                # fractional deltas: cv2's f32 path can flip .5-razor
                # boundaries ±1 vs our correctly-rounded integers
                ok = d == 0 or (d <= 1 and de != np.round(de))
            elif op == 13:  # resize all modes/dtypes
                dt = [np.uint8, np.uint16, np.int16, np.float32][trial % 4]
                img = _img(rng, dt, (H, W))
                oh, ow = int(rng.integers(1, 96)), int(rng.integers(1, 96))
                interp = ["nearest", "linear", "area", "cubic"][trial % 4]
                da = np.arange(1, oh) * (H / oh); db = np.arange(1, ow) * (W / ow)
                razor = bool(np.any(np.abs(da - np.round(da)) < 1e-9 * np.maximum(da, 1))
                             or np.any(np.abs(db - np.round(db)) < 1e-9 * np.maximum(db, 1)))
                if interp == "cubic":
                    code = cv2.INTER_CUBIC
                    want = cv2.resize(img, (ow, oh), interpolation=code)
                    got = ref.resize(img, (oh, ow), "cubic")
                    if dt is np.float32:
                        tol = 3e-5 * max(1.0, float(np.abs(want).max()))
                        ok = float(np.abs(got - want).max()) <= tol
                    else:
                        ok = int(np.abs(got.astype(np.int64)
                                        - want.astype(np.int64)).max()) <= 1
                elif interp in ("nearest", "area") and razor:
                    ok = True  # documented measure-zero snap zone
                else:
                    code = {"nearest": cv2.INTER_NEAREST, "linear": cv2.INTER_LINEAR,
                            "area": cv2.INTER_AREA}[interp]
                    want = cv2.resize(img, (ow, oh), interpolation=code)
                    got = ref.resize(img, (oh, ow), interp)
                    if dt is np.float32:
                        tol = 2e-5 * max(1.0, float(np.abs(want).max()))
                        ok = float(np.abs(got - want).max()) <= tol
                    else:
                        d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
                        lim = 0 if interp == "nearest" or dt is np.uint8 and interp == "linear" else 1
                        if interp == "area" and H % oh == 0 and W % ow == 0 and H >= oh and W >= ow:
                            lim = 0
                        ok = d <= lim
            elif op == 14:  # warpAffine
                dt = [np.uint8, np.uint16, np.int16, np.float32][trial % 4]
                img = _img(rng, dt, (H, W))
                oh, ow = int(rng.integers(4, 64)), int(rng.integers(4, 64))
                interp, cvf = [("linear", cv2.INTER_LINEAR),
                               ("nearest", cv2.INTER_NEAREST)][trial % 2]
                bmode, cvb = [("constant", cv2.BORDER_CONSTANT),
                              ("replicate", cv2.BORDER_REPLICATE)][(trial // 2) % 2]
                bv = float(rng.integers(0, 120))
                M = np.array([[rng.uniform(0.3, 2), rng.uniform(-0.5, 0.5), rng.uniform(-8, 8)],
                              [rng.uniform(-0.5, 0.5), rng.uniform(0.3, 2), rng.uniform(-8, 8)]])
                want = cv2.warpAffine(img, M, (ow, oh), flags=cvf,
                                      borderMode=cvb, borderValue=bv)
                got = ref.warp_affine(img, M, (oh, ow), interp, bmode, bv)
                ok = np.array_equal(got, want)   # round 3: exact, all dtypes
                # cubic (new 5.0 kernel): u8/u16 exact, i16 razor +-1,
                # f32 fully-outside <=1 ulp (docs/PARITY.md)
                wantc = cv2.warpAffine(img, M, (ow, oh), flags=cv2.INTER_CUBIC,
                                       borderMode=cvb, borderValue=bv)
                gotc = ref.warp_affine(img, M, (oh, ow), "cubic", bmode, bv)
                if dt is np.float32:
                    ok = ok and float(np.abs(gotc - wantc).max()) <= 2e-3
                else:
                    dc = np.abs(gotc.astype(np.int64) - wantc.astype(np.int64))
                    budget = 1 if dt is np.int16 else 0
                    ok = ok and int(dc.max()) <= budget
            elif op == 15:  # remap (round 3: exact, all dtypes)
                dt = [np.uint8, np.uint16, np.int16, np.float32][trial % 4]
                img = _img(rng, dt, (H, W))
                oh, ow = int(rng.integers(4, 64)), int(rng.integers(4, 64))
                interp, cvf = [("linear", cv2.INTER_LINEAR),
                               ("nearest", cv2.INTER_NEAREST)][trial % 2]
                bmode, cvb = [("constant", cv2.BORDER_CONSTANT),
                              ("replicate", cv2.BORDER_REPLICATE)][(trial // 2) % 2]
                bv = float(rng.integers(0, 120))
                mx = (rng.random((oh, ow)) * (W + 4) - 2).astype(np.float32)
                my = (rng.random((oh, ow)) * (H + 4) - 2).astype(np.float32)
                want = cv2.remap(img, mx, my, cvf, borderMode=cvb, borderValue=bv)
                ok = np.array_equal(ref.remap(img, mx, my, interp, bmode, bv), want)
                # cubic rides the same coords: u8 razor ±1, u16/i16 ±1,
                # f32 ~1 ulp of the weight chain (docs/PARITY.md)
                wantc = cv2.remap(img, mx, my, cv2.INTER_CUBIC,
                                  borderMode=cvb, borderValue=bv)
                gotc = ref.remap(img, mx, my, "cubic", bmode, bv)
                if dt is np.float32:
                    ok = ok and float(np.abs(gotc - wantc).max()) <= 2e-3
                else:
                    dc = np.abs(gotc.astype(np.int64) - wantc.astype(np.int64))
                    ok = ok and int(dc.max()) <= 1
                # lanczos4 (quantized tabs): ints +-1, f32 ~1 ulp
                wantl = cv2.remap(img, mx, my, cv2.INTER_LANCZOS4,
                                  borderMode=cvb, borderValue=bv)
                gotl = ref.remap(img, mx, my, "lanczos4", bmode, bv)
                if dt is np.float32:
                    ok = ok and float(np.abs(gotl - wantl).max()) <= 2e-3
                else:
                    dl = np.abs(gotl.astype(np.int64) - wantl.astype(np.int64))
                    ok = ok and int(dl.max()) <= 1
            elif op == 16:  # Lab/XYZ round trips (round 3: exhaustively exact)
                rgb = _img(rng, np.uint8, (H, W, 3))
                code, fn = [
                    (cv2.COLOR_RGB2LAB, lambda a: ref.rgb_to_lab(a)),
                    (cv2.COLOR_LAB2RGB, lambda a: ref.lab_to_rgb(a)),
                    (cv2.COLOR_RGB2XYZ, lambda a: ref.rgb_to_xyz(a)),
                    (cv2.COLOR_XYZ2RGB, lambda a: ref.xyz_to_rgb(a)),
                ][trial % 4]
                ok = np.array_equal(fn(rgb), cv2.cvtColor(rgb, code))
                # Luv (budget tier, docs/PARITY.md): fwd +-1 on <=6%,
                # inverse >1 on <=0.1% of valid-gamut pixels
                wluv = cv2.cvtColor(rgb, cv2.COLOR_RGB2Luv)
                gluv = ref.rgb_to_luv(rgb)
                dluv = np.abs(gluv.astype(np.int64) - wluv.astype(np.int64))
                ok = ok and int(dluv.max()) <= 1 and float((dluv > 0).mean()) <= 0.08
                winv = cv2.cvtColor(wluv, cv2.COLOR_Luv2RGB)
                ginv = ref.luv_to_rgb(wluv)
                dinv = np.abs(ginv.astype(np.int64) - winv.astype(np.int64))
                # dark out-of-gamut triples clamp differently — worst ~20
                # on isolated pixels (40k-config calibration)
                ok = ok and float((dinv > 1).mean()) <= 4e-3 and int(dinv.max()) <= 40
            elif op == 17:  # canny
                img = _img(rng, np.uint8, (H, W))
                t1, t2 = sorted(rng.uniform(5, 300, 2))
                ap = [3, 5, 7][trial % 3]
                L2 = bool((trial // 3) % 2)
                want = cv2.Canny(img, t1, t2, apertureSize=ap, L2gradient=L2)
                ok = np.array_equal(ref.canny(img, t1, t2, ap, L2), want)
            elif op == 18:  # HLS both directions (SIMD-body: wide rows)
                Wb = 64
                rgb = _img(rng, np.uint8, (H, Wb, 3))
                if trial % 2:
                    ok = np.array_equal(ref.rgb_to_hls(rgb),
                                        cv2.cvtColor(rgb, cv2.COLOR_RGB2HLS))
                else:
                    ok = np.array_equal(ref.hls_to_rgb(rgb),
                                        cv2.cvtColor(rgb, cv2.COLOR_HLS2RGB))
            elif op == 19:  # lanczos4 resize (u8 bit-exact; u16/i16 +-1)
                dt = [np.uint8, np.uint16, np.int16][trial % 3]
                img = _img(rng, dt, (H, W))
                oh, ow = int(rng.integers(4, 100)), int(rng.integers(4, 100))
                want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LANCZOS4)
                got = ref.resize(img, (oh, ow), "lanczos4")
                d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
                ok = d == 0 if dt is np.uint8 else d <= 1
            else:  # warpPolar fwd/inv, linear+semilog (non-semilog-inverse exact)
                dt = [np.uint8, np.uint16][trial % 2]
                img = _img(rng, dt, (max(H, 12), max(W, 12)))
                log = bool((trial // 2) % 2)
                inv = bool((trial // 4) % 2)
                cx = float(rng.uniform(3, img.shape[1] - 3))
                cy = float(rng.uniform(3, img.shape[0] - 3))
                mr = float(rng.uniform(6, 50))
                dsz = (int(rng.integers(12, 64)), int(rng.integers(12, 64)))
                flags = (cv2.INTER_LINEAR + cv2.WARP_FILL_OUTLIERS
                         + (cv2.WARP_POLAR_LOG if log else 0)
                         + (cv2.WARP_INVERSE_MAP if inv else 0))
                want = cv2.warpPolar(img, dsz, (cx, cy), mr, flags)
                got = ref.warp_polar(img, dsz, (cx, cy), mr, log, inv)
                d = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
                # INVERSE u16 carries +-1 razor classes: semilog via the
                # log32f build budget, linear via fastAtan2/sqrt razor
                # ties that only the u16 quantization exposes (~0.3% of
                # deep-tail configs, 1-2 px) — docs/PARITY.md
                ok = d == 0 if not (inv and dt is np.uint16) else d <= 1
        except Exception as e:  # pragma: no cover - soak diagnostics
            fails.append((trial, op, f"EXC {e}"))
            continue
        if not ok:
            fails.append((trial, op, (H, W)))
    assert not fails, fails[:20]
