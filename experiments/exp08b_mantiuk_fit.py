"""Mantiuk fit round 2: with the final minmax+gamma normalization pinned,
grid-search the residual details on several sizes (incl. odd)."""

import itertools
import numpy as np
import cv2

cv2.setNumThreads(1)


def grad(a, pos, sign):
    d = np.zeros_like(a)
    if pos == 0:
        d[:, :-1] = a[:, 1:] - a[:, :-1]
    else:
        d[:, 1:] = (a[:, 1:] - a[:, :-1]) * sign
    return d


def signed_pow(x, p):
    return (np.sign(x) * np.abs(x, dtype=np.float32) ** np.float32(p)).astype(np.float32)


def map_contrast(c, scale):
    rp = np.float32(0.4185)
    return signed_pow(signed_pow(c, rp) * np.float32(scale), 1.0 / rp)


def mantiuk(src, gamma, scale, saturation, *, off, rd, ru, sg, iters=100):
    mn, mx = float(src.min()), float(src.max())
    img = ((src - mn) / (mx - mn)).astype(np.float32)
    gray = (img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114).astype(np.float32)
    log_img = np.log(np.maximum(gray, 1e-4).astype(np.float32)).astype(np.float32)
    H, W = gray.shape
    levels = max(int(np.log(min(H, W)) / np.log(2.0)) + off, 1)

    def get_contrast(v):
        xs, ys = [], []
        layer = v.copy()
        for _ in range(levels):
            xs.append(grad(layer, 0, 1.0))
            ys.append(grad(layer.T, 0, 1.0).T)
            layer = cv2.resize(layer, (layer.shape[1] // 2, layer.shape[0] // 2),
                               interpolation=rd)
        return xs, ys

    def calculate_sum(xs, ys):
        s = np.zeros_like(xs[-1])
        for i in range(len(xs) - 1, -1, -1):
            s = cv2.resize(s, (xs[i].shape[1], xs[i].shape[0]), interpolation=ru)
            s = s + grad(xs[i], 1, sg) + grad(ys[i].T, 1, sg).T
        return s

    def A(v):
        a, b = get_contrast(v)
        return calculate_sum(a, b)

    xs, ys = get_contrast(log_img)
    xs = [map_contrast(c, scale) for c in xs]
    ys = [map_contrast(c, scale) for c in ys]
    right = calculate_sum(xs, ys)
    x = log_img.copy()
    r = (right - A(x)).astype(np.float32)
    p = r.copy()
    f64 = lambda a, b: float(a.ravel().astype(np.float64) @ b.ravel().astype(np.float64))
    target = f64(right, right) * 1e-6
    rr = f64(r, r)
    for _ in range(iters):
        prod = A(p)
        dp = f64(p, prod)
        if dp == 0:
            break
        al = np.float32(rr / dp)
        r = (r - al * prod).astype(np.float32)
        x = (x + al * p).astype(np.float32)
        nrr = f64(r, r)
        if nrr < target:
            break
        p = (r + np.float32(nrr / rr) * p).astype(np.float32)
        rr = nrr
    new_gray = np.exp(x).astype(np.float32)
    ratio = (img / np.maximum(gray[..., None], 1e-30)).astype(np.float32)
    dst = signed_pow(ratio, saturation) * new_gray[..., None]
    dmn, dmx = float(dst.min()), float(dst.max())
    dst = ((dst - dmn) / (dmx - dmn)).astype(np.float32)
    return np.power(dst, 1.0 / gamma).astype(np.float32)


def run():
    rng = np.random.default_rng(1)
    for shape in [(20, 12), (16, 24), (25, 19), (33, 47)]:
        src = (rng.random(shape + (3,)).astype(np.float32) * 5 + 0.02).astype(np.float32)
        got = cv2.createTonemapMantiuk(1.0, 0.7, 1.0).process(src)
        results = []
        for off, rd, ru, sg in itertools.product(
            (-1, 0),
            (cv2.INTER_LINEAR, cv2.INTER_AREA),
            (cv2.INTER_LINEAR, cv2.INTER_NEAREST),
            (1.0, -1.0),
        ):
            cand = mantiuk(src, 1.0, 0.7, 1.0, off=off, rd=rd, ru=ru, sg=sg)
            if np.isnan(cand).any():
                continue
            md = float(np.abs(got - cand).max())
            results.append((md, off, rd, ru, sg))
        results.sort()
        print(shape, "best:", results[:3])


if __name__ == "__main__":
    run()
