"""Black-box pin of cv2.createTonemapMantiuk (VERDICT r05 item 9).

Strategy: implement the full gradient-domain operator in NumPy f32 and
fit the ambiguous details (level count, gradient/adjoint conventions,
resize pairing, CG arithmetic) against cv2 5.0.0 end-to-end on small
images — the 100-iteration CG amplifies any mismatch, so agreement at
f32 noise level is a strong pin.
"""

import itertools
import numpy as np
import cv2

cv2.setNumThreads(1)


def grad_x(a, pos):
    d = np.zeros_like(a)
    if pos == 0:
        d[:, :-1] = a[:, 1:] - a[:, :-1]
    else:
        d[:, 1:] = a[:, 1:] - a[:, :-1]
    return d


def get_contrast(log_img, levels, resize_flag):
    xs, ys = [], []
    layer = log_img.copy()
    for _ in range(levels):
        xs.append(grad_x(layer, 0))
        ys.append(grad_x(layer.T, 0).T)
        layer = cv2.resize(layer, (layer.shape[1] // 2, layer.shape[0] // 2),
                           interpolation=resize_flag)
    return xs, ys


def calculate_sum(xs, ys, resize_flag):
    s = np.zeros_like(xs[-1])
    for i in range(len(xs) - 1, -1, -1):
        gx = grad_x(xs[i], 1)
        gy = grad_x(ys[i].T, 1).T
        s = cv2.resize(s, (xs[i].shape[1], xs[i].shape[0]),
                       interpolation=resize_flag)
        s = s + gx + gy
    return s


def signed_pow(x, p):
    return np.sign(x) * np.abs(x, dtype=np.float32) ** np.float32(p)


def map_contrast(c, scale):
    rp = np.float32(0.4185)
    c = signed_pow(c, rp)
    c = c * np.float32(scale)
    return signed_pow(c, 1.0 / rp).astype(np.float32)


def mantiuk(src, gamma, scale, saturation, levels_law, resize_flag):
    mn, mx = float(src.min()), float(src.max())
    img = ((src - mn) / (mx - mn)).astype(np.float32) if mx > mn else src * 0
    gray = (img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
            ).astype(np.float32)
    log_img = np.log(np.maximum(gray, 1e-4).astype(np.float32)).astype(np.float32)
    H, W = gray.shape
    if levels_law == "log2min":
        levels = int(np.log(min(H, W)) / np.log(2.0))
    else:
        levels = int(np.log(min(H, W)) / np.log(2.0)) - 1
    levels = max(levels, 1)

    xs, ys = get_contrast(log_img, levels, resize_flag)
    xs = [map_contrast(c, scale) for c in xs]
    ys = [map_contrast(c, scale) for c in ys]
    right = calculate_sum(xs, ys, resize_flag)

    def A(v):
        xs2, ys2 = get_contrast(v, levels, resize_flag)
        return calculate_sum(xs2, ys2, resize_flag)

    x = log_img.copy()
    r = right - A(x)
    p = r.copy()
    target = float(np.float64(right.ravel().astype(np.float64) @ right.ravel().astype(np.float64))) * 1e-6
    rr = float(np.float64(r.ravel().astype(np.float64) @ r.ravel().astype(np.float64)))
    for _ in range(100):
        prod = A(p)
        dprod = float(np.float64(p.ravel().astype(np.float64) @ prod.ravel().astype(np.float64)))
        if dprod == 0:
            break
        alpha = np.float32(rr / dprod)
        r = (r - alpha * prod).astype(np.float32)
        x = (x + alpha * p).astype(np.float32)
        nrr = float(np.float64(r.ravel().astype(np.float64) @ r.ravel().astype(np.float64)))
        if nrr < target:
            break
        beta = np.float32(nrr / rr)
        p = (r + beta * p).astype(np.float32)
        rr = nrr
    new_gray = np.exp(x).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(gray[..., None] > 0, img / gray[..., None], 0).astype(np.float32)
    dst = signed_pow(ratio, saturation) * new_gray[..., None]
    return np.power(np.maximum(dst, 0), 1.0 / gamma).astype(np.float32)


def run():
    rng = np.random.default_rng(1)
    for shape in [(8, 8), (16, 16), (16, 24)]:
        src = (rng.random(shape + (3,)).astype(np.float32) * 5 + 0.02).astype(np.float32)
        tm = cv2.createTonemapMantiuk(1.0, 0.7, 1.0)
        got = tm.process(src)
        best = None
        for law, rf in itertools.product(
            ("log2min", "log2min-1"),
            (cv2.INTER_LINEAR, cv2.INTER_AREA, cv2.INTER_NEAREST),
        ):
            cand = mantiuk(src, 1.0, 0.7, 1.0, law, rf)
            corr = np.corrcoef(got.ravel(), cand.ravel())[0, 1]
            md = float(np.abs(got - cand).max())
            if best is None or corr > best[0]:
                best = (corr, md, law, rf)
        print(shape, "best:", best)


if __name__ == "__main__":
    run()
