"""Device-side scalar statistics: psnr / norm / meanStdDev / minMaxLoc /
image moments as jitted, batched reductions that return DEVICE scalars.

VERDICT r03 item 5: the host f64 helpers in ``ref/ops.py`` force a
device→host fetch, and on the tunneled platform the first d2h permanently
degrades every later dispatch (docs/DESIGN.md §9 "d2h poison") — a host
``psnr`` inside a streaming loop destroys throughput.  These versions keep
everything on device; the caller fetches (or keeps accumulating) when the
pipeline is done.  The host forms remain the oracles.

Precision model (docs/PARITY.md evaluation-order class):

* All pixel sums run in **double-float** (two-f32 compensated pairs,
  ``utils/fma.py`` — no f64 on TPU): integer-valued sums below ~2^48 are
  EXACT (u8 L1/L2², u8/u16 means, diff² sums for PSNR, low-order moments);
  general f32 sums land within ~2^-45 relative.
* The final completion ops (divide, sqrt, log10) round ONCE to f32, so
  returned scalars are within ~1e-6 relative of the f64 host oracle.
  Exactness lives in the sums, certified by ``tests/test_stats.py``
  comparing ``hi + lo`` (f64 on host) against the exact oracle sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imageenhancement_mp_tpu.utils.fma import (
    df_add, df_div, df_mul, df_sqrt, two_prod,
)

__all__ = [
    "df_sum",
    "norm_planes",
    "psnr_planes",
    "mean_std_dev_planes",
    "min_max_loc_plane",
    "moments_plane",
    "MOMENT_KEYS",
]


def df_sum(hi: jnp.ndarray, lo: jnp.ndarray):
    """Compensated pairwise-tree sum of double-float values over the LAST
    axis → 0-d (or batched) df pair.  Exact for integer-valued inputs whose
    total stays under ~2^48."""
    n = hi.shape[-1]
    while n > 1:
        if n % 2:
            zh = jnp.zeros_like(hi[..., :1])
            hi = jnp.concatenate([hi, zh], axis=-1)
            lo = jnp.concatenate([lo, zh], axis=-1)
        hi, lo = df_add(hi[..., 0::2], lo[..., 0::2], hi[..., 1::2], lo[..., 1::2])
        n = hi.shape[-1]
    return hi[..., 0], lo[..., 0]


def _flat2(planes: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] → [B, H·W] f32 (terms exact for u8/u16/i16 inputs)."""
    b = planes.shape[0]
    return planes.reshape(b, -1).astype(jnp.float32)


def norm_planes(planes: jnp.ndarray, norm_type: str = "l2", other=None):
    """``cv2.norm`` per plane over ``[B, H, W]`` → ``[B]`` f32 device array
    (``other`` given = norm of the difference, like ``cv2.norm(a, b)``).

    l1/l2: double-float sums (u8 exact; u16/f32 ≤ ~2^-45 relative), one
    f32 rounding at the sqrt.  inf: exact max."""
    x = _flat2(planes)
    if other is not None:
        x = x - _flat2(other)  # exact in f32 for integer inputs
    if norm_type == "inf":
        return jnp.max(jnp.abs(x), axis=-1)
    if norm_type == "l1":
        h, l = df_sum(jnp.abs(x), jnp.zeros_like(x))
        return h + l
    if norm_type == "l2":
        p, e = two_prod(x, x)
        h, l = df_sum(p, e)
        return jnp.sqrt(h + l)
    raise ValueError(f"unknown norm {norm_type!r} (l1|l2|inf)")


def psnr_planes(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 255.0):
    """``cv2.PSNR`` over the whole ``[B, H, W]`` batch → 0-d f32 device
    scalar (``inf`` on identical inputs, like cv2).  The squared-error sum
    is exact (df) for u8/u16; the final log10 rounds once to f32."""
    d = _flat2(a).reshape(1, -1) - _flat2(b).reshape(1, -1)
    p, e = two_prod(d, d)
    h, l = df_sum(p, e)
    mse = ((h + l) / d.shape[-1])[0]
    r2 = jnp.float32(float(max_val) * float(max_val))
    return jnp.where(
        mse == 0, jnp.float32(jnp.inf), 10.0 * jnp.log10(r2 / mse)
    )


def mean_std_dev_planes(planes: jnp.ndarray):
    """``cv2.meanStdDev`` per plane → ``([B], [B])`` f32 device arrays
    (population std).  Pixel and pixel² sums are exact df for u8/u16;
    mean/variance completion rounds once to f32."""
    x = _flat2(planes)
    n = jnp.float32(x.shape[-1])
    sh, sl = df_sum(x, jnp.zeros_like(x))
    p, e = two_prod(x, x)
    qh, ql = df_sum(p, e)
    # var = (Σx² − (Σx)²/n) / n in df: keeps the cancellation exact for
    # integer sums (the classic f32 two-pass failure mode)
    s2h, s2l = df_mul(sh, sl, sh, sl)
    mh, ml = df_mul(s2h, s2l, jnp.float32(-1.0) / n, jnp.zeros_like(sh))
    vh, vl = df_add(qh, ql, mh, ml)
    var = jnp.maximum((vh + vl) / n, 0.0)
    return sh / n + sl / n, jnp.sqrt(var)


def min_max_loc_plane(arr: jnp.ndarray):
    """``cv2.minMaxLoc`` on a 2-D map — device scalars:
    ``(min_val f32, max_val f32, (min_x, min_y) i32, (max_x, max_y) i32)``
    with cv2's first-occurrence (row-major argmin/argmax) tie rule and
    (x, y) point order."""
    if arr.ndim != 2:
        raise ValueError("min_max_loc expects a 2-D array")
    w = arr.shape[1]
    flat = arr.reshape(-1)
    imn = jnp.argmin(flat)
    imx = jnp.argmax(flat)
    return (
        flat[imn].astype(jnp.float32),
        flat[imx].astype(jnp.float32),
        (imn % w).astype(jnp.int32),
        (imn // w).astype(jnp.int32),
        (imx % w).astype(jnp.int32),
        (imx // w).astype(jnp.int32),
    )


MOMENT_KEYS = (
    "m00", "m10", "m01", "m20", "m11", "m02", "m30", "m21", "m12", "m03",
    "mu20", "mu11", "mu02", "mu30", "mu21", "mu12", "mu03",
    "nu20", "nu11", "nu02", "nu30", "nu21", "nu12", "nu03",
)


def moments_plane(img: jnp.ndarray, binary_image: bool = False):
    """``cv2.moments`` on a 2-D image → ``f32[24]`` device vector ordered
    like ``MOMENT_KEYS`` (cv2's dict keys).

    Raw-moment sums x^p·y^q·I run entirely in double-float — the x^p/y^q
    powers, the products, and the pairwise-tree accumulation (~2^-45
    relative of the exact f64 oracle, docs/PARITY.md class); the mu/nu
    completion follows cv2's ``Moments`` formulas, one f32 rounding per
    returned entry."""
    if img.ndim != 2:
        raise ValueError("moments expects a single-channel image")
    H, W = img.shape
    I = img.astype(jnp.float32)
    if binary_image:
        I = (I != 0).astype(jnp.float32)
    x = jnp.arange(W, dtype=jnp.float32)
    y = jnp.arange(H, dtype=jnp.float32)

    def powers(v):
        """[(hi, lo)] for v^0..v^3 as df (v^2, v^3 via exact two_prod)."""
        one = (jnp.ones_like(v), jnp.zeros_like(v))
        p1 = (v, jnp.zeros_like(v))
        h2, l2 = two_prod(v, v)
        h3, l3 = df_mul(h2, l2, v, jnp.zeros_like(v))
        return [one, p1, (h2, l2), (h3, l3)]

    xp = powers(x)  # each [W]
    yq = powers(y)  # each [H]

    # column-first contraction: c_p[y] = Σ_x x^p · I[y, x] (df), then
    # m_pq = Σ_y y^q · c_p[y] (df) — two tree reductions per (p, q) family
    m = {}
    for p in range(4):
        th, tl = df_mul(
            jnp.broadcast_to(xp[p][0], (H, W)),
            jnp.broadcast_to(xp[p][1], (H, W)),
            I,
            jnp.zeros_like(I),
        )
        ch, cl = df_sum(th, tl)  # [H]
        for q in range(4 - p):
            rh, rl = df_mul(ch, cl, yq[q][0], yq[q][1])
            sh, sl = df_sum(rh[None, :], rl[None, :])
            m[f"m{p}{q}"] = (sh[0], sl[0])

    # cv2 Moments completion (ref/ops.py:5153) — evaluated ENTIRELY in
    # double-float (~2^-45): the central-moment formulas cancel
    # catastrophically (mu11 = m11 − m10·cy with m11 ~ 1e12 and mu11
    # orders of magnitude smaller), so a plain-f32 completion would lose
    # every significant bit of mu11/mu30..mu03 on large images.  Each of
    # the 24 outputs rounds ONCE to f32 at the end.
    def neg(a):
        return (-a[0], -a[1])

    def add(a, b):
        return df_add(a[0], a[1], b[0], b[1])

    def sub(a, b):
        return add(a, neg(b))

    def mul(a, b):
        return df_mul(a[0], a[1], b[0], b[1])

    def scl(a, k):
        return df_mul(a[0], a[1], jnp.float32(k), jnp.float32(0.0))

    m00 = m["m00"]
    ok = jnp.abs(m00[0]) > jnp.float32(1.2e-38)

    def div(a, b):
        h, l = df_div(a[0], a[1], b[0], b[1])
        return (jnp.where(ok, h, 0.0), jnp.where(ok, l, 0.0))

    cx = div(m["m10"], m00)
    cy = div(m["m01"], m00)
    mu20 = sub(m["m20"], mul(m["m10"], cx))
    mu11 = sub(m["m11"], mul(m["m10"], cy))
    mu02 = sub(m["m02"], mul(m["m01"], cy))
    mu30 = sub(m["m30"], mul(cx, add(scl(mu20, 3.0), mul(cx, m["m10"]))))
    mu21 = sub(sub(m["m21"], mul(cx, add(scl(mu11, 2.0), mul(cx, m["m01"])))),
               mul(cy, mu20))
    mu12 = sub(sub(m["m12"], mul(cy, add(scl(mu11, 2.0), mul(cy, m["m10"])))),
               mul(cx, mu02))
    mu03 = sub(m["m03"], mul(cy, add(scl(mu02, 3.0), mul(cy, m["m01"]))))
    inv = div((jnp.float32(1.0), jnp.float32(0.0)), m00)
    s2 = mul(inv, inv)
    ah, al = df_sqrt(jnp.abs(inv[0]), jnp.where(inv[0] < 0, -inv[1], inv[1]))
    s3 = mul(s2, (ah, al))
    vals = [
        m["m00"], m["m10"], m["m01"], m["m20"], m["m11"], m["m02"],
        m["m30"], m["m21"], m["m12"], m["m03"],
        mu20, mu11, mu02, mu30, mu21, mu12, mu03,
        mul(mu20, s2), mul(mu11, s2), mul(mu02, s2),
        mul(mu30, s3), mul(mu21, s3), mul(mu12, s3), mul(mu03, s3),
    ]
    return jnp.stack([h + l for h, l in vals])
