"""Point operations: LUT application, gamma/log transforms, contrast stretch.

Reference equivalents: ``cv2.LUT``, power-law/log transforms, and
``cv2.normalize(NORM_MINMAX)`` (SURVEY.md §2 #1-3).  Gamma/log LUTs are
static 256-entry tables built host-side in float64 (exact, compile-time
constants); contrast stretch builds its LUT on device from the per-plane
min/max with f32 scale/shift math mirroring cv2's normalize path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


__all__ = [
    "apply_lut_planes",
    "convert_scale_abs_planes",
    "gamma_lut_host",
    "log_lut_host",
    "gamma_planes",
    "log_planes",
    "contrast_stretch_planes",
]


def apply_lut_planes(planes: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """``cv2.LUT`` ≡ gather (SURVEY.md §8.6).

    ``lut``: [S] shared or [B, S] per plane; S = 256 (u8 planes) or 65536
    (u16).  Output dtype = table dtype."""
    idx = planes.astype(jnp.int32)
    if lut.ndim == 1:
        return lut[idx]
    return jax.vmap(lambda l, p: l[p])(lut, idx)


def gamma_lut_host(gamma: float) -> np.ndarray:
    """Static power-law LUT ``s = 255·(r/255)^γ`` in f64 (exact; SURVEY.md §2 #1)."""
    r = np.arange(256, dtype=np.float64) / 255.0
    return np.clip(np.round(255.0 * np.power(r, gamma)), 0, 255).astype(np.uint8)


def log_lut_host() -> np.ndarray:
    """Static log LUT ``s = c·log(1+r)``, ``c = 255/log 256`` (SURVEY.md §2 #2)."""
    c = 255.0 / np.log(256.0)
    return np.clip(np.round(c * np.log1p(np.arange(256, dtype=np.float64))), 0, 255).astype(
        np.uint8
    )


def gamma_planes(planes: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """uint8/uint16: LUT path (exact).  float32: direct ``255·(r/255)^γ``."""
    if planes.dtype == jnp.float32:
        r = jnp.maximum(planes, 0.0) * (1.0 / 255.0)
        return (255.0 * jnp.power(r, jnp.float32(gamma))).astype(jnp.float32)
    if planes.dtype == jnp.uint16:
        from imageenhancement_mp_tpu.ref.ops import gamma_lut16

        return apply_lut_planes(planes, jnp.asarray(gamma_lut16(gamma)))
    return apply_lut_planes(planes, jnp.asarray(gamma_lut_host(gamma)))


def log_planes(planes: jnp.ndarray) -> jnp.ndarray:
    """uint8/uint16: LUT path (exact).  float32: direct ``c·log(1+r)``."""
    if planes.dtype == jnp.float32:
        c = jnp.float32(255.0 / np.log(256.0))
        return c * jnp.log1p(jnp.maximum(planes, 0.0))
    if planes.dtype == jnp.uint16:
        from imageenhancement_mp_tpu.ref.ops import log_lut16

        return apply_lut_planes(planes, jnp.asarray(log_lut16()))
    return apply_lut_planes(planes, jnp.asarray(log_lut_host()))


def convert_scale_abs_planes(
    planes: jnp.ndarray, alpha: float = 1.0, beta: float = 0.0
) -> jnp.ndarray:
    """``cv2.convertScaleAbs`` per plane — ``saturate_u8(round(|α·x+β|))``.

    cv2 ALWAYS returns 8-bit regardless of input depth (verified probe).
    Integer inputs use exact static LUTs built with cv2's single-rounded
    f32 FMA semantics; float32 computes on device with f32 mul+add (±1 at
    FMA ties vs cv2).
    """
    if planes.dtype == jnp.float32:
        out = jnp.abs(jnp.round(jnp.float32(alpha) * planes + jnp.float32(beta)))
        return jnp.clip(out, 0, 255).astype(jnp.int32).astype(jnp.uint8)
    from imageenhancement_mp_tpu.ref.ops import convert_scale_abs_lut

    n = 65536 if planes.dtype == jnp.uint16 else 256
    return apply_lut_planes(planes, jnp.asarray(convert_scale_abs_lut(alpha, beta, n)))


def contrast_stretch_planes(
    planes: jnp.ndarray, out_range: tuple[float, float] = (0.0, 255.0)
) -> jnp.ndarray:
    """``cv2.normalize(MINMAX, α, β)`` per plane (SURVEY.md §8.5; exact for
    the default 0..255 range, ±1 for arbitrary float ranges).

    uint8: ``round((x − min)·(β−α)/(max − min) + α)`` half-to-even (computed
    in f64-equivalent exact int math only for the default 0..255 case; the
    general case uses f32 LUT math, still exact for 8-bit domains since all
    products are < 2^24).  Constant plane → α.
    float32: no rounding (cv2 float path).
    """
    # cv2 sorts the output range: src-min maps to min(α,β) (verified probe)
    a, b = sorted((float(out_range[0]), float(out_range[1])))
    if planes.dtype == jnp.uint16:

        def one16(p: jnp.ndarray) -> jnp.ndarray:
            lo = p.min().astype(jnp.float32)
            hi = p.max().astype(jnp.float32)
            scale = jnp.float32(b - a) / jnp.maximum(hi - lo, jnp.float32(1.0))
            out = jnp.round((p.astype(jnp.float32) - lo) * scale + jnp.float32(a))
            out = jnp.where(hi == lo, jnp.float32(np.clip(round(a), 0, 65535)), out)
            return jnp.clip(out, 0, 65535).astype(jnp.uint16)

        return jax.vmap(one16)(planes)
    if planes.dtype == jnp.float32:

        def onef(p: jnp.ndarray) -> jnp.ndarray:
            lo = p.min()
            hi = p.max()
            out = (p - lo) * ((b - a) / jnp.maximum(hi - lo, jnp.float32(1e-45))) + a
            return jnp.where(hi == lo, jnp.float32(a), out).astype(jnp.float32)

        return jax.vmap(onef)(planes)

    def one(p: jnp.ndarray) -> jnp.ndarray:
        # mirror cv2's normalize->convertTo expression (reciprocal-multiply
        # scale, round(x*scale + shift)); f32 here vs cv2's f64 flips only
        # exact .5 ties (±1, rare)
        lo = p.min().astype(jnp.float32)
        hi = p.max().astype(jnp.float32)
        den = jnp.maximum(hi - lo, jnp.float32(1.0))
        scale = jnp.float32(b - a) * (jnp.float32(1.0) / den)
        shift = jnp.float32(a) - lo * scale
        i = jnp.arange(256, dtype=jnp.float32)
        lut = jnp.clip(jnp.round(i * scale + shift), 0, 255).astype(jnp.int32)
        lut = jnp.where(hi == lo, jnp.int32(round(max(min(a, 255.0), 0.0))), lut).astype(
            jnp.uint8
        )
        return lut[p.astype(jnp.int32)]

    return jax.vmap(one)(planes)
