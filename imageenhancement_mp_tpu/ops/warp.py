"""Affine warps: ``cv2.warpAffine`` parity on device (contract pinned
in ref/ops.py ``warp_affine``).

TPU mapping: the destination->source coordinate field is affine, so the
device never materialises an (oh, ow) coordinate constant — it combines
a per-ROW int32 table and a per-COLUMN int32 table (host-precomputed in
f64, tiny) with one broadcast add in-program, then gathers the 4 taps
with ``jnp.take`` on flattened indices.  Everything else is VPU math
that XLA fuses around the gather.

* LINEAR u8/u16/f32 — cv2 5.0's full-precision float path.  On device
  (no f64) the coordinates use 2^18 fixed point: frac error <= 2^-19,
  which keeps even uint16 values within 0.25 LSB of the f64 oracle
  (razor ±1 only).
* LINEAR i16 — cv2's OWN fixed-point path (AB_BITS=10 coords, 32x32
  tab at 2^15): identical integer arithmetic to the oracle, bit-exact.
* NEAREST — i16 rounds the AB fixed-point map; other dtypes round the
  2^18 map (oracle rounds f64; razor ±index only).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from imageenhancement_mp_tpu.ref.ops import (invert_affine, warp_affine_coords_int,
                                             warp_affine_nn_coords_int, warp_tab_int)
from imageenhancement_mp_tpu.utils.ranges import int_bounds

__all__ = ["warp_affine_planes", "remap_planes", "undistort_planes"]

_BITS = 18  # device coordinate fixed point (float path)


def _coord_tables(Mi, oh, ow):
    """Host-side per-row/per-column int tables: coord*2^bits = row + col.

    The fixed-point width adapts downward (18 -> ...) until the combined
    |row + col| magnitude fits int32 with headroom for the NN rounding
    add — huge translations lose fractional precision instead of
    wrapping (they're all border pixels anyway)."""
    for bits in range(_BITS, 7, -1):
        S = 1 << bits
        acol = np.round(Mi[0, 0] * np.arange(ow) * S)
        bcol = np.round(Mi[1, 0] * np.arange(ow) * S)
        arow = np.round((Mi[0, 1] * np.arange(oh) + Mi[0, 2]) * S)
        brow = np.round((Mi[1, 1] * np.arange(oh) + Mi[1, 2]) * S)
        bound = max(
            abs(arow).max() + abs(acol).max() if oh and ow else 0,
            abs(brow).max() + abs(bcol).max() if oh and ow else 0,
        )
        if bound < 2 ** 30:
            return (arow.astype(np.int32), acol.astype(np.int32),
                    brow.astype(np.int32), bcol.astype(np.int32), bits)
    raise ValueError("warp matrix translation too large for device fixed point")


def _gather(planes, iy, ix, H, W, border, border_value, minv, maxv):
    """4-tap-safe sample: clamp indices, mask constant-border taps."""
    cy = jnp.clip(iy, 0, H - 1)
    cx = jnp.clip(ix, 0, W - 1)
    flat = planes.reshape(planes.shape[0], H * W)
    v = jnp.take(flat, (cy * W + cx).reshape(-1), axis=1).reshape(
        planes.shape[0], *iy.shape)
    if border == "constant":
        inside = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        fill = jnp.asarray(border_value, v.dtype)
        v = jnp.where(inside[None], v, fill)
    return v


def warp_affine_planes(planes: jnp.ndarray, M, dsize, interpolation: str = "linear",
                       border: str = "constant", border_value: float = 0.0,
                       inverse_map: bool = False) -> jnp.ndarray:
    """``cv2.warpAffine`` per plane on ``(N, H, W)``; ``dsize`` is (oh, ow).

    ``M`` is static (a 2x3 matrix as nested tuples/array) — the
    coordinate tables are baked at trace time."""
    if planes.dtype not in (jnp.uint8, jnp.uint16, jnp.int16, jnp.float32):
        raise TypeError(f"expected uint8/uint16/int16/float32, got {planes.dtype}")
    oh, ow = int(dsize[0]), int(dsize[1])
    if oh < 1 or ow < 1:
        raise ValueError(f"invalid output size {(oh, ow)}")
    if border not in ("constant", "replicate"):
        raise ValueError(f"unknown border {border!r} (constant|replicate)")
    if interpolation not in ("nearest", "linear"):
        raise ValueError(f"unknown interpolation {interpolation!r} (nearest|linear)")
    H, W = planes.shape[-2], planes.shape[-1]
    Mi = (np.asarray(M, np.float64).reshape(2, 3) if inverse_map
          else invert_affine(np.asarray(M, np.float64)))
    is_f32 = planes.dtype == jnp.float32
    minv, maxv = (0, 0) if is_f32 else int_bounds(planes.dtype)
    if not is_f32:
        # cv2 saturates borderValue into the dtype BEFORE blending (the
        # constant-border buffer is stored at the work type); also keeps
        # the dtype cast inside _gather from wrapping
        border_value = float(np.clip(np.round(float(border_value)), minv, maxv))

    if planes.dtype == jnp.int16:
        if interpolation == "nearest":
            niy, nix = warp_affine_nn_coords_int(Mi, oh, ow)   # oracle's maps
            v = _gather(planes, jnp.asarray(niy.astype(np.int32)),
                        jnp.asarray(nix.astype(np.int32)), H, W,
                        border, border_value, minv, maxv)
            return v
        X, Y = warp_affine_coords_int(Mi, oh, ow)        # (oh, ow) int64 host
        T = (1 << 5) - 1
        tab = warp_tab_int()[Y & T, X & T].astype(np.int32)   # (oh, ow, 2, 2)
        iy0 = jnp.asarray((Y >> 5).astype(np.int32))
        ix0 = jnp.asarray((X >> 5).astype(np.int32))
        acc = None
        for dy in range(2):
            for dx in range(2):
                v = _gather(planes, iy0 + dy, ix0 + dx, H, W,
                            border, border_value, minv, maxv).astype(jnp.int32)
                term = v * jnp.asarray(tab[:, :, dy, dx])[None]
                acc = term if acc is None else acc + term
        out = (acc + (1 << 14)) >> 15
        return jnp.clip(out, minv, maxv).astype(planes.dtype)

    arow, acol, brow, bcol, bits = _coord_tables(Mi, oh, ow)
    X = jnp.asarray(arow)[:, None] + jnp.asarray(acol)[None, :]   # int32 2^bits
    Y = jnp.asarray(brow)[:, None] + jnp.asarray(bcol)[None, :]
    if interpolation == "nearest":
        half = 1 << (bits - 1)
        iy = (Y + half) >> bits
        ix = (X + half) >> bits
        v = _gather(planes, iy, ix, H, W, border, border_value, minv, maxv)
        return v if is_f32 else v.astype(planes.dtype)
    ix0, iy0 = X >> bits, Y >> bits
    inv = jnp.float32(1.0 / (1 << bits))
    tx = (X & ((1 << bits) - 1)).astype(jnp.float32) * inv
    ty = (Y & ((1 << bits) - 1)).astype(jnp.float32) * inv
    one = jnp.float32(1)
    acc = None
    for dy in range(2):
        wy = ty if dy else one - ty
        for dx in range(2):
            wx = tx if dx else one - tx
            v = _gather(planes, iy0 + dy, ix0 + dx, H, W,
                        border, border_value, minv, maxv).astype(jnp.float32)
            term = v * (wy * wx)[None]
            acc = term if acc is None else acc + term
    if is_f32:
        return acc
    return jnp.clip(jnp.round(acc), minv, maxv).astype(planes.dtype)


def remap_planes(planes: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray,
                 interpolation: str = "linear", border: str = "constant",
                 border_value: float = 0.0) -> jnp.ndarray:
    """``cv2.remap`` per plane on ``(N, H, W)`` with RUNTIME float32
    maps (traced inputs — unlike ``warp_affine_planes`` the coordinates
    are data, so nothing is baked at trace time).

    Same contracts as the oracle (ref/ops.py ``remap``): the maps ARE
    f32, so the device float path loses nothing vs the f64 oracle
    except razor blend ties (u8/u16 ±1); i16 reproduces the oracle's
    fixed-point tab integers bit-exactly; NEAREST rounds the map."""
    if planes.dtype not in (jnp.uint8, jnp.uint16, jnp.int16, jnp.float32):
        raise TypeError(f"expected uint8/uint16/int16/float32, got {planes.dtype}")
    if border not in ("constant", "replicate"):
        raise ValueError(f"unknown border {border!r} (constant|replicate)")
    if interpolation not in ("nearest", "linear"):
        raise ValueError(f"unknown interpolation {interpolation!r} (nearest|linear)")
    H, W = planes.shape[-2], planes.shape[-1]
    mx = map_x.astype(jnp.float32)
    my = map_y.astype(jnp.float32)
    is_f32 = planes.dtype == jnp.float32
    minv, maxv = (0, 0) if is_f32 else int_bounds(planes.dtype)
    if not is_f32:
        border_value = float(np.clip(np.round(float(border_value)), minv, maxv))
    if interpolation == "nearest":
        iy = jnp.round(my).astype(jnp.int32)
        ix = jnp.round(mx).astype(jnp.int32)
        v = _gather(planes, iy, ix, H, W, border, border_value, minv, maxv)
        return v if is_f32 else v.astype(planes.dtype)
    if planes.dtype == jnp.int16:
        X = jnp.round(mx * jnp.float32(32)).astype(jnp.int32)
        Y = jnp.round(my * jnp.float32(32)).astype(jnp.int32)
        ix0, iy0 = X >> 5, Y >> 5
        tab = jnp.asarray(warp_tab_int().astype(np.int32).reshape(32 * 32, 4))
        w = jnp.take(tab, (Y & 31) * 32 + (X & 31), axis=0)   # (oh, ow, 4)
        acc = None
        for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            v = _gather(planes, iy0 + dy, ix0 + dx, H, W,
                        border, border_value, minv, maxv).astype(jnp.int32)
            term = v * w[..., k][None]
            acc = term if acc is None else acc + term
        out = (acc + (1 << 14)) >> 15
        return jnp.clip(out, minv, maxv).astype(planes.dtype)
    ix0 = jnp.floor(mx).astype(jnp.int32)
    iy0 = jnp.floor(my).astype(jnp.int32)
    tx = mx - ix0.astype(jnp.float32)
    ty = my - iy0.astype(jnp.float32)
    one = jnp.float32(1)
    acc = None
    for dy in range(2):
        wy = ty if dy else one - ty
        for dx in range(2):
            wx = tx if dx else one - tx
            v = _gather(planes, iy0 + dy, ix0 + dx, H, W,
                        border, border_value, minv, maxv).astype(jnp.float32)
            term = v * (wy * wx)[None]
            acc = term if acc is None else acc + term
    if is_f32:
        return acc
    return jnp.clip(jnp.round(acc), minv, maxv).astype(planes.dtype)


def undistort_planes(planes: jnp.ndarray, K, dist, new_K=None) -> jnp.ndarray:
    """``cv2.undistort`` per plane on ``(N, H, W)`` — contract in
    ref/ops.py ``undistort``: cv2's quantized-map path (f64 distortion
    maps rounded to 1/32 subpixels, 32x32 tab).  K/dist are static, so
    the quantized integer coordinate fields are baked host-side; u8 is
    bit-exact, u16/i16 ±1, f32 float-tab."""
    from imageenhancement_mp_tpu.ref.ops import _undistort_maps64

    if planes.dtype not in (jnp.uint8, jnp.uint16, jnp.int16, jnp.float32):
        raise TypeError(f"expected uint8/uint16/int16/float32, got {planes.dtype}")
    H, W = planes.shape[-2], planes.shape[-1]
    mx, my = _undistort_maps64(K, dist, (H, W), new_K)
    X = np.round(mx * 32).astype(np.int64)
    Y = np.round(my * 32).astype(np.int64)
    ix0 = jnp.asarray((X >> 5).astype(np.int32))
    iy0 = jnp.asarray((Y >> 5).astype(np.int32))
    is_f32 = planes.dtype == jnp.float32
    minv, maxv = (0, 0) if is_f32 else int_bounds(planes.dtype)
    if is_f32:
        tx = jnp.asarray(((X & 31) / 32.0).astype(np.float32))
        ty = jnp.asarray(((Y & 31) / 32.0).astype(np.float32))
        one = jnp.float32(1)
        acc = None
        for dy in range(2):
            wy = ty if dy else one - ty
            for dx in range(2):
                wx = tx if dx else one - tx
                v = _gather(planes, iy0 + dy, ix0 + dx, H, W,
                            "constant", 0.0, minv, maxv).astype(jnp.float32)
                term = v * (wy * wx)[None]
                acc = term if acc is None else acc + term
        return acc
    tab = warp_tab_int()[Y & 31, X & 31].astype(np.int32)   # (H, W, 2, 2)
    acc = None
    for dy in range(2):
        for dx in range(2):
            v = _gather(planes, iy0 + dy, ix0 + dx, H, W,
                        "constant", 0.0, minv, maxv).astype(jnp.int32)
            term = v * jnp.asarray(tab[:, :, dy, dx])[None]
            acc = term if acc is None else acc + term
    out = (acc + (1 << 14)) >> 15
    return jnp.clip(out, minv, maxv).astype(planes.dtype)
