"""HLS arithmetic path: the round-4 replacement of the 65536-entry
(v,vmin)/(L,S)-pair tables by direct per-pixel arithmetic
(ops/color.py).  These tests re-derive every pinned table EXHAUSTIVELY
(all 65536 grid pairs) from the same jnp arithmetic the device op now
runs — df_div for the correctly-rounded f32 divisions, two_prod for the
contraction-proof products — so a regression in either utility breaks
here before it breaks the (sampled) device-vs-cv2 tier.
"""

import numpy as np
import jax.numpy as jnp

from imageenhancement_mp_tpu.utils.fma import df_div, two_prod
from imageenhancement_mp_tpu.ref.ops import _hls_fwd_tables, _hls_inv_tables


def test_hls_fwd_grid_arithmetic_matches_tables():
    d60_t, X_t, L8_t, S8_t = _hls_fwd_tables()
    c = jnp.float32(1.0 / 255.0)
    v = jnp.broadcast_to((jnp.arange(256, dtype=jnp.float32) * c)[:, None],
                         (256, 256))
    m = jnp.broadcast_to((jnp.arange(256, dtype=jnp.float32) * c)[None, :],
                         (256, 256))
    diff = v - m
    z = jnp.zeros_like(diff)
    d60 = df_div(jnp.float32(60.0) + z, z,
                 jnp.where(diff > 0, diff, jnp.float32(1)), z)[0]
    vsum = v + m
    l = vsum * jnp.float32(0.5)
    denom = jnp.where(l < 0.5, vsum, jnp.float32(2.0) - vsum)
    den2 = jnp.where(denom == 0, jnp.float32(1), denom)
    sval = jnp.where(diff > 0, df_div(diff, z, den2, z)[0], jnp.float32(0))
    L8 = jnp.round(two_prod(l, jnp.float32(255.0))[0]).astype(jnp.int32)
    S8 = jnp.clip(jnp.round(two_prod(sval, jnp.float32(255.0))[0]),
                  0, 255).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(d60), d60_t)
    np.testing.assert_array_equal(np.asarray(diff), X_t)
    np.testing.assert_array_equal(np.asarray(L8), L8_t.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(S8), S8_t.astype(np.int32))


def test_hls_inv_grid_arithmetic_matches_tables():
    p2_t, p1_t, sec_t, hf_t = _hls_inv_tables()
    c = jnp.float32(1.0 / 255.0)
    L = jnp.broadcast_to((jnp.arange(256, dtype=jnp.float32) * c)[:, None],
                         (256, 256))
    S = jnp.broadcast_to((jnp.arange(256, dtype=jnp.float32) * c)[None, :],
                         (256, 256))
    p2 = jnp.where(L <= 0.5, two_prod(L, jnp.float32(1.0) + S)[0],
                   (L + S) - two_prod(L, S)[0])
    p1 = jnp.float32(2.0) * L - p2
    h6 = jnp.arange(256, dtype=jnp.float32) * jnp.float32(6.0 / 180.0)
    h6 = jnp.where(h6 >= 6, h6 - jnp.float32(6.0), h6)
    sec = jnp.floor(h6).astype(jnp.int32)
    hf = h6 - sec.astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(p2), p2_t)
    np.testing.assert_array_equal(np.asarray(p1), p1_t)
    np.testing.assert_array_equal(np.asarray(sec), sec_t)
    np.testing.assert_array_equal(np.asarray(hf), hf_t)
