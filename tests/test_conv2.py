"""Wide-layout conv kernel parity (kernels/conv2.py) — interpret tier.

Pins every dispatch path of sep_conv5_wide against the ref/ oracle:
packed pixel-pair (k3/k5 σ=0 binomials), MXU banded-matmul (general σ,
k7), blur vs integer-unsharp vs fractional-unsharp epilogues, and the
fused 256-entry LUT prologue (the SURVEY §3.3 flagship stage).
"""

import numpy as np
import pytest

from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.kernels.conv2 import (
    sep_conv5_wide,
    supports_wide,
    wide_tile_rows,
)
from imageenhancement_mp_tpu.ref.ops import gaussian_kernel_fixed


def maxdiff(a, b):
    return int(
        np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)).max()
    )


def q8taps(k, sigma=0.0):
    return tuple(int(t) for t in gaussian_kernel_fixed(k, sigma))


def test_supports_wide_predicate():
    import jax.numpy as jnp

    assert supports_wide((2, 64, 256), jnp.uint8)
    assert not supports_wide((2, 64, 256), jnp.uint16)  # u8 only
    assert not supports_wide((2, 64, 200), jnp.uint8)  # W % 128
    assert not supports_wide((2, 64, 128), jnp.uint8)  # W >= 256
    assert not supports_wide((2, 63, 256), jnp.uint8)  # H % 8
    assert wide_tile_rows(2160) == 240
    assert wide_tile_rows(1088) == 272
    assert wide_tile_rows(64) == 64


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("shape", [(2, 64, 256), (1, 96, 384)])
def test_packed_blur_bitexact(rng, k, shape):
    x = rng.integers(0, 256, shape, dtype=np.uint8)
    t = q8taps(k)
    got = sep_conv5_wide(x, t, t, amount=None)
    want = np.stack([ref.gaussian_blur(p, k, 0.0) for p in x])
    assert maxdiff(got, want) == 0


@pytest.mark.parametrize("amount", [1.0, 2.0])
def test_packed_unsharp_bitexact(rng, amount):
    x = rng.integers(0, 256, (2, 64, 256), dtype=np.uint8)
    t = q8taps(5)
    got = sep_conv5_wide(x, t, t, amount=amount)
    want = np.stack([ref.unsharp_mask(p, amount, 5, 0.0) for p in x])
    assert maxdiff(got, want) == 0


def test_packed_unsharp_fractional(rng):
    x = rng.integers(0, 256, (1, 64, 256), dtype=np.uint8)
    t = q8taps(5)
    got = sep_conv5_wide(x, t, t, amount=0.7)
    want = ref.unsharp_mask(x[0], 0.7, 5, 0.0)[None]
    assert maxdiff(got, want) == 0


def test_packed_rect_taps(rng):
    # k3 vertical x k5 horizontal (zv+zh = 2+4 <= 8: still packed)
    x = rng.integers(0, 256, (1, 64, 256), dtype=np.uint8)
    got = sep_conv5_wide(x, q8taps(3), q8taps(5), amount=None)
    want = ref.gaussian_blur(x[0], (3, 5), 0.0)[None]
    assert maxdiff(got, want) == 0


@pytest.mark.parametrize("k,sigma", [(5, 1.5), (7, 0.0), (5, 2.3)])
def test_mxu_path_bitexact(rng, k, sigma):
    # non-dyadic taps (or k7's zv+zh > 8) route to the banded-MXU kernel
    x = rng.integers(0, 256, (2, 64, 256), dtype=np.uint8)
    t = q8taps(k, sigma)
    got = sep_conv5_wide(x, t, t, amount=None)
    want = np.stack([ref.gaussian_blur(p, k, sigma) for p in x])
    assert maxdiff(got, want) == 0


def test_mxu_unsharp_bitexact(rng):
    x = rng.integers(0, 256, (1, 64, 256), dtype=np.uint8)
    t = q8taps(5, 1.5)
    got = sep_conv5_wide(x, t, t, amount=1.0)
    want = ref.unsharp_mask(x[0], 1.0, 5, 1.5)[None]
    assert maxdiff(got, want) == 0


def test_multitile_stripes(rng):
    # H=512 -> th=256: two stripes per image, exercises the halo side arrays
    x = rng.integers(0, 256, (1, 512, 256), dtype=np.uint8)
    t = q8taps(5)
    got = sep_conv5_wide(x, t, t, amount=1.0)
    want = ref.unsharp_mask(x[0], 1.0, 5, 0.0)[None]
    assert maxdiff(got, want) == 0


def _lut2_of(lut, B):
    l2 = np.stack([lut[:128], lut[128:]]).astype(np.int32)
    return np.broadcast_to(l2, (B, 2, 128)).copy()


@pytest.mark.parametrize("amount", [1.0, 0.5])
def test_lut_prologue_flagship(rng, amount):
    # LUT gather + conv + unsharp in one residency vs ref lut-then-unsharp
    B = 2
    x = rng.integers(0, 256, (B, 64, 256), dtype=np.uint8)
    lut = rng.integers(0, 256, (256,), dtype=np.uint8)
    t = q8taps(5)
    got = sep_conv5_wide(x, t, t, amount=amount, lut2=_lut2_of(lut, B))
    want = np.stack([ref.unsharp_mask(lut[p], amount, 5, 0.0) for p in x])
    assert maxdiff(got, want) == 0


def test_lut_prologue_mxu(rng):
    B = 1
    x = rng.integers(0, 256, (B, 64, 256), dtype=np.uint8)
    lut = rng.integers(0, 256, (256,), dtype=np.uint8)
    t = q8taps(5, 1.5)
    got = sep_conv5_wide(x, t, t, amount=1.0, lut2=_lut2_of(lut, B))
    want = np.stack([ref.unsharp_mask(lut[p], 1.0, 5, 1.5) for p in x])
    assert maxdiff(got, want) == 0


def test_lut_per_image(rng):
    # each batch element gets its own LUT (the hist-eq case)
    B = 3
    x = rng.integers(0, 256, (B, 64, 256), dtype=np.uint8)
    luts = rng.integers(0, 256, (B, 256), dtype=np.uint8)
    lut2 = np.stack([np.stack([l[:128], l[128:]]) for l in luts]).astype(np.int32)
    t = q8taps(5)
    got = sep_conv5_wide(x, t, t, amount=1.0, lut2=lut2)
    want = np.stack(
        [ref.unsharp_mask(luts[b][x[b]], 1.0, 5, 0.0) for b in range(B)]
    )
    assert maxdiff(got, want) == 0


@pytest.mark.parametrize("shape", [(2, 64, 256), (1, 128, 384)])
def test_flagship_equalize_unsharp_wide(rng, shape):
    """equalize_unsharp routes through the fused LUT+conv+unsharp kernel
    when forced-Pallas and the shape is wide-eligible — bit-exact."""
    from imageenhancement_mp_tpu import config
    from imageenhancement_mp_tpu.pipeline import equalize_unsharp

    x = rng.integers(0, 256, shape, dtype=np.uint8)
    config.use_pallas_kernels = True
    try:
        got = equalize_unsharp(x, 1.0, 5, 0.0)
    finally:
        config.use_pallas_kernels = None
    want = np.stack([ref.unsharp_mask(ref.equalize_hist(p), 1.0, 5, 0.0) for p in x])
    assert maxdiff(got, want) == 0


def test_dispatch_via_conv_kernel(rng):
    """gaussian_blur_pallas / unsharp_mask_pallas route wide-eligible
    shapes to the wide kernel (same results as the narrow shapes)."""
    from imageenhancement_mp_tpu.kernels.conv import (
        gaussian_blur_pallas,
        unsharp_mask_pallas,
    )

    x = rng.integers(0, 256, (1, 64, 256), dtype=np.uint8)
    got = gaussian_blur_pallas(x, 5, 0.0, interpret=True)
    assert maxdiff(got, ref.gaussian_blur(x[0], 5, 0.0)[None]) == 0
    got = unsharp_mask_pallas(x, 1.0, 5, 0.0, interpret=True)
    assert maxdiff(got, ref.unsharp_mask(x[0], 1.0, 5, 0.0)[None]) == 0


def test_extreme_values(rng):
    # saturation / constant-image edges
    t = q8taps(5)
    for fill in (0, 255):
        x = np.full((1, 64, 256), fill, np.uint8)
        got = sep_conv5_wide(x, t, t, amount=2.0)
        want = ref.unsharp_mask(x[0], 2.0, 5, 0.0)[None]
        assert maxdiff(got, want) == 0, fill
