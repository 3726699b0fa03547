"""Pallas histogram / LUT-apply kernel tier (interpret mode on CPU).

Round-4 kernels (kernels/hist.py): the XLA one-hot histogram and the XLA
256-entry gather both collapse on the real chip (~175 ms per 1080p×8
batch — docs/DESIGN.md §9c), so the whole LUT family routes through the
Pallas stripe kernels on TPU.  These tests force that path
(``config.use_pallas_kernels = True`` → interpret mode here) and pin it
against the oracles; real-chip bitwise checks live in the selftest and
bench parity phases.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import imageenhancement_mp_tpu.config as config
from imageenhancement_mp_tpu import ref
from detseed import seed


@pytest.fixture(autouse=True)
def _force_pallas():
    config.use_pallas_kernels = True
    yield
    config.use_pallas_kernels = None


def test_hist256_pallas_shapes():
    from imageenhancement_mp_tpu.kernels.hist import hist256_pallas

    rng = np.random.default_rng(seed("hist256"))
    for shape in [(1, 8, 16), (3, 64, 80), (2, 999), (5, 7, 13), (1, 1, 1)]:
        x = rng.integers(0, 256, shape, np.uint8)
        got = np.asarray(hist256_pallas(jnp.asarray(x)))
        want = np.stack(
            [np.bincount(p.ravel(), minlength=256) for p in x.reshape(shape[0], -1)]
        )
        assert np.array_equal(got, want), shape


def test_apply_lut_pallas_dtypes():
    from imageenhancement_mp_tpu.kernels.hist import apply_lut256_pallas

    rng = np.random.default_rng(seed("lutapply"))
    x = rng.integers(0, 256, (3, 37, 53), np.uint8)
    for dt, hi in [(np.uint8, 256), (np.uint16, 65536), (np.int32, 1 << 24)]:
        lut = rng.integers(0, hi, (256,)).astype(dt)
        got = np.asarray(apply_lut256_pallas(jnp.asarray(x), jnp.asarray(lut)))
        assert got.dtype == dt and np.array_equal(got, lut[x]), dt
    lutf = (rng.random(256) * 2000 - 700).astype(np.float32)
    got = np.asarray(apply_lut256_pallas(jnp.asarray(x), jnp.asarray(lutf)))
    assert np.array_equal(got, lutf[x])
    # per-plane LUTs
    luts = rng.integers(0, 256, (3, 256), np.uint8)
    got = np.asarray(apply_lut256_pallas(jnp.asarray(x), jnp.asarray(luts)))
    want = np.stack([l[p] for l, p in zip(luts, x)])
    assert np.array_equal(got, want)


def test_apply_luts_multi():
    from imageenhancement_mp_tpu.kernels.hist import apply_luts_multi_pallas

    rng = np.random.default_rng(seed("lutmulti"))
    x = rng.integers(0, 256, (4, 30, 41), np.uint8)
    luts = rng.integers(0, 256, (4, 9, 256), np.uint8)
    outs = apply_luts_multi_pallas(jnp.asarray(x), jnp.asarray(luts))
    assert len(outs) == 9
    for k, o in enumerate(outs):
        want = np.stack([luts[b, k][x[b]] for b in range(4)])
        assert np.array_equal(np.asarray(o), want), k


def test_equalize_hist_pallas_vs_oracle():
    from imageenhancement_mp_tpu.ops.histogram import equalize_hist_planes

    rng = np.random.default_rng(seed("histeq_pallas"))
    x = rng.integers(0, 256, (3, 100, 131), np.uint8)
    got = np.asarray(jax.jit(equalize_hist_planes)(x))
    want = np.stack([ref.equalize_hist(p) for p in x])
    assert np.array_equal(got, want)


def test_gamma_stretch_pallas_vs_oracle():
    from imageenhancement_mp_tpu.ops.pointwise import (
        contrast_stretch_planes,
        gamma_planes,
    )

    rng = np.random.default_rng(seed("gs_pallas"))
    x = rng.integers(3, 200, (2, 64, 80), np.uint8)
    got = np.asarray(
        jax.jit(lambda v: contrast_stretch_planes(gamma_planes(v, 2.2)))(x)
    )
    want = np.stack([ref.contrast_stretch(ref.gamma_transform(p, 2.2)) for p in x])
    assert np.array_equal(got, want)


def test_clahe_pallas_vs_oracle():
    from imageenhancement_mp_tpu.ops.clahe import clahe_planes

    rng = np.random.default_rng(seed("clahe_pallas"))
    # ±1 budget: the stage-C blend association contracts to FMA on
    # XLA:CPU (docs/PARITY.md class) — bitwise on the TPU backend,
    # verified on-chip (selftest)
    for shape, grid, cl in [
        ((3, 64, 64), (8, 8), 2.0),
        ((2, 40, 48), (8, 8), 2.0),
        ((2, 80, 96), (5, 6), 3.5),
        ((1, 33, 80), (3, 5), 40.0),
    ]:
        x = rng.integers(0, 256, shape, np.uint8)
        got = np.asarray(jax.jit(lambda v: clahe_planes(v, cl, grid))(x))
        want = np.stack([ref.clahe(p, cl, grid) for p in x])
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, (shape, grid)


def test_pallas_vs_xla_paths_agree():
    """The Pallas and XLA histogram/LUT paths are the same math."""
    from imageenhancement_mp_tpu.ops.histogram import histogram_256

    rng = np.random.default_rng(seed("hist_ab"))
    x = jnp.asarray(rng.integers(0, 256, (3, 50, 61), np.uint8))
    a = np.asarray(histogram_256(x, "pallas"))
    b = np.asarray(histogram_256(x, "nibble_matmul"))
    assert np.array_equal(a, b)


def test_equalize_fused_kernel_vs_oracle():
    from imageenhancement_mp_tpu.kernels.hist import equalize_hist_pallas

    rng = np.random.default_rng(seed("eq_fused"))
    for shape in [(2, 64, 80), (1, 100, 131), (3, 33, 41), (1, 8, 8)]:
        x = rng.integers(0, 256, shape, np.uint8)
        got = np.asarray(jax.jit(equalize_hist_pallas)(jnp.asarray(x)))
        want = np.stack([ref.equalize_hist(p) for p in x])
        assert np.array_equal(got, want), shape
    c = np.full((1, 20, 20), 77, np.uint8)  # constant → identity LUT
    got = np.asarray(jax.jit(equalize_hist_pallas)(jnp.asarray(c)))
    assert np.array_equal(got, c)
