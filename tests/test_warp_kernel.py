"""Windowed Pallas gather kernel for static warps (kernels/warp.py).

Interpret-mode (CPU) parity vs the ref oracle: the kernel must be
bitwise-identical to the XLA device path / oracle for u8 linear+nearest
warps under both borders, including the constant-border overlay + exact
partial-band fixup in ops/warp.py ``_static_gather_u8_pallas``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from imageenhancement_mp_tpu import config
from imageenhancement_mp_tpu.ref import ops as ref
from imageenhancement_mp_tpu.kernels import warp as kwarp
from imageenhancement_mp_tpu.ops.warp import (warp_affine_planes,
                                              warp_perspective_planes)


@pytest.fixture(autouse=True)
def _force_pallas():
    config.use_pallas_kernels = True
    yield
    config.use_pallas_kernels = None


def _img(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, shape, np.uint8)


def test_gather_bilinear_kernel_bitwise_vs_oracle():
    img = _img((2, 64, 80))
    M = ref.get_rotation_matrix_2d((40.0, 32.0), 15.0, 1.0)
    sx, sy = ref.warp_affine_coords_f32(ref.invert_affine(M), 60, 72)
    exp = np.stack([ref.warp_affine(p, M, (60, 72), border="replicate")
                    for p in img])
    got = np.asarray(kwarp.gather_bilinear_pallas(
        jnp.asarray(img), sx, sy, interpret=True))
    np.testing.assert_array_equal(got, exp)


def test_gather_nearest_kernel_bitwise_vs_oracle():
    img = _img((1, 50, 70), seed=3)
    M = ref.get_rotation_matrix_2d((35.0, 25.0), -23.0, 0.9)
    sx, sy = ref.warp_affine_coords_f32(ref.invert_affine(M), 50, 70)
    exp = ref.warp_affine(img[0], M, (50, 70), interpolation="nearest",
                          border="replicate")[None]
    got = np.asarray(kwarp.gather_nearest_pallas(
        jnp.asarray(img), np.rint(sy).astype(np.int64),
        np.rint(sx).astype(np.int64), interpret=True))
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("border", ["constant", "replicate"])
@pytest.mark.parametrize("interp", ["linear", "nearest"])
def test_warp_affine_dispatch_bitwise(border, interp):
    img = _img((2, 64, 96), seed=7)
    M = ref.get_rotation_matrix_2d((48.0, 32.0), 31.0, 1.1)
    bv = 9.0 if border == "constant" else 0.0
    exp = np.stack([ref.warp_affine(p, M, (56, 88), interpolation=interp,
                                    border=border, border_value=bv)
                    for p in img])
    got = np.asarray(warp_affine_planes(
        jnp.asarray(img), M, (56, 88), interpolation=interp, border=border,
        border_value=bv))
    np.testing.assert_array_equal(got, exp)


def test_warp_affine_dispatch_shear_translate():
    img = _img((1, 60, 100), seed=11)
    M = np.array([[1.0, 0.3, -10.0], [0.1, 0.9, 5.5]])
    exp = ref.warp_affine(img[0], M, (60, 100))[None]
    got = np.asarray(warp_affine_planes(jnp.asarray(img), M, (60, 100)))
    np.testing.assert_array_equal(got, exp)


def test_warp_perspective_dispatch_bitwise():
    img = _img((1, 60, 80), seed=13)
    Mp = np.array([[1.0, 0.05, -5.0], [0.02, 0.98, 3.0],
                   [2e-4, 1e-4, 1.0]])
    for border in ("constant", "replicate"):
        exp = ref.warp_perspective(img[0], Mp, (56, 76), border=border)[None]
        got = np.asarray(warp_perspective_planes(
            jnp.asarray(img), Mp, (56, 76), border=border))
        np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("inverse", [False, True])
@pytest.mark.parametrize("log", [False, True])
@pytest.mark.parametrize("interp", ["linear", "nearest"])
def test_warp_polar_dispatch_bitwise(inverse, log, interp, monkeypatch):
    """warp_polar -> windowed Pallas gather route (ops/warp.py
    warp_polar_planes), incl. the inverse wrap-pad geometry where the
    padded Hs/Ws are the source extent (ADVICE r04: this dispatch had
    no forced-Pallas coverage)."""
    from imageenhancement_mp_tpu.ops.warp import warp_polar_planes

    calls = {"n": 0}
    real = kwarp.gather_bilinear_pallas if interp == "linear" \
        else kwarp.gather_nearest_pallas

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(
        kwarp,
        "gather_bilinear_pallas" if interp == "linear"
        else "gather_nearest_pallas",
        counted,
    )
    img = _img((2, 64, 96), seed=19)
    dsize = (48, 56) if not inverse else (64, 96)
    exp = np.stack([
        ref.warp_polar(p, dsize, (50.0, 30.0), 45.0, log=log,
                       inverse=inverse, interpolation=interp)
        for p in img
    ])
    got = np.asarray(warp_polar_planes(
        jnp.asarray(img), dsize, (50.0, 30.0), 45.0, log=log,
        inverse=inverse, interpolation=interp))
    np.testing.assert_array_equal(got, exp)
    assert calls["n"] == 1, "warp_polar did not take the Pallas gather route"


def test_window_too_large_falls_back():
    # a 90-degree-ish huge-scale map blows the per-block window budget on
    # a large source: the dispatch must silently take the XLA path and
    # still be exact
    img = _img((1, 600, 700), seed=17)
    # scale 1/8 rotation: the INVERSE map spreads each output block over
    # a ~800-row source window — far over the chain budget
    M = ref.get_rotation_matrix_2d((350.0, 300.0), 45.0, 0.125)
    exp = ref.warp_affine(img[0], M, (64, 72))[None]
    got = np.asarray(warp_affine_planes(jnp.asarray(img), M, (64, 72)))
    np.testing.assert_array_equal(got, exp)


def test_window_plan_budget_guard():
    # inverse map with 8x spread per output px -> window rows > budget
    cy = (np.arange(32 * 128).reshape(32, 128) * 97) % 4096
    cx = (np.arange(32 * 128).reshape(32, 128) * 31) % 4096
    with pytest.raises(kwarp.WindowTooLarge):
        kwarp.window_plan(cy.astype(np.int32), cx.astype(np.int32))
