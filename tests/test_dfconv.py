"""Fused adaptiveThreshold(GAUSSIAN_C) Pallas kernel parity (interpret tier).

Pins kernels/dfconv.py against the ref/ oracle (itself fuzz-pinned vs
cv2 — ref/ops.py adaptive_threshold) on wide-eligible shapes, plus the
ops-layer dispatch with forced Pallas.
"""

import numpy as np
import pytest

from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.kernels.dfconv import (
    adaptive_threshold_gaussian_pallas,
    supports_athresh_wide,
)
from imageenhancement_mp_tpu.ref.ops import gaussian_kernel


def maxdiff(a, b):
    return int(
        np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)).max()
    )


def test_supports_predicate():
    import jax.numpy as jnp

    assert supports_athresh_wide((1, 64, 256), jnp.uint8, 11)
    assert not supports_athresh_wide((1, 64, 256), jnp.uint8, 19)  # r > 8
    assert not supports_athresh_wide((1, 64, 200), jnp.uint8, 11)
    assert not supports_athresh_wide((1, 60, 256), jnp.uint8, 11)
    assert not supports_athresh_wide((1, 64, 256), jnp.uint16, 11)


@pytest.mark.parametrize("bs", [3, 5, 11])
@pytest.mark.parametrize("type_", ["binary", "binary_inv"])
def test_athresh_gaussian_kernel(rng, bs, type_):
    x = rng.integers(0, 256, (2, 64, 256), dtype=np.uint8)
    C = 2.0
    taps = [float(t) for t in gaussian_kernel(bs, 0.0)]
    idelta = int(np.ceil(C)) if type_ == "binary" else int(np.floor(C))
    got = adaptive_threshold_gaussian_pallas(
        x, taps, 255, idelta, type_ == "binary_inv"
    )
    want = np.stack(
        [ref.adaptive_threshold(p, 255.0, "gaussian", type_, bs, C) for p in x]
    )
    assert maxdiff(got, want) == 0


@pytest.mark.parametrize("C", [-3.5, 0.0, 7.2])
def test_athresh_gaussian_C(rng, C):
    x = rng.integers(0, 256, (1, 96, 384), dtype=np.uint8)
    taps = [float(t) for t in gaussian_kernel(11, 0.0)]
    idelta = int(np.ceil(C))
    got = adaptive_threshold_gaussian_pallas(x, taps, 200, idelta, False)
    want = ref.adaptive_threshold(x[0], 200.0, "gaussian", "binary", 11, C)[None]
    assert maxdiff(got, want) == 0


def test_athresh_multitile(rng):
    x = rng.integers(0, 256, (1, 256, 256), dtype=np.uint8)
    taps = [float(t) for t in gaussian_kernel(11, 0.0)]
    got = adaptive_threshold_gaussian_pallas(x, taps, 255, 2, False)
    want = ref.adaptive_threshold(x[0], 255.0, "gaussian", "binary", 11, 2.0)[None]
    assert maxdiff(got, want) == 0


def test_ops_dispatch_forced_pallas(rng):
    from imageenhancement_mp_tpu import config
    from imageenhancement_mp_tpu.ops.threshold import adaptive_threshold_planes

    x = rng.integers(0, 256, (2, 64, 256), dtype=np.uint8)
    config.use_pallas_kernels = True
    try:
        got = adaptive_threshold_planes(x, 255.0, "gaussian", "binary", 11, 2.0)
    finally:
        config.use_pallas_kernels = None
    want = np.stack(
        [ref.adaptive_threshold(p, 255.0, "gaussian", "binary", 11, 2.0) for p in x]
    )
    assert maxdiff(got, want) == 0


def test_ops_dispatch_narrow_unchanged(rng):
    # non-wide shapes keep the XLA df path
    from imageenhancement_mp_tpu import config
    from imageenhancement_mp_tpu.ops.threshold import adaptive_threshold_planes

    x = rng.integers(0, 256, (1, 50, 131), dtype=np.uint8)
    config.use_pallas_kernels = True
    try:
        got = adaptive_threshold_planes(x, 255.0, "gaussian", "binary", 11, 2.0)
    finally:
        config.use_pallas_kernels = None
    want = ref.adaptive_threshold(x[0], 255.0, "gaussian", "binary", 11, 2.0)[None]
    assert maxdiff(got, want) == 0
