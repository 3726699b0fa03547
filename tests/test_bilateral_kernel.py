"""Fused bilateral Pallas kernel parity (kernels/bilateral.py) —
interpret tier vs the ref/ oracle."""

import numpy as np
import pytest

from imageenhancement_mp_tpu import ref


def maxdiff(a, b):
    return int(
        np.abs(np.asarray(a).astype(np.int64) - np.asarray(b).astype(np.int64)).max()
    )


def _forced(x, d, sc, ss):
    from imageenhancement_mp_tpu import config
    from imageenhancement_mp_tpu.ops.bilateral import bilateral_planes

    config.use_pallas_kernels = True
    try:
        return bilateral_planes(x, d, sc, ss)
    finally:
        config.use_pallas_kernels = None


@pytest.mark.parametrize("d,sc,ss", [(5, 50.0, 50.0), (9, 75.0, 75.0)])
def test_bilateral_kernel_vs_ref(rng, d, sc, ss):
    x = rng.integers(0, 256, (2, 64, 256), dtype=np.uint8)
    got = _forced(x, d, sc, ss)
    want = np.stack([ref.bilateral_filter(p, d, sc, ss) for p in x])
    assert maxdiff(got, want) == 0


def test_bilateral_kernel_multitile(rng):
    x = rng.integers(0, 256, (1, 128, 384), dtype=np.uint8)
    got = _forced(x, 9, 30.0, 30.0)
    want = ref.bilateral_filter(x[0], 9, 30.0, 30.0)[None]
    assert maxdiff(got, want) == 0


def test_bilateral_narrow_falls_back(rng):
    x = rng.integers(0, 256, (1, 50, 131), dtype=np.uint8)
    got = _forced(x, 5, 50.0, 50.0)
    want = ref.bilateral_filter(x[0], 5, 50.0, 50.0)[None]
    assert maxdiff(got, want) == 0


def test_supports_predicate():
    import jax.numpy as jnp

    from imageenhancement_mp_tpu.kernels.bilateral import supports_bilateral_wide

    assert supports_bilateral_wide((1, 64, 256), jnp.uint8, 4)
    assert not supports_bilateral_wide((1, 64, 256), jnp.uint8, 9)
    assert not supports_bilateral_wide((1, 64, 200), jnp.uint8, 4)
    assert not supports_bilateral_wide((1, 60, 256), jnp.uint8, 4)
