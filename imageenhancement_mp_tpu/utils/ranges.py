"""The integer dtype value-range table — ONE source of truth.

Every op that saturates or pads at a dtype's bounds routes through here
(ops/filters, ops/threshold, ops/morphology, ops/pointwise); a dtype
added in one place is added everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["int_bounds"]

_BOUNDS = {
    jnp.dtype(jnp.uint8): (0, 255),
    jnp.dtype(jnp.uint16): (0, 65535),
    jnp.dtype(jnp.int16): (-32768, 32767),
}


def int_bounds(dtype) -> tuple[int, int]:
    """(min, max) representable value of an integer image dtype."""
    return _BOUNDS[jnp.dtype(dtype)]
