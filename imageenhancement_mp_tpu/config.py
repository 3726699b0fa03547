"""Runtime configuration: kernel-backend dispatch.

``use_pallas_kernels``: None (auto — Pallas on TPU, XLA elsewhere),
True (force Pallas, interpret-mode off-TPU), False (force XLA paths).
Resolved at trace time; set before first call or re-jit after changing.
"""

from __future__ import annotations

import jax

use_pallas_kernels: bool | None = None


def pallas_enabled() -> bool:
    if use_pallas_kernels is not None:
        return use_pallas_kernels
    return jax.default_backend() == "tpu"
