"""Pipeline composition: fuse enhancement chains into one jitted program.

The reference applies enhancements as sequential per-image OpenCV calls
(BASELINE.json:5); here a chain like ``median → CLAHE → unsharp``
(config 5, BASELINE.json:11) composes into a single XLA program — one
compile, no host round-trips between stages, elementwise stages fused by
XLA.  Stages that need global state (histograms, CLAHE tile LUTs) become
program-internal reductions, not HBM round-trips to the host.

Also hosts the flagship fused op of the north-star metric
(BASELINE.json:2): ``equalize_hist → unsharp_mask`` as one program.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from imageenhancement_mp_tpu.ops import OP_REGISTRY
from imageenhancement_mp_tpu.ops.filters import unsharp_mask_planes
from imageenhancement_mp_tpu.ops.histogram import equalize_hist_planes
from imageenhancement_mp_tpu.utils.shapes import as_planes

__all__ = ["OP_REGISTRY", "make_pipeline", "equalize_unsharp", "stream_frames"]

Stage = tuple[str, dict[str, Any]]


def make_pipeline(
    stages: Sequence[Stage | str], channels_last: bool = True
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Compose named stages into one jitted callable over batched images.

    ``stages``: sequence of ``name`` or ``(name, kwargs)``; kwargs must be
    static (hashable).  ``channels_last=False`` reads 3-D inputs as
    ``[N, H, W]`` grayscale even when W ≤ 4 (utils/shapes.py).
    Example (config 5)::

        pipe = make_pipeline([
            ("median_blur", {"ksize": 5}),
            ("clahe", {"clip_limit": 2.0, "tile_grid": (8, 8)}),
            ("unsharp_mask", {"amount": 1.0}),
        ])
        out = pipe(batch_u8)   # [N,H,W[,C]] uint8
    """
    _BACKEND_AWARE = {"gaussian_blur", "unsharp_mask", "median_blur"}
    norm: list[tuple[str, tuple[tuple[str, Any], ...]]] = []
    multi = len(stages) > 1
    for s in stages:
        if isinstance(s, str):
            name, kwargs = s, {}
        else:
            name, kwargs = s
        if name not in OP_REGISTRY:
            raise KeyError(f"unknown op {name!r}; available: {sorted(OP_REGISTRY)}")
        kwargs = dict(kwargs)
        # Multi-stage chains default to the XLA backend: adjacent stages
        # fuse into single HBM passes and the chain stays in one compiler
        # view (clean A/B: equal speed to Pallas-in-chain; docs/DESIGN §4).
        if multi and name in _BACKEND_AWARE:
            kwargs.setdefault("backend", "xla")
        norm.append((name, tuple(sorted(kwargs.items()))))
    norm_t = tuple(norm)

    @jax.jit
    def run_jit(img: jnp.ndarray) -> jnp.ndarray:
        planes, restore = as_planes(img, channels_last=channels_last)
        for name, kw in norm_t:
            planes = OP_REGISTRY[name](planes, **dict(kw))
        return restore(planes)

    def run(img: jnp.ndarray) -> jnp.ndarray:
        if img.dtype not in (jnp.uint8, jnp.uint16, jnp.int16, jnp.float32):
            raise TypeError(
                f"expected uint8/uint16/int16/float32 image array, got {img.dtype}"
            )
        return run_jit(img)

    return run


@partial(jax.jit, static_argnames=("amount", "ksize", "sigma"))
def _equalize_unsharp_jit(img, amount, ksize, sigma):
    planes, restore = as_planes(img)
    eq = equalize_hist_planes(planes)
    # backend="xla": keeps gather+conv+epilogue in one compiler view (equal
    # speed to the Pallas-kernel variant in clean A/B; docs/DESIGN.md §4)
    return restore(unsharp_mask_planes(eq, amount, ksize, sigma, backend="xla"))


def stream_frames(pipe: Callable, frames, depth: int = 2):
    """Stream frames/batches through a pipeline with transfer/compute overlap.

    Config 5 (BASELINE.json:11): "streaming batched 4K frames via
    double-buffered DMA".  Two levels of double buffering:

    * host↔device: ``jax.device_put`` is asynchronous and JAX dispatch is
      non-blocking, so with ``depth`` batches in flight the H2D transfer of
      batch t+1 and the compute of batch t overlap (classic double buffer
      at ``depth=2``);
    * within the device program, the Pallas kernels stream row stripes
      HBM→VMEM with their own double-buffered DMA (kernels/conv.py).

    Yields device arrays in order; convert with np.asarray when needed (on
    this environment's axon tunnel, device→host transfers serialize
    subsequent dispatch — keep results on device when chaining).
    """
    from collections import deque

    q: deque = deque()
    for frame in frames:
        x = jax.device_put(frame)
        q.append(pipe(x))
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def equalize_unsharp(
    img: jnp.ndarray, amount: float = 1.0, ksize: int = 5, sigma: float = 0.0
) -> jnp.ndarray:
    """North-star fused pipeline: hist-eq → unsharp (BASELINE.json:2).

    One XLA program: the LUT gather fuses into the conv pass, giving two
    HBM passes total (hist + gather·conv·epilogue).
    """
    if img.dtype != jnp.uint8:
        raise TypeError(f"expected uint8 image array, got {img.dtype}")
    return _equalize_unsharp_jit(img, float(amount), int(ksize), float(sigma))
