"""Randomized pipeline-chain fuzz: arbitrary compositions of registry ops
through ONE jitted program vs the same chain through the NumPy oracle.

Integration tier for the widened op surface: every stage interaction
(dtype flow, widened outputs, binarized intermediates feeding later
stages) is exercised in random order, not just the curated configs.
"""

import numpy as np
import pytest

from imageenhancement_mp_tpu import ref
from imageenhancement_mp_tpu.pipeline import make_pipeline

# (stage name, kwargs, single-image oracle).  u8-in/u8-out stages only so
# chains compose freely in any order.
CHAIN_POOL = [
    ("gamma", {"gamma": 0.7}, lambda p: ref.gamma_transform(p, 0.7)),
    ("log_transform", {}, ref.log_transform),
    ("contrast_stretch", {}, ref.contrast_stretch),
    ("equalize_hist", {}, ref.equalize_hist),
    ("clahe", {"clip_limit": 2.0, "tile_grid": (4, 4)},
     lambda p: ref.clahe(p, 2.0, (4, 4))),
    ("gaussian_blur", {"ksize": 5}, lambda p: ref.gaussian_blur(p, 5, 0.0)),
    ("box_blur", {"ksize": 3}, lambda p: ref.box_blur(p, 3)),
    ("median_blur", {"ksize": 3}, lambda p: ref.median_blur(p, 3)),
    ("unsharp_mask", {"amount": 1.5}, lambda p: ref.unsharp_mask(p, 1.5)),
    ("laplacian_sharpen", {}, ref.laplacian_sharpen),
    ("bilateral", {"d": 5, "sigma_color": 30.0, "sigma_space": 6.0},
     lambda p: ref.bilateral_filter(p, 5, 30.0, 6.0)),
    ("threshold", {"thresh": 100.0, "maxval": 200.0, "type": "tozero"},
     lambda p: ref.threshold(p, 100.0, 200.0, "tozero")[1]),
    ("adaptive_threshold",
     {"maxval": 255.0, "method": "gaussian", "type": "binary",
      "block_size": 5, "C": 2.0},
     lambda p: ref.adaptive_threshold(p, 255.0, "gaussian", "binary", 5, 2.0)),
    ("morphology", {"op": "close", "ksize": 3},
     lambda p: ref.morphology(p, "close", 3)),
    ("erode", {"ksize": (3, 5)}, lambda p: ref.erode(p, (3, 5))),
]


NONCLAHE_POOL = [t for t in CHAIN_POOL if t[0] != "clahe"]
CLAHE_STAGE = next(t for t in CHAIN_POOL if t[0] == "clahe")


@pytest.mark.parametrize("seed", range(8))
def test_random_chain_vs_oracle(rng, seed):
    """A random 3-5 stage chain, one jitted program, bit-exact vs the
    oracle chain.  CLAHE (the one CPU-backend-±1 stage, docs/PARITY.md)
    may only appear LAST: a ±1 budget is not closed under composition —
    a boundary pixel feeding a later threshold stage would amplify to a
    full maxval flip — so mid-chain CLAHE cannot carry a sound budget."""
    chain_rng = np.random.default_rng(1000 + seed)
    n = int(chain_rng.integers(3, 6))
    picks = [NONCLAHE_POOL[i] for i in chain_rng.choice(len(NONCLAHE_POOL), n)]
    with_clahe = bool(chain_rng.integers(0, 2))
    if with_clahe:
        picks.append(CLAHE_STAGE)
    pipe = make_pipeline([(name, kw) for name, kw, _ in picks])
    batch = rng.integers(0, 256, (2, 40, 47), dtype=np.uint8)
    got = np.asarray(pipe(batch))

    def oracle_one(p):
        for _, _, fn in picks:
            p = fn(p)
        return p

    want = np.stack([oracle_one(p) for p in batch])
    budget = 1 if with_clahe else 0
    diff = int(np.abs(got.astype(np.int64) - want.astype(np.int64)).max())
    assert diff <= budget, ([n for n, _, _ in picks], diff)


def test_everything_chain_vs_oracle(rng):
    """All pool stages once (CLAHE last — see above) — the maximal
    composition."""
    order = NONCLAHE_POOL + [CLAHE_STAGE]
    pipe = make_pipeline([(name, kw) for name, kw, _ in order])
    img = rng.integers(0, 256, (48, 53), dtype=np.uint8)
    got = np.asarray(pipe(img))
    p = img
    for _, _, fn in order:
        p = fn(p)
    diff = int(np.abs(got.astype(np.int64) - p.astype(np.int64)).max())
    assert diff <= 1  # CLAHE's CPU-backend budget, last stage only
