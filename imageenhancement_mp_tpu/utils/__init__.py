"""Shared utilities: shape canonicalization and exact cvRound helpers."""

from imageenhancement_mp_tpu.utils.rounding import round_half_even_ratio
from imageenhancement_mp_tpu.utils.shapes import as_planes

__all__ = ["as_planes", "round_half_even_ratio"]
