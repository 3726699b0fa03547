"""Shared utilities: shape canonicalization."""

from imageenhancement_mp_tpu.utils.shapes import as_planes

__all__ = ["as_planes"]
