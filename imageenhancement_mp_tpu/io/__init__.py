"""Host-side IO runtime: native prefetching frame loader."""

from imageenhancement_mp_tpu.io.loader import FrameLoader

__all__ = ["FrameLoader"]
