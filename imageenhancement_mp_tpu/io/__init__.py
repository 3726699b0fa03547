"""Host-side IO runtime: native prefetching frame loader."""

from imageenhancement_mp_tpu.io.loader import FrameError, FrameLoader

__all__ = ["FrameError", "FrameLoader"]
