"""Host-side IO runtime: native prefetching frame loader + async writer."""

from imageenhancement_mp_tpu.io.loader import FrameError, FrameLoader
from imageenhancement_mp_tpu.io.writer import FrameWriter

__all__ = ["FrameError", "FrameLoader", "FrameWriter"]
