"""Native host runtime: C++ frame-ingest ring + timestamp pairing, with a
pure-Python fallback when the native library isn't available."""

from ros_gpu_stereo_processor_tpu.runtime.ingest import (
    FrameRing,
    StereoPairer,
    StreamingIngest,
    native_available,
)

__all__ = ["FrameRing", "StereoPairer", "StreamingIngest", "native_available"]
