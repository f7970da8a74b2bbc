from .decoder import ThresholdDecoder
from .feature_stream import (
    NumpyStreamReplica,
    StreamConfig,
    init_stream_state,
    make_stream_update,
    reset_streams,
)
from .listener import Listener, default_config
from .trigger import TriggerDetector, TriggerDetectorArray

__all__ = [
    "ThresholdDecoder",
    "TriggerDetector",
    "TriggerDetectorArray",
    "Listener",
    "default_config",
    "NumpyStreamReplica",
    "StreamConfig",
    "init_stream_state",
    "make_stream_update",
    "reset_streams",
]
