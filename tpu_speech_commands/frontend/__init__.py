from . import numpy_ref
from .dsp import Frontend, add_deltas, frame_signal, safe_log

__all__ = ["numpy_ref", "Frontend", "add_deltas", "frame_signal", "safe_log"]
