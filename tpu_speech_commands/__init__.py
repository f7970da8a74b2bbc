"""tpu_speech_commands — TPU-native speech-commands (keyword spotting) framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
david8862/tf-keras-speech-commands: batched on-device MFCC/bark feature
frontend, flax CNN/RNN classifiers, sharded training/eval under pjit, a
streaming trigger-detection runtime, model export, and a native C++
deployment layer.
"""
from .params import ListenerParams, inject_params, pr, save_params

__version__ = "0.1.0"

__all__ = ["ListenerParams", "inject_params", "pr", "save_params", "__version__"]
