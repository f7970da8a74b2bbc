"""Model factory (reference: classifier/model.py:14-46).

CNN models take 4-D input (B, n_features, feature_size, 1); RNN models take
3-D (B, n_features, feature_size).  All models return **logits** of shape
(B, num_classes); the softmax lives at the loss / inference boundary (the
reference bakes it into the graph as the `score_predict` layer — apply
`score_fn` for reference-compatible probabilities).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..params import pr
from .cnn import SimpleCNN, SimpleCNNLite
from .rnn import SimpleGRU, SimpleLSTM

MODEL_TYPES = ("simple_cnn", "simple_cnn_lite", "simple_gru", "simple_lstm")
CNN_MODEL_TYPES = ("simple_cnn", "simple_cnn_lite")


def is_cnn(model_type: str) -> bool:
    return model_type in CNN_MODEL_TYPES


def get_model(model_type: str, num_classes: int, dtype=jnp.float32,
              bn_momentum: float = 0.99, num_layers: int = 1):
    """Build a model instance for the given type.

    num_layers stacks RNN layers (reference rnn.py num_layers param, not
    exposed by its model.py); CNNs reject num_layers != 1."""
    if is_cnn(model_type) and num_layers != 1:
        raise ValueError(f"num_layers only applies to RNN models, not {model_type}")
    if num_layers < 1:
        raise ValueError(f"num_layers must be >= 1, got {num_layers}")
    if model_type == "simple_cnn":
        return SimpleCNN(num_classes=num_classes, dtype=dtype,
                         bn_momentum=bn_momentum)
    elif model_type == "simple_cnn_lite":
        return SimpleCNNLite(num_classes=num_classes, dtype=dtype,
                             bn_momentum=bn_momentum)
    elif model_type == "simple_gru":
        return SimpleGRU(num_classes=num_classes, recurrent_units=48,
                         num_layers=num_layers, dtype=dtype)
    elif model_type == "simple_lstm":
        return SimpleLSTM(num_classes=num_classes, recurrent_units=48,
                          num_layers=num_layers, dtype=dtype)
    raise ValueError("Unsupported model type")


def input_shape(model_type: str, batch_size: int | None = None, params=None):
    """Model input shape: 4-D for CNNs, 3-D for RNNs (model.py:17-20)."""
    p = params or pr
    base = (p.n_features, p.feature_size)
    shape = base + (1,) if is_cnn(model_type) else base
    return (batch_size,) + shape if batch_size else shape


def features_to_input(features: jax.Array, model_type: str) -> jax.Array:
    """(B, T, F) frontend output -> model input (adds channel dim for CNNs).

    Idempotent on already-channelised (B, T, F, 1) input; works on numpy
    arrays too (the trainer's host-side staging uses it)."""
    if is_cnn(model_type) and features.ndim == 3:
        return features[..., None]
    return features


def init_model(model_type, num_classes, rng, batch_size=2, dtype=jnp.float32,
               params=None, num_layers=1, bn_momentum=None):
    """Build and initialise; returns (model, variables)."""
    kwargs = {} if bn_momentum is None else {"bn_momentum": bn_momentum}
    model = get_model(model_type, num_classes, dtype=dtype,
                      num_layers=num_layers, **kwargs)
    dummy = jnp.zeros(input_shape(model_type, batch_size, params), jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    return model, variables


def score_fn(logits: jax.Array) -> jax.Array:
    """Reference-compatible `score_predict` softmax output."""
    return jax.nn.softmax(logits, axis=-1)
