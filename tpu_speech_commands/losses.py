"""Classification losses (reference: classifier/loss.py:7-77, train.py:65-71).

The reference computes cross-entropy on softmax outputs; here models emit
logits and losses use log_softmax — mathematically identical, numerically
stabler, and lets XLA fuse softmax+CE into one kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sparse_categorical_crossentropy(
    labels: jax.Array,
    logits: jax.Array,
    ignore_index: int | None = None,
) -> jax.Array:
    """Per-sample CE. labels (B,) int, logits (B, C); optional ignore mask
    (loss.py:7-42)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    losses = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if ignore_index is not None:
        losses = losses * (labels != ignore_index).astype(losses.dtype)
    return losses


def weighted_sparse_categorical_crossentropy(
    labels: jax.Array,
    logits: jax.Array,
    class_weights: jax.Array,
    ignore_index: int | None = None,
) -> jax.Array:
    """Per-sample CE scaled by the label's class weight (loss.py:45-77)."""
    losses = sparse_categorical_crossentropy(labels, logits, ignore_index)
    return losses * jnp.asarray(class_weights)[labels]


def background_bias_weights(bias: float, num_classes: int) -> np.ndarray:
    """Class-weight vector for --background_bias (train.py:65-71):
    [bias] + [(1-bias)/(C-1)] * (C-1).  bias=0.99 puts 99% of the loss mass
    on the background class to suppress false positives."""
    if not 0.0 < bias < 1.0:  # not assert: python -O must still reject
        raise ValueError("background_bias should be in (0, 1)")
    if num_classes < 2:
        raise ValueError("background_bias needs at least 2 classes")
    rest = (1.0 - bias) / (num_classes - 1)
    return np.array([bias] + [rest] * (num_classes - 1), dtype=np.float32)


def make_loss_fn(num_classes: int, background_bias: float | None = None):
    """Per-sample loss closure used by the train step (the trainer applies
    the padded-batch mask and reduces)."""
    if background_bias is not None:
        weights = jnp.asarray(background_bias_weights(background_bias, num_classes))

        def loss_fn(labels, logits):
            return weighted_sparse_categorical_crossentropy(labels, logits, weights)

    else:

        def loss_fn(labels, logits):
            return sparse_categorical_crossentropy(labels, logits)

    return loss_fn
