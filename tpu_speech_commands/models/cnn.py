"""CNN keyword-spotting backbones (flax.linen).

TPU-native re-implementations of the reference Keras models
(`classifier/models/cnn.py:11-141` in david8862/tf-keras-speech-commands):

- SimpleCNN: 4 conv blocks [16,s1 -> 32,s1 -> 64,s2 -> 128,s1], each
  Conv(3x3, same, no bias) -> BatchNorm -> ReLU6, MaxPool(2) after blocks
  1, 2 and 4; then Flatten -> Dropout(0.5) -> Dense(128) -> ReLU6.
  The 4th conv carries an inline relu before its BatchNorm (a quirk of the
  reference, `cnn.py:53-58`), preserved here.
- SimpleCNNLite: same topology with separable (depthwise+pointwise) convs,
  bias enabled (`cnn.py:77-141`); convs 3 and 4 carry the inline relu.

Keras-default semantics preserved: BatchNorm momentum 0.99 / epsilon 1e-3,
glorot-uniform kernel init, valid-padding 2x2 max-pool.  Inputs are NHWC
(B, n_features, feature_size, 1); parameters stay float32 while activations
follow `dtype` (bfloat16 for TPU throughput, float32 for parity runs).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class _ConvBlock(nn.Module):
    """Conv -> (inline relu) -> BatchNorm -> ReLU6 -> (MaxPool)."""

    features: int
    strides: int = 1
    separable: bool = False
    inline_relu: bool = False
    pool: bool = False
    dtype: Dtype = jnp.float32
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.separable:
            # Keras SeparableConv2D: depthwise (no bias) then pointwise with
            # a single bias after the pointwise projection.
            in_ch = x.shape[-1]
            x = nn.Conv(
                features=in_ch,
                kernel_size=(3, 3),
                strides=(self.strides, self.strides),
                padding="SAME",
                feature_group_count=in_ch,
                use_bias=False,
                dtype=self.dtype,
                name="depthwise",
            )(x)
            x = nn.Conv(
                features=self.features,
                kernel_size=(1, 1),
                use_bias=True,
                dtype=self.dtype,
                name="pointwise",
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=(3, 3),
                strides=(self.strides, self.strides),
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.inline_relu:
            x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        x = relu6(x)
        if self.pool:
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x


class SimpleCNN(nn.Module):
    """Reference SimpleCNN backbone + optional softmax-head classifier."""

    num_classes: int
    feature_size: int = 128
    dropout_rate: float = 0.5
    separable: bool = False
    dtype: Dtype = jnp.float32
    # Keras default; lower (e.g. 0.9) converges running stats faster on
    # short runs — eval uses running averages, so this matters for small
    # datasets (see CLAUDE.md)
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, train: bool = False, skip_block1: bool = False):
        x = x.astype(self.dtype)
        sep = self.separable
        bm = self.bn_momentum
        # blocks: (features, strides, inline_relu, pool) — inline relu on
        # block 4 (both variants) and block 3 (lite variant only), matching
        # the reference activation placement.
        # skip_block1: inference entry for the fused Pallas block-1 kernel
        # (ops/pallas_cnn.py) — x is already the pooled (B, H/2, W/2, 16)
        # activation; train still runs the full XLA graph.
        if not skip_block1:
            x = _ConvBlock(16, 1, sep, False, True, self.dtype, bm,
                           name="block1")(x, train)
        x = _ConvBlock(32, 1, sep, False, True, self.dtype, bm, name="block2")(x, train)
        x = _ConvBlock(64, 2, sep, sep, False, self.dtype, bm, name="block3")(x, train)
        x = _ConvBlock(128, 1, sep, True, True, self.dtype, bm, name="block4")(x, train)
        x = x.reshape((x.shape[0], -1))  # NHWC flatten, same order as Keras
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.feature_size, dtype=self.dtype, name="feature_dense")(x)
        x = relu6(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="score_predict")(
            x.astype(jnp.float32)
        )
        return logits


def SimpleCNNLite(num_classes: int, **kwargs) -> SimpleCNN:
    """Separable-conv variant (reference SimpleCNNLite, cnn.py:77-141)."""
    return SimpleCNN(num_classes=num_classes, separable=True, **kwargs)
