"""Recurrent keyword-spotting models as `lax.scan` cells (flax.linen).

TPU-native re-implementations of the reference Keras RNN models
(`classifier/models/rnn.py:10-79`): stacked GRU/LSTM(48) scanning the
30-frame feature sequence, final hidden state -> softmax head.

Keras semantics preserved:
- GRU: reset_after=True (separate input/recurrent biases, recurrent bias
  inside the reset gate), recurrent_activation=sigmoid, and the reference's
  `activation='linear'` (identity candidate activation, rnn.py:31-35).
- LSTM: activation=tanh, recurrent_activation=sigmoid, unit_forget_bias
  (forget-gate bias initialised to 1).
- dropout=0.2 applied to the *inputs* with one mask shared across all
  timesteps (Keras RNN dropout semantics).
- kernel glorot_uniform, recurrent kernel orthogonal, biases zero.

The time loop is a `jax.lax.scan` over n_features steps — static shapes,
single compiled loop body, differentiable on TPU (BASELINE config 3
exercises this fwd/bwd).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class GRUCellKeras(nn.Module):
    """Keras-convention GRU cell (reset_after=True), gate order [z, r, h]."""

    units: int
    activation: Any = None  # None -> identity ('linear' in the reference)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        u = self.units
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (x.shape[-1], 3 * u)
        ).astype(self.dtype)
        recurrent = self.param(
            "recurrent_kernel", nn.initializers.orthogonal(), (u, 3 * u)
        ).astype(self.dtype)
        bias_i = self.param("bias_input", nn.initializers.zeros, (3 * u,)).astype(
            self.dtype
        )
        bias_r = self.param("bias_recurrent", nn.initializers.zeros, (3 * u,)).astype(
            self.dtype
        )

        xw = x @ kernel + bias_i
        hw = h @ recurrent + bias_r
        xz, xr, xh = jnp.split(xw, 3, axis=-1)
        hz, hr, hh = jnp.split(hw, 3, axis=-1)

        z = nn.sigmoid(xz + hz)
        r = nn.sigmoid(xr + hr)
        cand = xh + r * hh  # reset_after: recurrent part gated post-bias
        if self.activation is not None:
            cand = self.activation(cand)
        h_new = z * h + (1.0 - z) * cand
        return h_new


class LSTMCellKeras(nn.Module):
    """Keras-convention LSTM cell, gate order [i, f, c, o], unit forget bias."""

    units: int
    activation: Any = jnp.tanh
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        h, c = carry
        u = self.units

        def forget_one_bias(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            return b.at[u : 2 * u].set(1.0)

        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(), (x.shape[-1], 4 * u)
        ).astype(self.dtype)
        recurrent = self.param(
            "recurrent_kernel", nn.initializers.orthogonal(), (u, 4 * u)
        ).astype(self.dtype)
        bias = self.param("bias", forget_one_bias, (4 * u,)).astype(self.dtype)

        gates = x @ kernel + h @ recurrent + bias
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = nn.sigmoid(i), nn.sigmoid(f), nn.sigmoid(o)
        c_new = f * c + i * self.activation(g)
        h_new = o * self.activation(c_new)
        return (h_new, c_new)


class _RecurrentStack(nn.Module):
    """Stacked RNN over (B, T, D) with Keras-style shared-mask input dropout."""

    cell_type: str  # 'gru' | 'lstm'
    units: int = 48
    num_layers: int = 1
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        batch = x.shape[0]
        for layer in range(self.num_layers):
            if train and self.dropout_rate > 0.0:
                # one dropout mask per sequence, shared across timesteps
                rng = self.make_rng("dropout")
                keep = 1.0 - self.dropout_rate
                mask = jax.random.bernoulli(rng, keep, (batch, 1, x.shape[-1]))
                x = jnp.where(mask, x / keep, 0.0).astype(self.dtype)

            if self.cell_type == "gru":
                cell = GRUCellKeras(
                    self.units, dtype=self.dtype, name=f"gru_unit_{layer}"
                )
                init = jnp.zeros((batch, self.units), self.dtype)

                def step(cell, carry, xt):
                    h = cell(carry, xt)
                    return h, h

            else:
                cell = LSTMCellKeras(
                    self.units, dtype=self.dtype, name=f"lstm_unit_{layer}"
                )
                init = (
                    jnp.zeros((batch, self.units), self.dtype),
                    jnp.zeros((batch, self.units), self.dtype),
                )

                def step(cell, carry, xt):
                    carry = cell(carry, xt)
                    return carry, carry[0]

            scan = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            carry, seq = scan(cell, init, x)
            last = seq[:, -1, :]
            x = seq  # next layer consumes the full sequence
        return last


class SimpleGRU(nn.Module):
    """Reference SimpleGRU (rnn.py:10-43) + softmax head; returns logits."""

    num_classes: int
    recurrent_units: int = 48
    num_layers: int = 1
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = _RecurrentStack(
            "gru",
            self.recurrent_units, self.num_layers, self.dropout_rate, self.dtype,
            name="backbone",
        )(x, train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="score_predict")(
            feat.astype(jnp.float32)
        )


class SimpleLSTM(nn.Module):
    """Reference SimpleLSTM (rnn.py:46-79) + softmax head; returns logits."""

    num_classes: int
    recurrent_units: int = 48
    num_layers: int = 1
    dropout_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = _RecurrentStack(
            "lstm",
            self.recurrent_units, self.num_layers, self.dropout_rate, self.dtype,
            name="backbone",
        )(x, train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="score_predict")(
            feat.astype(jnp.float32)
        )
