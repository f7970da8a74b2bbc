"""Stacked (num_layers > 1) RNN models — reference rnn.py:28-35 mid layers
return sequences, last layer returns the final state."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_speech_commands.models.rnn import SimpleGRU, SimpleLSTM


def test_two_layer_gru_forward_and_grads():
    model = SimpleGRU(num_classes=4, recurrent_units=16, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 30, 20))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    # both layers present
    assert "gru_unit_0" in variables["params"]["backbone"]
    assert "gru_unit_1" in variables["params"]["backbone"]
    # layer 1 consumes layer-0's sequence: kernel input dim = units
    k1 = variables["params"]["backbone"]["gru_unit_1"]["kernel"]
    assert k1.shape == (16, 48)

    logits = model.apply(variables, x, train=False)
    assert logits.shape == (3, 4)

    def loss(params):
        out = model.apply({"params": params}, x, train=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        return (out ** 2).mean()

    grads = jax.grad(loss)(variables["params"])
    g0 = np.abs(np.asarray(
        grads["backbone"]["gru_unit_0"]["kernel"])).max()
    assert g0 > 0  # gradient reaches the bottom layer through the stack


def test_two_layer_lstm_forward():
    model = SimpleLSTM(num_classes=3, recurrent_units=8, num_layers=2)
    x = jnp.ones((2, 30, 20))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert "lstm_unit_1" in variables["params"]["backbone"]
    assert model.apply(variables, x, train=False).shape == (2, 3)
