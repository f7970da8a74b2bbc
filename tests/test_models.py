"""Model-family tests: shapes, determinism, gradient flow, cell math."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_speech_commands.models import (
    MODEL_TYPES,
    features_to_input,
    init_model,
    input_shape,
    is_cnn,
    score_fn,
)
from tpu_speech_commands.models.rnn import GRUCellKeras, LSTMCellKeras


@pytest.mark.parametrize("model_type", MODEL_TYPES)
def test_forward_shapes(model_type):
    rng = jax.random.PRNGKey(0)
    model, variables = init_model(model_type, num_classes=5, rng=rng, batch_size=3)
    x = jnp.ones((3,) + input_shape(model_type), jnp.float32)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (3, 5)
    probs = score_fn(logits)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("model_type", MODEL_TYPES)
def test_train_step_gradients_flow(model_type):
    rng = jax.random.PRNGKey(1)
    model, variables = init_model(model_type, num_classes=4, rng=rng, batch_size=2)
    x = jax.random.normal(jax.random.PRNGKey(2), (2,) + input_shape(model_type))
    y = jnp.array([1, 3])

    def loss(params):
        out = model.apply(
            {**variables, "params": params},
            x,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"] if "batch_stats" in variables else [],
        )
        logits = out[0] if isinstance(out, tuple) else out
        oh = jax.nn.one_hot(y, 4)
        return -(oh * jax.nn.log_softmax(logits)).sum(-1).mean()

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


def test_features_to_input_channel_dim():
    feats = jnp.zeros((2, 30, 20))
    assert features_to_input(feats, "simple_cnn").shape == (2, 30, 20, 1)
    assert features_to_input(feats, "simple_gru").shape == (2, 30, 20)
    assert is_cnn("simple_cnn_lite") and not is_cnn("simple_lstm")


def test_gru_cell_matches_manual_math(rng):
    cell = GRUCellKeras(units=4)
    x = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    variables = cell.init(jax.random.PRNGKey(0), h, x)
    out = np.asarray(cell.apply(variables, h, x))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    k, r, bi, br = p["kernel"], p["recurrent_kernel"], p["bias_input"], p["bias_recurrent"]
    xw = np.asarray(x) @ k + bi
    hw = np.asarray(h) @ r + br
    sig = lambda v: 1 / (1 + np.exp(-v))
    z = sig(xw[:, :4] + hw[:, :4])
    rr = sig(xw[:, 4:8] + hw[:, 4:8])
    cand = xw[:, 8:] + rr * hw[:, 8:]  # linear activation, reset_after
    expect = z * np.asarray(h) + (1 - z) * cand
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_lstm_cell_matches_manual_math(rng):
    cell = LSTMCellKeras(units=4)
    x = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
    variables = cell.init(jax.random.PRNGKey(0), (h, c), x)
    h_new, c_new = cell.apply(variables, (h, c), x)

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    # unit forget bias: forget-gate slice initialised to one
    np.testing.assert_allclose(p["bias"][4:8], 1.0)
    gates = np.asarray(x) @ p["kernel"] + np.asarray(h) @ p["recurrent_kernel"] + p["bias"]
    sig = lambda v: 1 / (1 + np.exp(-v))
    i, f, g, o = np.split(gates, 4, axis=-1)
    c_exp = sig(f) * np.asarray(c) + sig(i) * np.tanh(g)
    h_exp = sig(o) * np.tanh(c_exp)
    np.testing.assert_allclose(np.asarray(c_new), c_exp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_new), h_exp, rtol=1e-5, atol=1e-6)


def test_dropout_changes_training_output():
    rng = jax.random.PRNGKey(0)
    model, variables = init_model("simple_cnn", num_classes=5, rng=rng, batch_size=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2,) + input_shape("simple_cnn"))
    out1, _ = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(10)},
        mutable=["batch_stats"],
    )
    out2, _ = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(11)},
        mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
