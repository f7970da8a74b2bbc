"""Fused RNN classifier Pallas kernel vs the XLA/flax forward (interpret
mode on CPU).  ops/pallas_rnn.py is the serving-path replacement for the
`lax.scan` GRU/LSTM forward: one kernel, hoisted input projections,
recurrence unrolled in VMEM (mirrors the reference's
classifier/models/rnn.py:10-79 semantics via models/rnn.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_speech_commands.models import get_model
from tpu_speech_commands.ops.pallas_rnn import make_fused_rnn_classifier


def _init(model_type, num_classes, t, d, seed=0, **kw):
    model = get_model(model_type, num_classes, **kw)
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (8, t, d))
    variables = model.init({"params": rng}, x, train=False)
    return model, variables


@pytest.mark.parametrize("model_type,cell", [
    ("simple_gru", "gru"), ("simple_lstm", "lstm"),
])
def test_fused_rnn_matches_full_apply(model_type, cell):
    t, d = 30, 20
    model, variables = _init(model_type, 5, t, d)
    x = jax.random.normal(jax.random.PRNGKey(42), (8, t, d))

    fused = make_fused_rnn_classifier(
        variables, cell_type=cell, n_features=t, feature_size=d,
        batch_tile=4, interpret=True,
    )
    got = np.asarray(fused(x))
    want = np.asarray(model.apply(variables, x, train=False))
    assert got.shape == want.shape == (8, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_type,cell", [
    ("simple_gru", "gru"), ("simple_lstm", "lstm"),
])
def test_fused_rnn_stacked(model_type, cell):
    """num_layers=2: layer 1's full output sequence feeds layer 2."""
    t, d = 30, 20
    model, variables = _init(model_type, 7, t, d, seed=3, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, t, d))

    fused = make_fused_rnn_classifier(
        variables, cell_type=cell, n_features=t, feature_size=d,
        batch_tile=4, interpret=True,
    )
    got = np.asarray(fused(x))
    want = np.asarray(model.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_rnn_accepts_4d_and_rejects_bad_shapes():
    t, d = 30, 20
    model, variables = _init("simple_gru", 5, t, d, seed=1)
    fused = make_fused_rnn_classifier(
        variables, cell_type="gru", n_features=t, feature_size=d,
        batch_tile=4, interpret=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (4, t, d, 1))
    got = np.asarray(fused(x))  # trailing channel dim squeezed
    want = np.asarray(model.apply(variables, x[..., 0], train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError):
        fused(jnp.zeros((6, t, d)))  # batch not a tile multiple
    with pytest.raises(ValueError):
        fused(jnp.zeros((4, t + 1, d)))  # wrong sequence length
    with pytest.raises(ValueError):
        make_fused_rnn_classifier(variables, cell_type="rwkv")


def test_fused_rnn_bf16_close_to_f32():
    """compute_dtype=bfloat16 (the serving default on TPU) stays within
    bf16 tolerance of the f32 reference — gates/accumulators run f32."""
    t, d = 30, 20
    model, variables = _init("simple_gru", 5, t, d, seed=4)
    x = jax.random.normal(jax.random.PRNGKey(7), (8, t, d))
    fused = make_fused_rnn_classifier(
        variables, cell_type="gru", n_features=t, feature_size=d,
        batch_tile=8, interpret=True, compute_dtype=jnp.bfloat16,
    )
    got = np.asarray(fused(x))
    want = np.asarray(model.apply(variables, x, train=False))
    # logits are O(1); bf16 matmuls with f32 accumulation keep ~2 decimals
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_fused_rnn_time_major_bit_identical():
    """time_major consumes (T, B, D) — the fused frontend's transpose-free
    handoff layout — and must score bit-identically to batch-major."""
    t, d = 30, 20
    _, variables = _init("simple_gru", 5, t, d, seed=4)
    x = jax.random.normal(jax.random.PRNGKey(11), (8, t, d))
    bm = make_fused_rnn_classifier(
        variables, cell_type="gru", n_features=t, feature_size=d,
        batch_tile=4, interpret=True,
    )
    tm = make_fused_rnn_classifier(
        variables, cell_type="gru", n_features=t, feature_size=d,
        batch_tile=4, interpret=True, time_major=True,
    )
    np.testing.assert_array_equal(
        np.asarray(bm(x)), np.asarray(tm(jnp.swapaxes(x, 0, 1)))
    )
    with pytest.raises(ValueError):
        tm(x)  # batch-major shape rejected by the time-major contract
