"""Keras H5 weight-import parity: a tf.keras model built with the reference
architecture must produce the same scores as our flax model after weight
import — this validates both the H5 mapping and the layer-semantics parity
of models/ (BN eps/momentum, ReLU6, inline relu placement, GRU reset_after
with linear activation, LSTM unit-forget-bias)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from tpu_speech_commands.export.keras_interop import (
    build_keras_model,
    export_keras_h5,
    import_h5_checkpoint,
    load_keras_h5_weights,
)
from tpu_speech_commands.models import get_model, input_shape

NUM_CLASSES = 5


@pytest.mark.parametrize(
    "model_type",
    ["simple_cnn", "simple_cnn_lite", "simple_gru", "simple_lstm"],
)
def test_h5_import_score_parity(model_type, tmp_path):
    keras_model = build_keras_model(model_type, NUM_CLASSES)
    h5_path = str(tmp_path / "model.h5")
    keras_model.save(h5_path, save_format="h5")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4,) + input_shape(model_type)).astype(np.float32)
    keras_scores = np.asarray(keras_model(x, training=False))

    variables = load_keras_h5_weights(h5_path, model_type, NUM_CLASSES)
    model = get_model(model_type, NUM_CLASSES)
    logits = model.apply(
        {k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in variables.items()},
        jnp.asarray(x), train=False,
    )
    ours = np.asarray(jax.nn.softmax(logits, -1))
    np.testing.assert_allclose(ours, keras_scores, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_type", ["simple_cnn_lite", "simple_gru"])
def test_export_keras_h5_roundtrip(model_type, tmp_path):
    """our checkpoint -> H5 -> tf.keras scores == our scores."""
    import jax

    from tpu_speech_commands.export.inference_loader import load_native
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.training import create_train_state, save_checkpoint

    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state(model_type, NUM_CLASSES, tx,
                                      jax.random.PRNGKey(5))
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, state, {"model_type": model_type,
                                  "num_classes": NUM_CLASSES})
    h5 = str(tmp_path / "m.h5")
    export_keras_h5(ckpt, h5)

    keras_model = tf.keras.models.load_model(h5, compile=False)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3,) + input_shape(model_type)).astype(np.float32)
    keras_scores = np.asarray(keras_model(x, training=False))
    ours = load_native(ckpt)(x)
    np.testing.assert_allclose(keras_scores, ours, rtol=1e-4, atol=1e-5)


def test_import_h5_checkpoint_roundtrip(tmp_path):
    keras_model = build_keras_model("simple_cnn", NUM_CLASSES)
    h5_path = str(tmp_path / "model.h5")
    keras_model.save(h5_path, save_format="h5")
    out = str(tmp_path / "imported.npz")
    import_h5_checkpoint(h5_path, "simple_cnn", NUM_CLASSES, out,
                         classes=["background", "a", "b", "c", "d"])

    from tpu_speech_commands.export.inference_loader import load_native

    predict = load_native(out)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 30, 20, 1)).astype(np.float32)
    scores = predict(x)
    keras_scores = np.asarray(keras_model(x, training=False))
    np.testing.assert_allclose(scores, keras_scores, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("model_type", ["simple_gru", "simple_lstm"])
def test_stacked_rnn_h5_roundtrip(model_type, tmp_path):
    """2-layer RNN interop, both directions (reference rnn.py:28-35 mid
    layers return sequences): Keras H5 -> flax scores match, and our
    stacked checkpoint -> H5 -> Keras scores match."""
    # direction 1: reference-style stacked Keras model -> our import
    keras_model = build_keras_model(model_type, NUM_CLASSES, num_layers=2)
    h5_path = str(tmp_path / "stacked.h5")
    keras_model.save(h5_path, save_format="h5")

    rng = np.random.default_rng(7)
    x = rng.standard_normal((3,) + input_shape(model_type)).astype(np.float32)
    keras_scores = np.asarray(keras_model(x, training=False))

    variables = load_keras_h5_weights(h5_path, model_type, NUM_CLASSES)
    cell = "gru" if model_type == "simple_gru" else "lstm"
    assert f"{cell}_unit_1" in variables["params"]["backbone"]
    model = get_model(model_type, NUM_CLASSES, num_layers=2)
    logits = model.apply(
        {k: jax.tree_util.tree_map(jnp.asarray, v) for k, v in variables.items()},
        jnp.asarray(x), train=False,
    )
    ours = np.asarray(jax.nn.softmax(logits, -1))
    np.testing.assert_allclose(ours, keras_scores, rtol=1e-4, atol=1e-5)

    # direction 2: import -> native checkpoint -> export H5 -> Keras
    from tpu_speech_commands.export.inference_loader import load_native
    from tpu_speech_commands.export.keras_interop import import_h5_checkpoint

    ckpt = str(tmp_path / "stacked.npz")
    import_h5_checkpoint(h5_path, model_type, NUM_CLASSES, ckpt)
    np.testing.assert_allclose(load_native(ckpt)(x), keras_scores,
                               rtol=1e-4, atol=1e-5)
    h5_back = export_keras_h5(ckpt, str(tmp_path / "back.h5"))
    reloaded = tf.keras.models.load_model(h5_back, compile=False)
    np.testing.assert_allclose(np.asarray(reloaded(x, training=False)),
                               keras_scores, rtol=1e-4, atol=1e-5)
