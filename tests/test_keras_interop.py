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
    import_h5_checkpoint,
    load_keras_h5_weights,
)
from tpu_speech_commands.models import get_model, input_shape

NUM_CLASSES = 5


def build_keras_cnn(lite: bool):
    """Reference-architecture CNN via the public Keras API
    (classifier/models/cnn.py topology)."""
    from tensorflow.keras import layers

    Conv = layers.SeparableConv2D if lite else layers.Conv2D
    bias = lite
    inp = layers.Input(shape=(30, 20, 1), name="feature_input")
    x = inp
    specs = [
        (16, 1, None, True),
        (32, 1, None, True),
        (64, 2, "relu" if lite else None, False),
        (128, 1, "relu", True),
    ]
    for filters, strides, act, pool in specs:
        x = Conv(filters, 3, strides=strides, padding="same", use_bias=bias,
                 activation=act)(x)
        x = layers.BatchNormalization()(x)
        x = layers.ReLU(6.0)(x)
        if pool:
            x = layers.MaxPooling2D()(x)
    x = layers.Flatten()(x)
    x = layers.Dropout(0.5)(x)
    x = layers.Dense(128)(x)
    x = layers.ReLU(6.0)(x)
    out = layers.Dense(NUM_CLASSES, activation="softmax", name="score_predict")(x)
    return tf.keras.Model(inp, out)


def build_keras_rnn(lstm: bool):
    from tensorflow.keras import layers

    inp = layers.Input(shape=(30, 20), name="feature_input")
    if lstm:
        x = layers.LSTM(48, activation="tanh", dropout=0.2,
                        name="lstm_unit_0")(inp)
    else:
        x = layers.GRU(48, activation="linear", dropout=0.2,
                       name="gru_unit_0")(inp)
    out = layers.Dense(NUM_CLASSES, activation="softmax", name="score_predict")(x)
    return tf.keras.Model(inp, out)


@pytest.mark.parametrize(
    "model_type,builder",
    [
        ("simple_cnn", lambda: build_keras_cnn(False)),
        ("simple_cnn_lite", lambda: build_keras_cnn(True)),
        ("simple_gru", lambda: build_keras_rnn(False)),
        ("simple_lstm", lambda: build_keras_rnn(True)),
    ],
)
def test_h5_import_score_parity(model_type, builder, tmp_path):
    keras_model = builder()
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


def test_import_h5_checkpoint_roundtrip(tmp_path):
    keras_model = build_keras_cnn(False)
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
