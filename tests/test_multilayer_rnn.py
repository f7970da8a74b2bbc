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


def test_stacked_checkpoint_roundtrip_through_loader(tmp_path):
    """--num_layers checkpoints are self-describing: meta carries
    num_layers and load_inference_model rebuilds the stacked module."""
    import jax
    import numpy as np

    from tpu_speech_commands.export.inference_loader import load_inference_model
    from tpu_speech_commands.models import init_model, score_fn
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.params import pr
    from tpu_speech_commands.training import save_checkpoint
    from tpu_speech_commands.training.trainer import TrainState

    model, variables = init_model("simple_gru", 4, jax.random.PRNGKey(1),
                                  num_layers=2)
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=None)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, state, {
        "model_type": "simple_gru", "num_classes": 4,
        "classes": ["background", "a", "b", "c"], "params": pr.to_dict(),
        "num_layers": 2,
    })
    predict, fmt = load_inference_model(ckpt)
    assert fmt == "NATIVE"
    feats = np.random.default_rng(0).standard_normal((3, 30, 20)).astype(
        np.float32)
    want = np.asarray(score_fn(model.apply(variables, feats, train=False)))
    np.testing.assert_allclose(predict(feats), want, rtol=1e-5, atol=1e-6)


def test_factory_rejects_num_layers_for_cnn():
    import pytest as _pytest

    from tpu_speech_commands.models import get_model

    with _pytest.raises(ValueError, match="num_layers"):
        get_model("simple_cnn", 4, num_layers=2)


def test_stacked_rnn_onnx_export_parity(tmp_path):
    """The direct ONNX emitter unrolls every stacked layer (mid layers feed
    sequences forward); executed by the built-in numpy runtime."""
    import jax
    import numpy as np

    from tpu_speech_commands.export.inference_loader import load_inference_model
    from tpu_speech_commands.export.onnx_runtime_mini import OnnxModel
    from tpu_speech_commands.export.saved_model import export_onnx
    from tpu_speech_commands.models import init_model, score_fn
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.params import pr
    from tpu_speech_commands.training import save_checkpoint
    from tpu_speech_commands.training.trainer import TrainState

    model, variables = init_model("simple_lstm", 4, jax.random.PRNGKey(2),
                                  num_layers=2)
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx,
                              batch_stats=None)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, state, {
        "model_type": "simple_lstm", "num_classes": 4,
        "classes": ["background", "a", "b", "c"], "params": pr.to_dict(),
        "num_layers": 2,
    })
    onnx_path = export_onnx(ckpt, str(tmp_path / "m.onnx"))
    feats = np.random.default_rng(4).standard_normal((3, 30, 20)).astype(
        np.float32)
    want = np.asarray(score_fn(model.apply(variables, feats, train=False)))
    got = OnnxModel(onnx_path).run({"feature_input": feats})["score_predict"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
