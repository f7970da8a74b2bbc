"""Export parity tests: native vs SavedModel vs TFLite scores.

Mirrors the reference's conversion-parity practice (same features through
every exported format must give the same class scores — eval.py across
formats, SURVEY.md §4)."""
import os

import numpy as np
import pytest

import jax

tf = pytest.importorskip("tensorflow")

from tpu_speech_commands.export.inference_loader import load_inference_model
from tpu_speech_commands.export.saved_model import export_saved_model, export_tflite
from tpu_speech_commands.optim import get_optimizer
from tpu_speech_commands.training import create_train_state, save_checkpoint

CLASSES = ["background", "left", "right"]


def _make_checkpoint(tmp_path, model_type):
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state(model_type, len(CLASSES), tx,
                                      jax.random.PRNGKey(0))
    path = str(tmp_path / f"{model_type}.npz")
    save_checkpoint(path, state, {
        "model_type": model_type, "num_classes": len(CLASSES),
        "classes": CLASSES,
    })
    return path


@pytest.mark.parametrize("model_type", ["simple_cnn_lite", "simple_gru"])
def test_export_parity(model_type, tmp_path):
    ckpt = _make_checkpoint(tmp_path, model_type)
    native, fmt = load_inference_model(ckpt)
    assert fmt == "NATIVE"

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((4, 30, 20)).astype(np.float32)
    ref_scores = native(feats)
    np.testing.assert_allclose(ref_scores.sum(-1), 1.0, rtol=1e-5)

    # SavedModel
    sm_dir = str(tmp_path / "saved_model")
    export_saved_model(ckpt, sm_dir)
    sm_predict, sm_fmt = load_inference_model(sm_dir)
    assert sm_fmt == "SAVED_MODEL"
    np.testing.assert_allclose(sm_predict(feats), ref_scores, rtol=1e-4, atol=1e-5)
    # sidecars for the on-device apps
    assert os.path.exists(os.path.join(sm_dir, "params.json"))
    assert os.path.exists(os.path.join(sm_dir, "classes.txt"))

    # TFLite
    tfl_path = str(tmp_path / "model.tflite")
    export_tflite(ckpt, tfl_path)
    tfl_predict, tfl_fmt = load_inference_model(tfl_path)
    assert tfl_fmt == "TFLITE"
    np.testing.assert_allclose(tfl_predict(feats), ref_scores, rtol=1e-3, atol=1e-4)


def test_frozen_pb_parity(tmp_path):
    from tpu_speech_commands.export.saved_model import export_frozen_pb

    ckpt = _make_checkpoint(tmp_path, "simple_cnn_lite")
    native, _ = load_inference_model(ckpt)
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((3, 30, 20)).astype(np.float32)
    ref_scores = native(feats)

    pb_path = str(tmp_path / "model.pb")
    export_frozen_pb(ckpt, pb_path)
    pb_predict, pb_fmt = load_inference_model(pb_path)
    assert pb_fmt == "PB"
    np.testing.assert_allclose(pb_predict(feats), ref_scores, rtol=1e-4, atol=1e-5)


def test_frozen_pb_output_prefix_and_pbtxt(tmp_path):
    """keras_to_tensorflow.py side options: --output_nodes_prefix aliases
    the outputs via Identity nodes (originals kept) and --save_graph_def
    dumps an ascii pbtxt."""
    import tensorflow as tf

    from tpu_speech_commands.export.saved_model import export_frozen_pb

    ckpt = _make_checkpoint(tmp_path, "simple_cnn_lite")
    native, _ = load_inference_model(ckpt)
    rng = np.random.default_rng(4)
    feats = rng.standard_normal((1, 30, 20)).astype(np.float32)
    ref_scores = native(feats)

    pb_path = str(tmp_path / "renamed.pb")
    export_frozen_pb(ckpt, pb_path, output_nodes_prefix="output_",
                     save_graph_def=True)
    assert os.path.exists(str(tmp_path / "renamed.pbtxt"))

    graph_def = tf.compat.v1.GraphDef()
    with open(pb_path, "rb") as f:
        graph_def.ParseFromString(f.read())
    names = {n.name for n in graph_def.node}
    assert "output_0" in names

    with tf.Graph().as_default() as graph:
        tf.graph_util.import_graph_def(graph_def, name="")
        input_name = next(
            n.name for n in graph_def.node if n.op == "Placeholder")
        with tf.compat.v1.Session(graph=graph) as sess:
            out = sess.run("output_0:0",
                           {input_name + ":0": feats[..., None]})
    np.testing.assert_allclose(out, ref_scores, rtol=1e-4, atol=1e-5)

    # existing loader still resolves the original output nodes
    pb_predict, _ = load_inference_model(pb_path)
    np.testing.assert_allclose(pb_predict(feats), ref_scores,
                               rtol=1e-4, atol=1e-5)


# -- ONNX (direct emitter + mini runtime; no tf2onnx/onnxruntime needed) ------

@pytest.mark.parametrize(
    "model_type", ["simple_cnn", "simple_cnn_lite", "simple_gru", "simple_lstm"]
)
def test_onnx_export_parity(model_type, tmp_path):
    from tpu_speech_commands.export.saved_model import export_onnx

    ckpt = _make_checkpoint(tmp_path, model_type)
    native, _ = load_inference_model(ckpt)
    onnx_path = str(tmp_path / "model.onnx")
    export_onnx(ckpt, onnx_path)

    onnx_predict, fmt = load_inference_model(onnx_path)
    assert fmt == "ONNX"
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((4, 30, 20)).astype(np.float32)
    scores = onnx_predict(feats)
    np.testing.assert_allclose(scores.sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(scores, native(feats), rtol=1e-4, atol=1e-5)


def test_onnx_wire_format_reparses(tmp_path):
    """The emitted file must round-trip through the strict parser with the
    expected graph inventory (guards the hand-rolled protobuf encoding)."""
    from tpu_speech_commands.export.onnx_runtime_mini import OnnxModel
    from tpu_speech_commands.export.saved_model import export_onnx

    ckpt = _make_checkpoint(tmp_path, "simple_cnn")
    onnx_path = str(tmp_path / "model.onnx")
    export_onnx(ckpt, onnx_path)
    m = OnnxModel(onnx_path)
    assert m.inputs == ["feature_input"]
    assert m.outputs == ["score_predict"]
    ops = [n[0] for n in m.nodes]
    assert ops.count("Conv") == 4
    assert ops.count("BatchNormalization") == 4
    assert ops.count("MaxPool") == 3
    assert ops.count("Gemm") == 2
    assert ops[-1] == "Softmax"
    # initializer tensors carry real data
    w = m.initializers["block1_w"]
    assert w.shape == (16, 1, 3, 3) and w.dtype == np.float32


# -- quantization parity (reference TOCO --quantize / MNN PTQ analogues) ------

def _train_small(tmp_path, model_type="simple_cnn_lite", epochs=10):
    """Short real training run so quantization acts on meaningful weights."""
    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.training import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    n_per, n_cls = 40, len(CLASSES)
    centers = rng.standard_normal((n_cls, 30, 20)) * 2.0
    x = np.concatenate([
        centers[c] + 0.3 * rng.standard_normal((n_per, 30, 20))
        for c in range(n_cls)
    ]).astype(np.float32)
    y = np.repeat(np.arange(n_cls), n_per).astype(np.int32)
    ds = Dataset(x, y)

    tx = get_optimizer("adam", 3e-3, decay_type=None)
    model, state = create_train_state(model_type, n_cls, tx,
                                      jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=32, epochs=epochs,
                        log_dir=str(tmp_path / "qlogs"),
                        log_tensorboard=False)
    trainer = Trainer(model, state, model_type, n_cls, cfg)
    trainer.fit(ds, ds, verbose=False)
    ckpt = str(tmp_path / "qlogs" / "trained_final.npz")
    assert os.path.exists(ckpt)
    holdout = (centers[:, None] + 0.3 * rng.standard_normal(
        (n_cls, 16, 30, 20))).reshape(-1, 30, 20).astype(np.float32)
    holdout_y = np.repeat(np.arange(n_cls), 16)
    return ckpt, x, holdout, holdout_y


def test_tflite_dynamic_quantize_top1_agreement(tmp_path):
    ckpt, _, holdout, holdout_y = _train_small(tmp_path)
    float_path = str(tmp_path / "float.tflite")
    quant_path = str(tmp_path / "quant.tflite")
    export_tflite(ckpt, float_path)
    export_tflite(ckpt, quant_path, quantize=True)
    assert os.path.getsize(quant_path) < 0.6 * os.path.getsize(float_path)

    fp, _ = load_inference_model(float_path)
    qp, _ = load_inference_model(quant_path)
    fs, qs = fp(holdout), qp(holdout)
    # top-1 agreement on the held-out set and bounded score drift
    agree = (fs.argmax(-1) == qs.argmax(-1)).mean()
    assert agree >= 0.98, agree
    assert np.abs(fs - qs).max() < 0.05
    # accuracy within 2 points of float
    facc = (fs.argmax(-1) == holdout_y).mean()
    qacc = (qs.argmax(-1) == holdout_y).mean()
    assert qacc >= facc - 0.02, (facc, qacc)


def test_tflite_full_int8_quantize_with_representative_data(tmp_path):
    ckpt, train_x, holdout, holdout_y = _train_small(tmp_path)
    float_path = str(tmp_path / "float.tflite")
    int8_path = str(tmp_path / "int8.tflite")
    export_tflite(ckpt, float_path)
    export_tflite(ckpt, int8_path, representative_data=train_x[:32])

    fp, _ = load_inference_model(float_path)
    qp, _ = load_inference_model(int8_path)
    fs, qs = fp(holdout), qp(holdout)
    agree = (fs.argmax(-1) == qs.argmax(-1)).mean()
    assert agree >= 0.95, agree
    facc = (fs.argmax(-1) == holdout_y).mean()
    qacc = (qs.argmax(-1) == holdout_y).mean()
    assert qacc >= facc - 0.05, (facc, qacc)


def test_onnx_mini_runtime_rejects_garbage(tmp_path):
    from tpu_speech_commands.export.onnx_runtime_mini import OnnxModel

    bad = tmp_path / "bad.onnx"
    bad.write_bytes(b"not a protobuf at all \x00\x01\x02")
    with pytest.raises((ValueError, IndexError)):
        OnnxModel(str(bad))


def test_onnx_mini_runtime_rejects_unknown_op(tmp_path):
    """The executor is a strict verification oracle: an op it does not
    implement must raise, never silently skip."""
    from tpu_speech_commands.export import onnx_writer as w
    from tpu_speech_commands.export.onnx_runtime_mini import OnnxModel

    node = w.node_proto("TotallyMadeUpOp", ["feature_input"], ["out"])
    graph = w.graph_proto(
        [node], "g", [],
        [w.value_info("feature_input", (None, 4))],
        [w.value_info("out", (None, 4))],
    )
    path = tmp_path / "weird.onnx"
    path.write_bytes(w.model_proto(graph))
    m = OnnxModel(str(path))
    with pytest.raises(NotImplementedError):
        m.run({"feature_input": np.zeros((1, 4), np.float32)})


def test_onnx_export_with_deltas_and_alt_params(tmp_path):
    """ONNX export/execute parity when use_delta doubles the feature width
    (the emitter must derive every shape from the weights + meta)."""
    from tpu_speech_commands.models import features_to_input, score_fn
    from tpu_speech_commands.export.onnx_runtime_mini import OnnxModel
    from tpu_speech_commands.export.saved_model import export_onnx
    from tpu_speech_commands.params import ListenerParams

    p = ListenerParams(use_delta=True)  # feature_size 40
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    from tpu_speech_commands.models import init_model

    model, variables = init_model("simple_cnn", len(CLASSES),
                                  jax.random.PRNGKey(5), params=p)
    from tpu_speech_commands.training import TrainState

    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"),
    )
    ckpt = str(tmp_path / "d.npz")
    from tpu_speech_commands.training import save_checkpoint

    save_checkpoint(ckpt, state, {
        "model_type": "simple_cnn", "num_classes": len(CLASSES),
        "classes": CLASSES, "n_features": p.n_features,
        "feature_size": p.feature_size,
    })
    onnx_path = str(tmp_path / "d.onnx")
    export_onnx(ckpt, onnx_path)

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((2, p.n_features, p.feature_size)).astype(
        np.float32
    )
    want = np.asarray(score_fn(model.apply(
        variables, features_to_input(jax.numpy.asarray(feats), "simple_cnn"),
        train=False,
    )))
    got = OnnxModel(onnx_path).run(
        {"feature_input": feats[..., None]}
    )["score_predict"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_onnx_export_adopts_checkpoint_params(tmp_path):
    """A checkpoint whose meta carries only 'params' (what train.py saves —
    no explicit n_features/feature_size) must export an ONNX graph shaped
    by THOSE params, not this process's pr defaults."""
    from tpu_speech_commands.export.onnx_runtime_mini import OnnxModel
    from tpu_speech_commands.export.onnx_writer import export_onnx_model
    from tpu_speech_commands.models import init_model
    from tpu_speech_commands.params import ListenerParams, pr
    from tpu_speech_commands.training import TrainState

    p = ListenerParams(buffer_t=2.0)  # n_features 61, not the default 30
    assert p.n_features != pr.n_features
    model, variables = init_model("simple_gru", len(CLASSES),
                                  jax.random.PRNGKey(7), params=p)
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"),
    )
    ckpt = str(tmp_path / "alt.npz")
    save_checkpoint(ckpt, state, {
        "model_type": "simple_gru", "num_classes": len(CLASSES),
        "classes": CLASSES, "params": p.to_dict(),
    })
    onnx_path = str(tmp_path / "alt.onnx")
    export_onnx_model(ckpt, onnx_path)

    rng = np.random.default_rng(6)
    feats = rng.standard_normal((2, p.n_features, p.feature_size)).astype(
        np.float32
    )
    got = OnnxModel(onnx_path).run({"feature_input": feats})["score_predict"]
    from tpu_speech_commands.models import features_to_input, score_fn

    want = np.asarray(score_fn(model.apply(
        variables, features_to_input(jax.numpy.asarray(feats), "simple_gru"),
        train=False,
    )))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_keras_h5_export_adopts_checkpoint_params(tmp_path):
    """export_keras_h5 must shape the H5 input from the checkpoint's
    params, not the process defaults."""
    from tpu_speech_commands.export.keras_interop import export_keras_h5
    from tpu_speech_commands.models import init_model
    from tpu_speech_commands.params import ListenerParams, pr
    from tpu_speech_commands.training import TrainState

    p = ListenerParams(buffer_t=2.0)  # n_features 61
    assert p.n_features != pr.n_features
    model, variables = init_model("simple_gru", len(CLASSES),
                                  jax.random.PRNGKey(8), params=p)
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"),
    )
    ckpt = str(tmp_path / "alt.npz")
    save_checkpoint(ckpt, state, {
        "model_type": "simple_gru", "num_classes": len(CLASSES),
        "classes": CLASSES, "params": p.to_dict(),
    })
    h5 = str(tmp_path / "alt.h5")
    export_keras_h5(ckpt, h5)
    keras_model = tf.keras.models.load_model(h5, compile=False)
    assert keras_model.input_shape[1] == p.n_features


def test_tscm_blob_loads_in_python(tmp_path):
    """eval.py/listen.py can run the exact .tscm artifact that ships to
    devices (C++ runtime via ctypes) — scores match the JAX forward."""
    from tpu_speech_commands.export.native_format import export_native

    ckpt = _make_checkpoint(tmp_path, "simple_cnn_lite")
    native_jax, _ = load_inference_model(ckpt)
    blob = str(tmp_path / "m.tscm")
    export_native(ckpt, blob)
    predict, fmt = load_inference_model(blob)
    assert fmt == "TSCM"
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((3, 30, 20)).astype(np.float32)
    scores = predict(feats)
    np.testing.assert_allclose(scores.sum(-1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(scores, native_jax(feats), rtol=1e-3, atol=1e-4)
