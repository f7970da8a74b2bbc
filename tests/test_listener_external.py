"""Listener with an external-format (TFLite) model — exercises the
non-fused streaming path (feature streamer on device, model in the
external runtime), mirroring the reference's multi-format listen loop."""
import numpy as np
import pytest

import jax

tf = pytest.importorskip("tensorflow")

from tpu_speech_commands.data.synthetic import synth_command_audio
from tpu_speech_commands.data.wav import save_audio
from tpu_speech_commands.export.saved_model import export_tflite
from tpu_speech_commands.optim import get_optimizer
from tpu_speech_commands.streaming import Listener
from tpu_speech_commands.training import create_train_state, save_checkpoint

CLASSES = ["background", "left", "right"]


def test_listener_with_tflite_model(tmp_path, capsys):
    classes_path = tmp_path / "classes.txt"
    classes_path.write_text("\n".join(CLASSES) + "\n")

    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state("simple_cnn_lite", len(CLASSES), tx,
                                      jax.random.PRNGKey(0))
    ckpt = tmp_path / "model.npz"
    save_checkpoint(str(ckpt), state, {
        "model_type": "simple_cnn_lite", "num_classes": len(CLASSES),
        "classes": CLASSES,
    })
    tfl = tmp_path / "model.tflite"
    export_tflite(str(ckpt), str(tfl))

    rng = np.random.default_rng(1)
    audio = synth_command_audio("left", rng)
    wav_path = tmp_path / "in.wav"
    save_audio(str(wav_path), audio)

    listener = Listener(
        model_path=str(tfl),
        classes_path=str(classes_path),
        input_wav=str(wav_path),
    )
    assert listener.model_format == "TFLITE"
    listener.run_wav()
    out = capsys.readouterr().out
    assert out.count("\n") == -(-len(audio) // 1024)

    # external path must agree with the native path on the same wav
    # (fresh instances: run_wav above already advanced `listener`'s state)
    external = Listener(
        model_path=str(tfl),
        classes_path=str(classes_path),
    )
    native = Listener(
        model_path=str(ckpt),
        classes_path=str(classes_path),
    )
    ext_scores = []
    nat_scores = []
    for c in range(len(audio) // 1024):
        chunk = audio[c * 1024 : (c + 1) * 1024]
        ext_scores.append(external.process_chunk(chunk.copy()))
        nat_scores.append(native.process_chunk(chunk.copy()))
    np.testing.assert_allclose(
        np.stack(ext_scores), np.stack(nat_scores), rtol=1e-3, atol=1e-3
    )


def test_listener_with_onnx_model(tmp_path, capsys):
    """Streaming listen with an exported .onnx model (built-in executor) —
    the reference's ONNX listen path (listen.py:192-209)."""
    from tpu_speech_commands.export.saved_model import export_onnx

    classes_path = tmp_path / "classes.txt"
    classes_path.write_text("\n".join(CLASSES) + "\n")

    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state("simple_gru", len(CLASSES), tx,
                                      jax.random.PRNGKey(2))
    ckpt = tmp_path / "model.npz"
    save_checkpoint(str(ckpt), state, {
        "model_type": "simple_gru", "num_classes": len(CLASSES),
        "classes": CLASSES,
    })
    onnx_path = tmp_path / "model.onnx"
    export_onnx(str(ckpt), str(onnx_path))

    rng = np.random.default_rng(3)
    audio = synth_command_audio("right", rng)
    wav_path = tmp_path / "in.wav"
    save_audio(str(wav_path), audio)

    listener = Listener(
        model_path=str(onnx_path),
        classes_path=str(classes_path),
        input_wav=str(wav_path),
    )
    assert listener.model_format == "ONNX"
    listener.run_wav()
    out = capsys.readouterr().out
    assert out.count("\n") == -(-len(audio) // 1024)


def _ckpt_and_wav(tmp_path, model_type, command):
    classes_path = tmp_path / "classes.txt"
    classes_path.write_text("\n".join(CLASSES) + "\n")
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state(model_type, len(CLASSES), tx,
                                      jax.random.PRNGKey(4))
    ckpt = tmp_path / "model.npz"
    save_checkpoint(str(ckpt), state, {
        "model_type": model_type, "num_classes": len(CLASSES),
        "classes": CLASSES,
    })
    rng = np.random.default_rng(5)
    wav_path = tmp_path / "in.wav"
    save_audio(str(wav_path), synth_command_audio(command, rng))
    return ckpt, classes_path, wav_path


def test_listener_with_frozen_pb_model(tmp_path, capsys):
    """Streaming listen with a frozen-graph .pb model — the reference's PB
    listen path (listen.py:143-170)."""
    from tpu_speech_commands.export.saved_model import export_frozen_pb

    ckpt, classes_path, wav_path = _ckpt_and_wav(tmp_path, "simple_cnn_lite",
                                                 "left")
    pb_path = tmp_path / "model.pb"
    export_frozen_pb(str(ckpt), str(pb_path))
    listener = Listener(model_path=str(pb_path),
                        classes_path=str(classes_path),
                        input_wav=str(wav_path))
    assert listener.model_format == "PB"
    listener.run_wav()
    assert capsys.readouterr().out.count("\n") > 0


def test_listener_with_keras_h5_model(tmp_path, capsys):
    """Streaming listen with a Keras .h5 model — the reference's primary
    listen path (listen.py:138-140)."""
    from tpu_speech_commands.export.keras_interop import export_keras_h5

    ckpt, classes_path, wav_path = _ckpt_and_wav(tmp_path, "simple_cnn_lite",
                                                 "right")
    h5_path = tmp_path / "model.h5"
    export_keras_h5(str(ckpt), str(h5_path))
    listener = Listener(model_path=str(h5_path),
                        classes_path=str(classes_path),
                        input_wav=str(wav_path))
    assert listener.model_format == "H5"
    listener.run_wav()
    assert capsys.readouterr().out.count("\n") > 0
