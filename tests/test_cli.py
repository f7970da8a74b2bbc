"""CLI-level tests (main() invoked in-process on the forced-CPU backend)."""
import os

import numpy as np

from tpu_speech_commands.data.synthetic import make_synthetic_dataset

CLASSES = ["background", "left", "right"]


def _write_classes(tmp_path):
    p = tmp_path / "classes.txt"
    p.write_text("\n".join(CLASSES) + "\n")
    return str(p)


def _train_args(tmp_path, data_root, **over):
    import train as train_cli

    argv = {
        "--model_type": "simple_cnn_lite",
        "--train_data_path": data_root,
        "--classes_path": _write_classes(tmp_path),
        "--batch_size": "16",
        "--epochs": "2",
        "--log_dir": str(tmp_path / "logs"),
    }
    argv.update(over)
    flat = []
    for k, v in argv.items():
        flat += [k, v] if v is not None else [k]
    return train_cli.build_parser().parse_args(flat)


def test_train_eval_cli_roundtrip(tmp_path, capsys):
    import eval as eval_cli
    import train as train_cli

    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES,
                                  samples_per_class=8)
    train_cli.main(_train_args(tmp_path, root))
    out = capsys.readouterr().out
    assert "Epoch 2/2" in out
    final = tmp_path / "logs" / "trained_final.npz"
    assert final.exists()

    acc = eval_cli.main(eval_cli.build_parser().parse_args([
        "--model_path", str(final),
        "--dataset_path", root,
        "--classes_path", _write_classes(tmp_path),
        "--output_path", str(tmp_path / "result"),
        "--batch_size", "16",
    ]))
    assert 0.0 <= acc <= 1.0
    assert (tmp_path / "result" / "confusion_matrix.png").exists()


def test_eval_autoselects_bark_frontend_and_checks_classes(tmp_path, capsys):
    """eval.py must take feature_type from the checkpoint meta (bark and
    mfcc features have identical shapes — a silent mismatch scores
    garbage) and reject a classes file that mismatches the model head."""
    import pytest

    import eval as eval_cli
    import train as train_cli

    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES,
                                  samples_per_class=6)
    train_cli.main(_train_args(tmp_path, root,
                               **{"--feature_type": "bark", "--epochs": "1"}))
    capsys.readouterr()
    final = str(tmp_path / "logs" / "trained_final.npz")

    # no --feature_type: picks bark from the checkpoint meta and runs
    acc = eval_cli.main(eval_cli.build_parser().parse_args([
        "--model_path", final,
        "--dataset_path", root,
        "--classes_path", _write_classes(tmp_path),
        "--output_path", str(tmp_path / "result_bark"),
        "--batch_size", "16",
    ]))
    assert 0.0 <= acc <= 1.0

    # explicit wrong flag: warned, not silent
    eval_cli.main(eval_cli.build_parser().parse_args([
        "--model_path", final,
        "--dataset_path", root,
        "--classes_path", _write_classes(tmp_path),
        "--output_path", str(tmp_path / "result_warn"),
        "--batch_size", "16",
        "--feature_type", "mfcc",
    ]))
    assert "overrides the checkpoint's stored feature_type" in \
        capsys.readouterr().out

    # classes/head mismatch: clean rejection
    bad = tmp_path / "bad_classes.txt"
    bad.write_text("background\nleft\n")
    with pytest.raises(ValueError, match="2 entries"):
        eval_cli.main(eval_cli.build_parser().parse_args([
            "--model_path", final,
            "--dataset_path", root,
            "--classes_path", str(bad),
            "--batch_size", "16",
        ]))


def test_listener_autoselects_bark_frontend(tmp_path, capsys):
    """Listener must build the bark frontend for a bark-trained checkpoint
    without any flag (identical feature shapes make a mismatch silent)."""
    import train as train_cli
    from tpu_speech_commands.streaming import Listener

    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES,
                                  samples_per_class=6)
    train_cli.main(_train_args(tmp_path, root,
                               **{"--feature_type": "bark", "--epochs": "1"}))
    capsys.readouterr()
    listener = Listener(model_path=str(tmp_path / "logs" / "trained_final.npz"),
                        classes_path=_write_classes(tmp_path))
    assert listener.feature_type == "bark"
    assert listener.frontend.feature_type == "bark"


def test_listener_params_path_wins_over_checkpoint_meta(tmp_path, capsys):
    """--params_path decoder recalibration must survive loading a native
    checkpoint (the loader restores train-time params; the user's file
    is injected on top, not clobbered)."""
    import json

    import train as train_cli
    from tpu_speech_commands.streaming import Listener

    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES,
                                  samples_per_class=6)
    train_cli.main(_train_args(tmp_path, root, **{"--epochs": "1"}))
    capsys.readouterr()
    final = str(tmp_path / "logs" / "trained_final.npz")

    tuned = tmp_path / "tuned.json"
    tuned.write_text(json.dumps({"threshold_center": 0.37}))
    listener = Listener(model_path=final,
                        classes_path=_write_classes(tmp_path),
                        params_path=str(tuned))
    assert listener.pr.threshold_center == 0.37
    assert listener.threshold_decoder.center == 0.37


def test_train_resume_flag(tmp_path, capsys):
    import train as train_cli

    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES,
                                  samples_per_class=6)
    train_cli.main(_train_args(tmp_path, root, **{"--epochs": "1"}))
    capsys.readouterr()
    args = _train_args(tmp_path, root, **{"--epochs": "1"})
    args.resume = True
    train_cli.main(args)
    out = capsys.readouterr().out
    assert "Resumed from" in out


def test_bark_lstm_full_path(tmp_path, capsys, native_lib):
    """BASELINE config 4 (simple_lstm + bark frontend) trained END TO END:
    train -> eval -> listen replay -> ONNX + native export with score
    parity across formats on the bark features (round-2 verdict #5 — bark
    was parity-tested per layer but never driven through a full training
    run)."""
    import eval as eval_cli
    import train as train_cli

    # native_lib fixture: the export-parity tail loads the .tscm via ctypes
    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES,
                                  samples_per_class=8)
    train_cli.main(_train_args(tmp_path, root, **{
        "--model_type": "simple_lstm", "--feature_type": "bark",
    }))
    out = capsys.readouterr().out
    assert "Epoch 2/2" in out
    final = str(tmp_path / "logs" / "trained_final.npz")

    # the checkpoint is self-describing: downstream loaders (native
    # runtime, exporters) read the bark frontend from the meta
    from tpu_speech_commands.training.checkpoints import load_checkpoint

    _, meta = load_checkpoint(final)
    assert meta["feature_type"] == "bark"

    acc = eval_cli.main(eval_cli.build_parser().parse_args([
        "--model_path", final, "--dataset_path", root,
        "--classes_path", _write_classes(tmp_path),
        "--output_path", str(tmp_path / "result"),
        "--batch_size", "16", "--feature_type", "bark",
    ]))
    assert 0.0 <= acc <= 1.0
    capsys.readouterr()

    # streaming replay with the bark frontend
    from tpu_speech_commands.data.synthetic import synth_command_audio
    from tpu_speech_commands.data.wav import save_audio
    from tpu_speech_commands.streaming import Listener

    rng = np.random.default_rng(7)
    audio = synth_command_audio("left", rng)
    wav_path = str(tmp_path / "left.wav")
    save_audio(wav_path, audio)
    listener = Listener(
        model_path=final, classes_path=_write_classes(tmp_path),
        input_wav=wav_path, feature_type="bark",
    )
    listener.run_wav()
    bars = capsys.readouterr().out
    assert bars.count("\n") == -(-len(audio) // 1024)

    # export parity: JAX checkpoint vs ONNX (mini runtime) vs native .tscm
    # on identical bark features
    import jax.numpy as jnp

    from tpu_speech_commands.export.inference_loader import load_inference_model
    from tpu_speech_commands.export.native_format import export_native
    from tpu_speech_commands.export.saved_model import export_onnx
    from tpu_speech_commands.frontend import Frontend
    from tpu_speech_commands.params import pr

    onnx_path = str(tmp_path / "m.onnx")
    export_onnx(final, onnx_path)
    tscm_path = str(tmp_path / "m.tscm")
    export_native(final, tscm_path)

    feats = np.asarray(
        Frontend(pr, feature_type="bark")(jnp.asarray(audio[None]))
    ).astype(np.float32)
    scores = {}
    for name, path in (("jax", final), ("onnx", onnx_path),
                       ("native", tscm_path)):
        predict_fn, _ = load_inference_model(path)
        scores[name] = np.asarray(predict_fn(feats))
    np.testing.assert_allclose(scores["onnx"], scores["jax"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(scores["native"], scores["jax"],
                               rtol=1e-3, atol=1e-4)
