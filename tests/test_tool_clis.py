"""Smoke tests for the evaluation/converter/misc tool CLIs (subprocesses)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu")

CLASSES = ["background", "left", "right"]


def run_cli(rel_script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, rel_script), *args],
        capture_output=True, text=True, check=True, env=ENV, cwd=REPO,
    )


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """A checkpoint + wav + classes file shared across CLI tests."""
    from tpu_speech_commands.data.synthetic import synth_command_audio
    from tpu_speech_commands.data.wav import save_audio
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.params import pr
    from tpu_speech_commands.training import create_train_state, save_checkpoint

    tmp = tmp_path_factory.mktemp("cli")
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state("simple_cnn_lite", len(CLASSES), tx,
                                      jax.random.PRNGKey(0))
    ckpt = str(tmp / "model.npz")
    save_checkpoint(ckpt, state, {
        "model_type": "simple_cnn_lite", "num_classes": len(CLASSES),
        "classes": CLASSES, "params": pr.to_dict(),
    })
    wav = str(tmp / "clip.wav")
    save_audio(wav, synth_command_audio("left", np.random.default_rng(0)))
    classes = tmp / "classes.txt"
    classes.write_text("\n".join(CLASSES) + "\n")
    return {"ckpt": ckpt, "wav": wav, "classes": str(classes), "tmp": tmp}


def test_validate_speech_commands_cli(artifacts):
    out = run_cli(
        "tools/evaluation/validate_speech_commands.py",
        "--model_path", artifacts["ckpt"],
        "--audio_path", artifacts["wav"],
        "--classes_path", artifacts["classes"],
        "--top_k", "2", "--loop_count", "3",
        "--output_path", str(artifacts["tmp"] / "out"),
    ).stdout
    assert "Average Inference time" in out
    assert any(c in out for c in CLASSES)
    assert os.path.exists(artifacts["tmp"] / "out" / "clip.txt")


def test_model_statistics_cli(artifacts):
    out = run_cli(
        "tools/evaluation/model_statistics.py",
        "--model_type", "simple_gru", "--num_classes", "3",
    ).stdout
    assert "Total params" in out and "Total FLOPs" in out


def test_dump_inference_model_cli(artifacts):
    out_file = str(artifacts["tmp"] / "dumped.npz")
    run_cli(
        "tools/misc/dump_inference_model.py",
        "--checkpoint", artifacts["ckpt"],
        "--output_file", out_file,
    )
    from tpu_speech_commands.training.checkpoints import load_checkpoint

    _, meta = load_checkpoint(out_file)
    assert meta["model_type"] == "simple_cnn_lite"


def test_export_model_cli_native(artifacts):
    out_file = str(artifacts["tmp"] / "model.tscm")
    out = run_cli(
        "tools/model_converter/export_model.py",
        "--checkpoint", artifacts["ckpt"],
        "--format", "native", "--output_path", out_file,
    ).stdout
    assert "Exported native" in out
    from tpu_speech_commands.export.native_format import read_native_model

    tensors, meta = read_native_model(out_file)
    assert meta["model_type"] == "simple_cnn_lite"
    assert any(k.startswith("params/") for k in tensors)


def test_listen_dump_model_cli(artifacts):
    out_file = str(artifacts["tmp"] / "relisten.npz")
    run_cli(
        "listen.py",
        "--model_path", artifacts["ckpt"],
        "--classes_path", artifacts["classes"],
        "--dump_model", "--output_model_file", out_file,
    )
    assert os.path.exists(out_file)


def test_export_model_cli_onnx(artifacts):
    out_file = str(artifacts["tmp"] / "model.onnx")
    out = run_cli(
        "tools/model_converter/export_model.py",
        "--checkpoint", artifacts["ckpt"],
        "--format", "onnx", "--output_path", out_file,
    ).stdout
    assert "Exported onnx" in out
    from tpu_speech_commands.export.onnx_runtime_mini import OnnxModel

    scores = OnnxModel(out_file).run(
        {"feature_input": np.zeros((1, 30, 20, 1), np.float32)}
    )["score_predict"]
    np.testing.assert_allclose(scores.sum(), 1.0, rtol=1e-5)


def test_export_model_cli_tflite_quantized(artifacts):
    pytest.importorskip("tensorflow")
    feats = np.random.default_rng(0).standard_normal((4, 30, 20)).astype(
        np.float32
    )
    calib = str(artifacts["tmp"] / "calib.npy")
    np.save(calib, feats)
    out_file = str(artifacts["tmp"] / "model_int8.tflite")
    out = run_cli(
        "tools/model_converter/export_model.py",
        "--checkpoint", artifacts["ckpt"],
        "--format", "tflite", "--output_path", out_file,
        "--quantize", "--calibration_features", calib,
    ).stdout
    assert "Exported tflite" in out
    from tpu_speech_commands.export.inference_loader import load_inference_model

    predict, fmt = load_inference_model(out_file)
    assert fmt == "TFLITE"
    scores = predict(feats)
    np.testing.assert_allclose(scores.sum(-1), 1.0, rtol=1e-2)


def test_stream_server_demo(artifacts):
    """Multi-stream serving demo: staggered joins, slot reuse, clean exit."""
    from tpu_speech_commands.data.synthetic import synth_command_audio
    from tpu_speech_commands.data.wav import save_audio

    rng = np.random.default_rng(2)
    wavs = []
    for i, cls in enumerate(["left", "right", "left"]):
        p = str(artifacts["tmp"] / f"srv_{i}.wav")
        save_audio(p, synth_command_audio(cls, rng))
        wavs.append(p)

    out = run_cli(
        "tools/serving/stream_server.py",
        "--model_path", artifacts["ckpt"],
        "--classes_path", artifacts["classes"],
        "--wavs", *wavs, "--slots", "2", "--stagger", "2",
    ).stdout
    assert "served 3 streams" in out
    assert out.count("finished") == 3
    # the third stream must have reused a freed slot
    assert "slot 0 <- srv_2.wav" in out or "slot 1 <- srv_2.wav" in out


def test_stream_server_rejects_classes_mismatch(artifacts, tmp_path):
    """The server must refuse a classes file that mismatches the model
    head (out-of-range argmax would crash or mislabel mid-serving)."""
    bad = tmp_path / "bad_classes.txt"
    bad.write_text("background\nleft\n")
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "tools", "serving", "stream_server.py"),
         "--model_path", artifacts["ckpt"],
         "--classes_path", str(bad),
         "--wavs", artifacts["wav"]],
        capture_output=True, text=True, env=ENV, cwd=REPO,
    )
    assert out.returncode != 0
    assert "2 entries" in (out.stderr + out.stdout)


def test_bench_serving_cli(artifacts):
    """bench_serving.py measures the make_batch_scorer surface (tiny run)."""
    out = run_cli(
        "tools/evaluation/bench_serving.py",
        "--checkpoint", artifacts["ckpt"],
        "--batch_size", "8", "--k_inner", "2", "--outer", "1",
        "--no_pallas", "--compute_dtype", "float32",
    ).stdout
    line = json.loads(out.strip().splitlines()[-1])
    assert line["unit"] == "windows/s"
    assert line["value"] > 0
    assert "simple_cnn_lite" in line["metric"]


def test_bench_native_cli():
    """bench_native.py reproduces the PARITY native table (tiny run)."""
    out = run_cli(
        "tools/evaluation/bench_native.py",
        "--loop_count", "20", "--runs", "1",
    ).stdout
    line = json.loads(out.strip().splitlines()[-1])
    assert line["metric"] == "native_invoke_ms_simple_gru"
    assert line["value"] > 0
    assert {r["family"] for r in line["rows"]} == {
        "simple_cnn", "simple_cnn_lite", "simple_gru", "simple_lstm"}
    for r in line["rows"]:
        assert r["invoke_int8_ms"] > 0 and r["stream_step_us"] > 0


def test_eval_cli_with_onnx_model(artifacts):
    """eval.py accepts an .onnx model (reference 5-format eval matrix)."""
    from tpu_speech_commands.data.synthetic import make_synthetic_dataset
    from tpu_speech_commands.export.saved_model import export_onnx

    ds_root = str(artifacts["tmp"] / "eval_ds")
    if not os.path.isdir(ds_root):
        make_synthetic_dataset(ds_root, CLASSES, samples_per_class=4, seed=6)
    onnx_path = str(artifacts["tmp"] / "eval_model.onnx")
    export_onnx(artifacts["ckpt"], onnx_path)
    out = run_cli(
        "eval.py",
        "--model_path", onnx_path,
        "--dataset_path", ds_root,
        "--classes_path", artifacts["classes"],
        "--output_path", str(artifacts["tmp"] / "eval_out"),
    ).stdout
    assert "ONNX" in out
    assert "accuracy" in out
