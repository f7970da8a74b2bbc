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
