#!/usr/bin/env python3
"""Build the shipped pretrained models under pretrained/.

The reference ships no weights, so users must train before anything works;
this repo ships small ready-made direction models (the reference's demo
task, /root/reference/README.md quick-start) so listen.py / eval.py / the
native apps run out of the box on example/*.wav.

Trains each model on the deterministic synthetic direction dataset
(tpu_speech_commands/data/synthetic.py), exports the native .npz
checkpoint plus the on-device .tscm blob, then verifies every artifact
classifies the checked-in example/*.wav clips correctly.

Run from the repo root:

    python tools/dev/make_pretrained.py

Training runs in subprocesses (TPU if present); THIS process verifies on
CPU — the TPU is single-tenant, so a parent holding the chip would make
the next training subprocess block silently (CLAUDE.md gotcha).
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

DEFAULT_MODELS = ["simple_cnn", "simple_cnn_lite", "simple_gru", "simple_lstm"]
CLASSES = ["background", "left", "right", "up", "down"]


def train_one(model_type: str, data_dir: str, out_dir: str) -> str:
    log_dir = os.path.join(out_dir, f"logs_{model_type}")
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--model_type", model_type,
        "--train_data_path", data_dir,
        "--classes_path", os.path.join(REPO, "configs/direction_classes.txt"),
        "--batch_size", "64",
        "--epochs", "40",
        "--bn_momentum", "0.9",
        "--decay_type", "cosine",
        "--log_dir", log_dir,
    ]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)
    return os.path.join(log_dir, "trained_final.npz")


def verify_on_examples(model_path: str) -> float:
    """Classify example/*.wav with the artifact; return accuracy."""
    from tpu_speech_commands.data.wav import load_wav
    from tpu_speech_commands.export.inference_loader import load_inference_model
    from tpu_speech_commands.frontend import Frontend
    from tpu_speech_commands.params import pr

    predict_fn, fmt = load_inference_model(model_path)
    frontend = Frontend(pr)
    wavs = sorted(
        f for f in os.listdir(os.path.join(REPO, "example")) if f.endswith(".wav")
    )
    feats, labels = [], []
    for name in wavs:
        audio = load_wav(os.path.join(REPO, "example", name))
        # truncate + left-zero-pad (command at the buffer tail): the
        # library's own contract helper, not a hand-rolled copy
        audio = np.asarray(frontend.pad_audio(audio))
        feats.append(np.asarray(frontend(audio)))
        labels.append(CLASSES.index(name.rsplit("_", 1)[0]))
    scores = predict_fn(np.stack(feats))
    preds = np.argmax(np.asarray(scores), axis=-1)
    acc = float(np.mean(preds == np.asarray(labels)))
    for name, p in zip(wavs, preds):
        print(f"  {name}: {CLASSES[p]}")
    print(f"{os.path.basename(model_path)} ({fmt}): example accuracy {acc:.2f}")
    return acc


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "pretrained"))
    ap.add_argument("--samples_per_class", type=int, default=80)
    ap.add_argument("--models", nargs="+", default=DEFAULT_MODELS,
                    choices=DEFAULT_MODELS)
    args = ap.parse_args()

    # single-tenant TPU: the training subprocesses own the chip; verify
    # here on CPU or the NEXT train subprocess blocks at 0% CPU forever
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpu_speech_commands.data.synthetic import make_synthetic_dataset
    from tpu_speech_commands.export.native_format import export_native

    os.makedirs(args.out, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        data_dir = os.path.join(tmp, "ds")
        make_synthetic_dataset(
            data_dir, CLASSES, samples_per_class=args.samples_per_class, seed=1
        )
        results = {}
        for model_type in args.models:
            ckpt = train_one(model_type, data_dir, tmp)
            dest = os.path.join(args.out, f"direction_{model_type}.npz")
            shutil.copy(ckpt, dest)
            tscm = os.path.join(args.out, f"direction_{model_type}.tscm")
            export_native(dest, tscm)
            acc_npz = verify_on_examples(dest)
            try:
                acc_tscm = verify_on_examples(tscm)
            except ImportError as e:  # ONLY libtsc.so-not-built is
                # skippable — a broken .tscm (RuntimeError/ValueError)
                # must fail the gate, not ship unverified
                print(f"  (tscm verify skipped: {e})")
                acc_tscm = None
            results[model_type] = {"npz": acc_npz, "tscm": acc_tscm}

    print(json.dumps(results))
    # gate EVERY shipped artifact; tscm may be None only when libtsc.so
    # is not built in this environment (verification skipped, not failed)
    bad = [m for m, r in results.items()
           if r["npz"] < 1.0 or (r["tscm"] is not None and r["tscm"] < 1.0)]
    if bad:
        raise SystemExit(f"models below 100% on example wavs: {bad}")


if __name__ == "__main__":
    main()
