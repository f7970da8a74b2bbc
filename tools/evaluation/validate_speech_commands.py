#!/usr/bin/env python3
"""Single-file / directory prediction with top-k scores and latency timing.

Re-implementation of the reference validator
(tools/evaluation/validate_speech_commands.py:322-381): loads any supported
model format, extracts features from wav input(s), prints top-k class
scores, and reports average inference latency over --loop_count runs.
"""
import argparse
import os
import sys
import time
from glob import glob

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from tpu_speech_commands.data.wav import load_wav
from tpu_speech_commands.export.inference_loader import load_inference_model
from tpu_speech_commands.frontend import Frontend, numpy_ref
from tpu_speech_commands.params import inject_params, pr
from tpu_speech_commands.utils import get_classes


def handle_prediction(scores, class_names, top_k, wav_path, output_path=None):
    """Top-k print (+ optional txt dump), like handle_prediction (:294-318)."""
    order = np.argsort(scores)[::-1][:top_k]
    lines = [f"{wav_path}:"]
    for idx in order:
        lines.append(f"  {class_names[idx]}: {scores[idx]:.6f}")
    text = "\n".join(lines)
    print(text)
    if output_path:
        os.makedirs(output_path, exist_ok=True)
        out_file = os.path.join(
            output_path, os.path.splitext(os.path.basename(wav_path))[0] + ".txt"
        )
        with open(out_file, "w") as f:
            f.write(text + "\n")
    return [(class_names[i], float(scores[i])) for i in order]


def validate(model_path, wav_paths, class_names, top_k=1, loop_count=1,
             feature_type=None, output_path=None):
    predict_fn, model_format = load_inference_model(model_path)
    print(f"Loaded {model_format} model")

    # shared entry-point contract: feature_type from checkpoint metadata,
    # classes file cross-checked against the model head
    from tpu_speech_commands.export.inference_loader import (
        resolve_checkpoint_contract,
    )

    feature_type = resolve_checkpoint_contract(
        predict_fn, model_format, class_names=class_names,
        feature_type=feature_type,
    )

    frontend = Frontend(pr, feature_type=feature_type)
    import jax
    import jax.numpy as jnp

    featurize = jax.jit(lambda a: frontend(a))

    results = []
    for wav_path in wav_paths:
        audio = load_wav(wav_path, pr.sample_rate)
        audio = np.asarray(frontend.pad_audio(jnp.asarray(audio)))
        feats = np.asarray(featurize(jnp.asarray(audio[None])))

        # warmup + timed loop (reference :30-37).  NOTE: per-predict
        # wall-clock — on the tunneled TPU each dispatch is ~32 ms
        # RTT-bound (CLAUDE.md), so this measures the tunnel, not the
        # chip; bench.py's scan-checksum is the device-time harness.
        scores = predict_fn(feats)[0]
        start = time.time()
        for _ in range(loop_count):
            scores = predict_fn(feats)[0]
        elapsed = time.time() - start
        print(
            f"Average Inference time: {elapsed / max(loop_count, 1) * 1000:.4f}ms"
        )
        results.append(
            handle_prediction(scores, class_names, top_k, wav_path, output_path)
        )
    return results


def main():
    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--audio_path", type=str, required=True,
                        help="wav file or directory of wavs")
    parser.add_argument("--classes_path", type=str, required=True)
    parser.add_argument("--params_path", type=str, default=None)
    parser.add_argument("--top_k", type=int, default=1)
    parser.add_argument("--loop_count", type=int, default=1)
    parser.add_argument("--feature_type", type=str, default=None,
                        choices=["mfcc", "bark"])
    parser.add_argument("--output_path", type=str, default=None)
    args = parser.parse_args()

    if args.params_path:
        inject_params(args.params_path)
    class_names = get_classes(args.classes_path)

    if os.path.isdir(args.audio_path):
        wav_paths = sorted(glob(os.path.join(args.audio_path, "*.wav")))
    else:
        wav_paths = [args.audio_path]
    validate(args.model_path, wav_paths, class_names, args.top_k,
             args.loop_count, args.feature_type, args.output_path)


if __name__ == "__main__":
    main()
