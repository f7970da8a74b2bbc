#!/usr/bin/env python3
"""Evaluate a speech-commands classifier (native .npz / tflite / h5 /
SavedModel) on a test dataset.

CLI-compatible with the reference evaluator (`eval.py:260-281`); native
checkpoints run batched + sharded on TPU, external formats run through
their own runtimes for conversion-parity checks.
"""
import argparse
import time

import numpy as np

from tpu_speech_commands.utils.compilation_cache import enable_compilation_cache
from tpu_speech_commands.data.dataset import get_dataset
from tpu_speech_commands.evaluation import plot_confusion_matrix
from tpu_speech_commands.export.inference_loader import (
    load_inference_model,
    resolve_checkpoint_contract,
)
from tpu_speech_commands.frontend import Frontend
from tpu_speech_commands.params import inject_params, pr
from tpu_speech_commands.utils import ensure_background_first, get_classes


def evaluate_with_predict_fn(predict_fn, ds, class_names, batch_size=512):
    """Format-agnostic accuracy + confusion over a Dataset."""
    num_classes = len(class_names)
    confusion = np.zeros((num_classes, num_classes), np.float64)
    correct = total = 0
    for start in range(0, len(ds), batch_size):
        x = ds.x[start : start + batch_size]
        y = ds.y[start : start + batch_size]
        scores = predict_fn(x)
        preds = np.argmax(scores, axis=-1)
        correct += int((preds == y).sum())
        total += len(y)
        np.add.at(confusion, (y, preds), 1.0)
    return correct / max(total, 1), confusion


def main(args):
    enable_compilation_cache()
    class_names = get_classes(args.classes_path)
    ensure_background_first(class_names)

    # load FIRST (a native checkpoint restores its stored train-time
    # params), then an explicit --params_path wins on top
    predict_fn, model_format = load_inference_model(args.model_path)
    print(f"Loaded {model_format} model from {args.model_path}")
    if args.params_path:
        inject_params(args.params_path)

    feature_type = resolve_checkpoint_contract(
        predict_fn, model_format, class_names=class_names,
        feature_type=args.feature_type,
    )

    frontend = Frontend(pr, feature_type=feature_type)
    ds = get_dataset(args.dataset_path, class_names, frontend=frontend)

    start = time.time()
    if model_format == "NATIVE":
        from tpu_speech_commands.evaluation import evaluate_accuracy

        variables = predict_fn.variables
        accuracy, confusion = evaluate_accuracy(
            predict_fn.model, variables, ds, predict_fn.model_type, class_names,
            batch_size=args.batch_size, output_path=args.output_path,
        )
    else:
        accuracy, confusion = evaluate_with_predict_fn(
            predict_fn, ds, class_names, args.batch_size
        )
        print(f"Eval on {len(ds)} samples: accuracy {accuracy:.4f}")
        plot_confusion_matrix(confusion, class_names, args.output_path)
    end = time.time()
    print("Evaluation time cost: {:.6f}s".format(end - start))
    return accuracy


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--classes_path", type=str, required=True)
    parser.add_argument("--params_path", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--feature_type", type=str, default=None,
                        choices=["mfcc", "bark"],
                        help="default: the checkpoint's stored frontend "
                             "(mfcc for external formats)")
    parser.add_argument("--output_path", type=str, default="result")
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
