#!/usr/bin/env python3
"""Print model parameter count and FLOPs.

Re-implementation of the reference statistics tool
(tools/evaluation/model_statistics.py:53-109) using XLA's cost analysis of
the compiled forward instead of the TF1 profiler.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main():
    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_type", type=str, default="simple_cnn",
                        choices=["simple_cnn", "simple_cnn_lite", "simple_gru",
                                 "simple_lstm"])
    parser.add_argument("--num_classes", type=int, default=5)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--params_path", type=str, default=None)
    args = parser.parse_args()

    from tpu_speech_commands.evaluation import get_model_statistics
    from tpu_speech_commands.params import inject_params

    if args.params_path:
        inject_params(args.params_path)

    stats = get_model_statistics(args.model_type, args.num_classes, args.batch_size)
    print(f"Model: {stats['model_type']} (batch {stats['batch_size']})")
    print(f"Total params: {stats['params']} ({stats['params_str']})")
    print(f"Total FLOPs:  {stats['flops']:.0f} ({stats['flops_str']})")


if __name__ == "__main__":
    main()
