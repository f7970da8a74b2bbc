#!/usr/bin/env python3
"""Dump a training checkpoint to a self-describing inference checkpoint
(reference: tools/misc/dump_inference_model.py — checkpoint -> fixed-batch
inference H5).  Here: any .npz checkpoint -> inference .npz with complete
metadata, ready for eval.py / listen.py / export."""
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
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output_file", required=True)
    parser.add_argument("--model_type", default=None,
                        help="override/assign model_type metadata")
    parser.add_argument("--classes_path", default=None)
    parser.add_argument("--params_path", default=None)
    args = parser.parse_args()

    from tpu_speech_commands.params import inject_params, pr
    from tpu_speech_commands.training.checkpoints import (
        load_checkpoint,
        save_checkpoint,
    )
    from tpu_speech_commands.utils import get_classes

    if args.params_path:
        inject_params(args.params_path)

    variables, meta = load_checkpoint(args.checkpoint)
    if args.model_type:
        meta["model_type"] = args.model_type
    if args.classes_path:
        classes = get_classes(args.classes_path)
        meta["classes"] = classes
        meta["num_classes"] = len(classes)
    if args.params_path:
        # an explicit --params_path repairs the stored params; setdefault
        # would silently keep the checkpoint's old (possibly wrong) ones
        meta["params"] = pr.to_dict()
    else:
        meta.setdefault("params", pr.to_dict())
    assert meta.get("model_type"), "model_type metadata required (--model_type)"
    assert meta.get("num_classes"), "num_classes metadata required (--classes_path)"
    save_checkpoint(args.output_file, variables, meta)
    print(f"dumped inference checkpoint to {args.output_file}")


if __name__ == "__main__":
    main()
