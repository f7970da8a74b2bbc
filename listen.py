#!/usr/bin/env python3
"""Streaming speech-commands demo: microphone or wav-file replay.

CLI-compatible with the reference (`listen.py:562-627`).  Native .npz
models run the fused chunk->scores step on TPU; --dump_model re-saves a
loaded model to a new checkpoint file.
"""
import argparse
import sys

from tpu_speech_commands.utils.compilation_cache import enable_compilation_cache
from tpu_speech_commands.streaming import Listener


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--classes_path", type=str, required=True)
    parser.add_argument("--params_path", type=str, default=None)
    parser.add_argument("--chunk_size", type=int, default=1024,
                        help="audio samples between inference")
    parser.add_argument("--sensitivity", type=float, default=0.5)
    parser.add_argument("--trigger_level", type=int, default=3)
    parser.add_argument("--save_dir", type=str, default=None,
                        help="folder to save false positives")
    parser.add_argument("--input_wav", type=str, default=None)
    parser.add_argument("--feature_type", type=str, default=None,
                        choices=["mfcc", "bark"],
                        help="default: the checkpoint's stored frontend "
                             "(mfcc for external formats)")
    parser.add_argument("--chime_path", type=str, default=None,
                        help="activation chime wav (mic mode); default "
                             "assets/activate.wav, alternative "
                             "assets/wozai.wav")
    parser.add_argument("--dump_model", default=False, action="store_true",
                        help="dump training model to inference checkpoint")
    parser.add_argument("--output_model_file", type=str, default=None)
    return parser


def main():
    enable_compilation_cache()
    args = build_parser().parse_args()
    # allowlist against the Listener contract — a denylist would pass any
    # future parser flag straight into Listener.__dict__ unvalidated
    kwargs = {k: v for k, v in vars(args).items()
              if k in Listener._defaults}

    if args.dump_model:
        # dump before constructing the Listener (stream state + jit
        # wrappers are not needed); only native .npz checkpoints carry the
        # training metadata this conversion reads (reference dump_model,
        # listen.py:292-300, likewise requires its training H5)
        if not args.output_model_file:
            raise ValueError("output model file is not specified")
        if not args.model_path.endswith(".npz"):
            raise ValueError(
                "--dump_model reads a training checkpoint (.npz); got "
                f"{args.model_path} — use tools/model_converter/"
                "export_model.py to convert other formats"
            )
        print("Dumping out training model to inference model")
        from tpu_speech_commands.training.checkpoints import (
            load_checkpoint,
            save_checkpoint,
        )

        out_file = args.output_model_file
        if not out_file.endswith(".npz"):
            # np.savez appends .npz silently; make the real path explicit
            out_file += ".npz"
            print(f"note: checkpoint format is .npz — writing {out_file}")
        variables, meta = load_checkpoint(args.model_path)
        save_checkpoint(out_file, variables, meta)
        sys.exit()

    listener = Listener(**kwargs)
    listener.run()


if __name__ == "__main__":
    main()
