#!/usr/bin/env python3
"""Export a native checkpoint to SavedModel / TFLite / ONNX.

Replaces the reference's converter scripts
(tools/model_converter/{keras_to_tensorflow,keras_to_onnx,
custom_tflite_convert}.py) with one jax2tf-based CLI:

    python tools/model_converter/export_model.py \
        --checkpoint logs/000/trained_final.npz \
        --format tflite --output_path model.tflite
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
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="native .npz checkpoint")
    parser.add_argument("--format", type=str, required=True,
                        choices=["saved_model", "tflite", "pb", "onnx",
                                 "keras_h5", "native"])
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--quantize", action="store_true",
                        help="8-bit weight quantization: TFLite dynamic-range"
                             " for --format tflite, symmetric per-channel"
                             " int8 kernels for --format native")
    parser.add_argument("--calibration_features", type=str, default=None,
                        help="npy/npz of (N, n_features, feature_size) "
                             "features for full int8 activation calibration "
                             "(MNN quantized.out analogue)")
    parser.add_argument("--output_nodes_prefix", type=str, default=None,
                        help="(--format pb) alias output nodes as "
                             "<prefix>0..N-1 via appended Identity nodes "
                             "(reference keras_to_tensorflow.py:99-111)")
    parser.add_argument("--save_graph_def", action="store_true",
                        help="(--format pb) also dump an ascii .pbtxt "
                             "next to the .pb")
    parser.add_argument("--params_path", type=str, default=None)
    args = parser.parse_args()

    from tpu_speech_commands.export.saved_model import (
        export_frozen_pb,
        export_onnx,
        export_saved_model,
        export_tflite,
    )
    from tpu_speech_commands.params import inject_params

    if args.params_path:
        inject_params(args.params_path)

    if args.format == "saved_model":
        out = export_saved_model(args.checkpoint, args.output_path)
    elif args.format == "tflite":
        rep = None
        if args.calibration_features:
            import numpy as np

            loaded = np.load(args.calibration_features)
            if hasattr(loaded, "files"):
                # a multi-member archive (e.g. features+labels): taking an
                # arbitrary member could calibrate int8 ranges on labels.
                # Prefer a 'features' member, else the sole member, else
                # demand an explicit layout.
                if "features" in loaded.files:
                    rep = loaded["features"]
                elif len(loaded.files) == 1:
                    rep = loaded[loaded.files[0]]
                else:
                    raise ValueError(
                        f"{args.calibration_features} has members "
                        f"{loaded.files}; save the calibration set as a "
                        "single array or under the key 'features'"
                    )
            else:
                rep = loaded
        out = export_tflite(args.checkpoint, args.output_path, args.quantize,
                            representative_data=rep)
    elif args.format == "pb":
        out = export_frozen_pb(args.checkpoint, args.output_path,
                               output_nodes_prefix=args.output_nodes_prefix,
                               save_graph_def=args.save_graph_def)
    elif args.format == "keras_h5":
        from tpu_speech_commands.export.keras_interop import export_keras_h5

        out = export_keras_h5(args.checkpoint, args.output_path)
    elif args.format == "native":
        from tpu_speech_commands.export.native_format import export_native

        out = export_native(args.checkpoint, args.output_path,
                            quantize=args.quantize)
    else:
        out = export_onnx(args.checkpoint, args.output_path)
    print(f"Exported {args.format} to {out}")


if __name__ == "__main__":
    main()
