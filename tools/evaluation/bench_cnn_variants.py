#!/usr/bin/env python3
"""CNN serving-path variants head-to-head (real TPU, scan-checksum).

Measures simple_cnn end-to-end (fused frontend + classifier) in three
classifier configurations at the same batch/methodology as bench.py:

  xla        — XLA conv stack (the round-2 recorded 3.27M w/s path)
  block1     — conv block 1 fused into a Pallas kernel (pallas_cnn.py)
  megakernel — ALL blocks + dense head in one kernel (pallas_classifier.py)

plus optional int16 audio staging for the winner.  One process, runs
sequentially (single-tenant TPU).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_type", default="simple_cnn")
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--k_inner", type=int, default=128)
    parser.add_argument("--variants", nargs="+",
                        default=["xla", "block1", "megakernel"])
    parser.add_argument("--int16", action="store_true",
                        help="also re-measure each variant with raw PCM16 "
                             "audio staging")
    args = parser.parse_args()

    from bench import bench

    fuse_for = {"xla": False, "block1": True, "megakernel": "classifier"}
    # production serving tile (serving.py: 16 -> 3.27M, 128 -> 3.98M w/s);
    # bench()'s default 16 would understate the Pallas variants ~20%
    tile_for = {"xla": 16, "block1": 128, "megakernel": 128}
    results = {}
    for variant in args.variants:
        for dtype in (["float32", "int16"] if args.int16 else ["float32"]):
            key = variant if dtype == "float32" else f"{variant}+int16"
            rate = bench(
                batch_size=args.batch_size, k_inner=args.k_inner,
                model_type=args.model_type, use_pallas=True,
                audio_dtype=dtype, fuse_conv1=fuse_for[variant],
                classifier_tile=tile_for[variant],
            )
            results[key] = rate
            print(json.dumps({"variant": key, "windows_per_sec": round(rate, 1),
                              "model_type": args.model_type,
                              "batch": args.batch_size}), flush=True)
    base = results.get("xla")
    if base:
        for key, rate in results.items():
            print(f"{key:>20}: {rate/1e6:7.3f} M w/s  ({rate/base:5.2f}x xla)")


if __name__ == "__main__":
    main()
