#!/usr/bin/env python3
"""Round-5 per-family end-to-end re-measure after the zero-concat power
path landed (ops/pallas_frontend.py power_path='groupmm', +7.6% kernel).

The PARITY table's simple_cnn / simple_cnn_lite / simple_lstm numbers
predate that change; every family shares the fused frontend, so all
should move.  Each family runs its measured-best assembly (bench.py /
docs/ROADMAP.md):

  simple_gru       fused frontend + fused RNN kernel (the flagship — the
                   session anchor; compare against the same-session
                   bench.py number)
  simple_cnn       fused frontend + whole-classifier megakernel tile=128
  simple_cnn_lite  same megakernel, separable compose
  simple_lstm      fused frontend + XLA scan classifier (the fused LSTM
                   kernel is a measured negative, ROADMAP)

Usage: python tools/dev/r5_family_bench.py  (single real TPU chip)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from bench import bench  # noqa: E402

CONFIGS = [
    ("simple_gru", dict(fuse_conv1="rnn", classifier_tile=128,
                        handoff_dtype="bfloat16", time_major=True)),
    ("simple_cnn", dict(fuse_conv1="classifier", classifier_tile=128,
                        handoff_dtype="bfloat16", time_major=True)),
    ("simple_cnn_lite", dict(fuse_conv1="classifier", classifier_tile=128,
                             handoff_dtype="bfloat16", time_major=True)),
    ("simple_lstm", dict()),
]


def main():
    for model_type, kw in CONFIGS:
        wps = bench(model_type=model_type, use_pallas=True, **kw)
        print(f"{model_type:16s}: {wps:>12,.0f} windows/s  ({kw})",
              flush=True)


if __name__ == "__main__":
    main()
