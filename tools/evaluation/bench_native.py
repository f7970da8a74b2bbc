#!/usr/bin/env python3
"""Native (x86/ARM) deployment benchmark: one command reproduces the
PARITY.md native-app table.

Runs every pretrained family through native/build/speech_commands in
both f32 and dynamic-range int8 (.tscm v2), plus the streaming app's
per-chunk step cost, and prints a table + one JSON line.  The reference
baselines are the numbers published in
/root/reference/inference/README.md:170-171 (TFLite RNN: feature
3.051 ms + invoke 2.216 ms) and :459-460 (MNN CNN: 3.199 + 0.575 ms).

Usage:
  python tools/evaluation/bench_native.py [--loop_count 1000] [--runs 5]
"""
import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
BUILD = os.path.join(REPO, "native", "build")
FAMILIES = ["simple_cnn", "simple_cnn_lite", "simple_gru", "simple_lstm"]
# reference invoke baselines per architecture class (ms)
REF_INVOKE = {"simple_cnn": 0.575, "simple_cnn_lite": 0.575,
              "simple_gru": 2.216, "simple_lstm": 2.216}


def ensure_build():
    from tpu_speech_commands.utils.native_build import ensure_native_build

    return os.path.join(
        ensure_native_build("speech_commands", "speech_commands_stream"),
        "speech_commands",
    )


def invoke_ms(app, model, wav, loop_count, runs, threads):
    vals = []
    for _ in range(runs):
        out = subprocess.run(
            [app, "--model", model, "--wav", wav,
             "--loop_count", str(loop_count), "--threads", str(threads)],
            capture_output=True, text=True, check=True).stdout
        m = re.search(r"model invoke time: ([\d.]+) ms", out)
        if not m:
            raise RuntimeError(f"no invoke line in output:\n{out}")
        vals.append(float(m.group(1)))
    return statistics.median(vals)


def stream_step_us(model, wav, threads):
    out = subprocess.run(
        [os.path.join(BUILD, "speech_commands_stream"), "--model", model,
         "--wav", wav, "--timing", "--threads", str(threads)],
        capture_output=True, text=True, check=True).stdout
    m = re.search(r"per-chunk step time: ([\d.]+) us", out)
    if not m:
        raise RuntimeError(f"no timing line in output:\n{out}")
    return float(m.group(1))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--loop_count", type=int, default=1000)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--wav", default=os.path.join(REPO, "example",
                                                  "right_1.wav"))
    args = ap.parse_args()

    app = ensure_build()
    rows = []
    with tempfile.TemporaryDirectory() as td:
        for fam in FAMILIES:
            ckpt = os.path.join(REPO, "pretrained", f"direction_{fam}.npz")
            blob = os.path.join(REPO, "pretrained", f"direction_{fam}.tscm")
            # the int8 export below reads the .npz checkpoint too
            if not (os.path.exists(blob) and os.path.exists(ckpt)):
                print(f"skip {fam}: missing pretrained blob/checkpoint",
                      file=sys.stderr)
                continue
            qblob = os.path.join(td, f"{fam}_q.tscm")
            from tpu_speech_commands.export.native_format import export_native
            export_native(ckpt, qblob, quantize=True)
            f32 = invoke_ms(app, blob, args.wav, args.loop_count, args.runs,
                            args.threads)
            i8 = invoke_ms(app, qblob, args.wav, args.loop_count, args.runs,
                           args.threads)
            step = stream_step_us(blob, args.wav, args.threads)
            rows.append((fam, f32, i8, step))
            ref = REF_INVOKE[fam]
            print(f"{fam:17s} invoke f32 {f32:7.3f} ms ({ref / f32:6.1f}x "
                  f"ref) | int8 {i8:7.3f} ms | stream step {step:7.1f} us "
                  f"({64000.0 / step:6.0f}x real-time)")

    if not rows:
        print("no pretrained models found", file=sys.stderr)
        return 1
    # headline: the RNN family (the reference's own headline config)
    gru = next((r for r in rows if r[0] == "simple_gru"), rows[0])
    print(json.dumps({
        "metric": "native_invoke_ms_simple_gru",
        "value": gru[1],
        "unit": "ms",
        "vs_baseline": REF_INVOKE["simple_gru"] / gru[1],
        "rows": [{"family": f, "invoke_f32_ms": a, "invoke_int8_ms": b,
                  "stream_step_us": c} for f, a, b, c in rows],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
