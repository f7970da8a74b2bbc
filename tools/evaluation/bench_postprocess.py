#!/usr/bin/env python3
"""Host-side multi-stream postprocess cost: scalar loop vs vectorized.

The stream server advances every serving slot once per 64 ms chunk tick
(chunk 1024 @ 16 kHz); whatever the host spends on per-slot postprocess
(argmax -> ThresholdDecoder -> TriggerDetector) comes out of that budget.
This harness measures both implementations at increasing slot counts:

- scalar: the per-slot Python loop (one decoder.decode + TriggerDetector
  per slot) the server used through round 2
- vectorized: decode_array + one TriggerDetectorArray update per tick
  (the server's current path)

Pure host numpy — no model, no device; safe to run anywhere.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from tpu_speech_commands.params import pr  # noqa: E402
from tpu_speech_commands.streaming import (  # noqa: E402
    ThresholdDecoder,
    TriggerDetector,
    TriggerDetectorArray,
)

CLASSES = ["background", "left", "right", "up", "down"]


def synth_scores(rng, n_slots, n_classes):
    """Softmax-ish scores with occasional confident command streaks."""
    logits = rng.standard_normal((n_slots, n_classes))
    streaky = rng.random(n_slots) < 0.3
    logits[streaky, 1] += 4.0
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def run_scalar(decoder, triggers, scores):
    fired = 0
    for i in range(len(scores)):
        idx = int(scores[i].argmax())
        conf = float(scores[i, idx])
        if idx != 0:
            conf = decoder.decode(conf)
        if triggers[i].update(idx, conf):
            fired += 1
    return fired


def run_vector(decoder, detector, scores):
    idx = scores.argmax(axis=1)
    conf = scores[np.arange(len(scores)), idx].astype(np.float64)
    non_bg = idx != 0
    conf[non_bg] = decoder.decode_array(conf[non_bg])
    return int(detector.update(idx, conf).sum())


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--slots", type=int, nargs="+",
                        default=[8, 64, 256, 1024, 4096])
    parser.add_argument("--ticks", type=int, default=50)
    parser.add_argument("--chunk_size", type=int, default=1024)
    args = parser.parse_args()

    budget_ms = 1000.0 * args.chunk_size / pr.sample_rate
    print(f"chunk budget: {budget_ms:.1f} ms/tick "
          f"(chunk {args.chunk_size} @ {pr.sample_rate} Hz)")
    print(f"{'slots':>6} {'scalar ms/tick':>15} {'vector ms/tick':>15} "
          f"{'speedup':>8}")
    for n_slots in args.slots:
        rng = np.random.default_rng(0)
        decoder = ThresholdDecoder(pr.threshold_config, pr.threshold_center)
        triggers = [TriggerDetector(args.chunk_size, CLASSES)
                    for _ in range(n_slots)]
        detector = TriggerDetectorArray(args.chunk_size, CLASSES,
                                        n_slots=n_slots)
        score_seq = [synth_scores(rng, n_slots, len(CLASSES))
                     for _ in range(args.ticks)]

        fired_s = 0
        t0 = time.perf_counter()
        for scores in score_seq:
            fired_s += run_scalar(decoder, triggers, scores)
        scalar_ms = 1000.0 * (time.perf_counter() - t0) / args.ticks

        fired_v = 0
        t0 = time.perf_counter()
        for scores in score_seq:
            fired_v += run_vector(decoder, detector, scores)
        vector_ms = 1000.0 * (time.perf_counter() - t0) / args.ticks

        assert fired_s == fired_v, (fired_s, fired_v)
        print(f"{n_slots:>6} {scalar_ms:>15.3f} {vector_ms:>15.3f} "
              f"{scalar_ms / max(vector_ms, 1e-9):>7.1f}x")


if __name__ == "__main__":
    main()
