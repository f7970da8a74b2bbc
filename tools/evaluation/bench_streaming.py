#!/usr/bin/env python3
"""Streaming latency benchmark: per-chunk end-to-end step latency.

Measures the fused chunk -> ring update -> incremental MFCC -> model ->
softmax device step (the serving hot path in streaming/listener.py) and
reports p50/p90/p99 latency plus the real-time budget margin (a 1024-sample
chunk at 16 kHz arrives every 64 ms).  Reference single-stream cost:
~5.3 ms/window (BASELINE.md).  Optionally writes a jax.profiler trace.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_type", default="simple_cnn",
                        choices=["simple_cnn", "simple_cnn_lite", "simple_gru",
                                 "simple_lstm"])
    parser.add_argument("--num_classes", type=int, default=5)
    parser.add_argument("--chunk_size", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=500)
    parser.add_argument("--streams", type=int, default=1,
                        help="concurrent streams batched into one step")
    parser.add_argument("--profile_dir", default=None,
                        help="write a jax.profiler trace here")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from tpu_speech_commands.frontend import Frontend
    from tpu_speech_commands.models import features_to_input, init_model, score_fn
    from tpu_speech_commands.params import pr
    from tpu_speech_commands.streaming import init_stream_state, make_stream_update

    frontend = Frontend(pr)
    update = make_stream_update(frontend, args.chunk_size)
    model, variables = init_model(
        args.model_type, args.num_classes, jax.random.PRNGKey(0)
    )

    n_streams = args.streams
    rng = np.random.default_rng(0)

    # the streamer natively supports a leading stream axis (shared chunk
    # cadence) — same compiled shape family as the single-stream Listener
    def fused(states, chunks):
        states, feats = update(states, chunks)
        x = features_to_input(feats if n_streams > 1 else feats[None],
                              args.model_type)
        logits = model.apply(variables, x, train=False)
        return states, score_fn(logits)

    states = init_stream_state(pr, n_streams if n_streams > 1 else None)
    shape = (n_streams, args.chunk_size) if n_streams > 1 else (args.chunk_size,)
    chunks = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    step = jax.jit(fused, donate_argnums=(0,))

    for _ in range(20):  # warmup
        states, scores = step(states, chunks)
    scores.block_until_ready()

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    latencies = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        states, scores = step(states, chunks)
        scores.block_until_ready()
        latencies.append((time.perf_counter() - t0) * 1000.0)

    if args.profile_dir:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile_dir}")

    lat = np.array(latencies)
    budget_ms = 1000.0 * args.chunk_size / pr.sample_rate
    print(f"model={args.model_type} streams={n_streams} chunk={args.chunk_size}")
    print(f"p50 {np.percentile(lat, 50):.3f} ms | p90 {np.percentile(lat, 90):.3f} ms "
          f"| p99 {np.percentile(lat, 99):.3f} ms | mean {lat.mean():.3f} ms")
    print(f"real-time budget {budget_ms:.1f} ms/chunk -> headroom "
          f"{budget_ms / np.percentile(lat, 50):.1f}x at p50")


if __name__ == "__main__":
    main()
