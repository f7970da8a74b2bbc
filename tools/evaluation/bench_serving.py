#!/usr/bin/env python3
"""Serving-surface benchmark: make_batch_scorer windows/sec/chip.

bench.py measures a hand-assembled forward; this tool measures the REAL
user surface — `tpu_speech_commands.serving.make_batch_scorer` on a
checkpoint file — with the same dispatch-proof methodology (k_inner
iterations inside ONE jitted `lax.scan` accumulating a score checksum,
each iteration kept live by an iteration-dependent gain).  The two should
agree to a few percent; a gap means the serving assembly has drifted from
the measured-fastest path.

    python tools/evaluation/bench_serving.py \
        --checkpoint pretrained/direction_simple_gru.npz
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint",
                        default="pretrained/direction_simple_gru.npz")
    parser.add_argument("--batch_size", type=int, default=8192)
    parser.add_argument("--k_inner", type=int, default=128)
    parser.add_argument("--outer", type=int, default=8)
    parser.add_argument("--audio_dtype", default="float32",
                        choices=["float32", "int16"])
    parser.add_argument("--compute_dtype", default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="classifier activation dtype (bfloat16 is the "
                             "standard TPU serving precision)")
    parser.add_argument("--no_pallas", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_speech_commands.params import pr
    from tpu_speech_commands.serving import make_batch_scorer
    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    scorer = make_batch_scorer(
        args.checkpoint,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16"
        else jnp.float32,
        use_pallas=False if args.no_pallas else None,
        jit=False,  # the scan below is the single jitted dispatch
    )
    print(f"model={scorer.model_type} paths={scorer.paths}", file=sys.stderr)

    @jax.jit
    def forward_many(audio):
        def body(carry, i):
            gain = 1.0 + 1e-9 * i.astype(jnp.float32)
            scores = scorer(audio, gain)
            return carry + scores.sum().astype(jnp.float32), None

        checksum, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            jnp.arange(args.k_inner, dtype=jnp.int32),
        )
        return checksum

    rng = np.random.default_rng(0)
    host = rng.standard_normal((args.batch_size, pr.max_samples))
    if args.audio_dtype == "int16":
        host = np.clip(host * 8192.0, -32768, 32767).astype(np.int16)
    else:
        host = host.astype(np.float32)
    audio = jax.device_put(jnp.asarray(host))

    checksum = forward_many(audio)  # warmup/compile
    assert np.isfinite(float(checksum))

    best = 0.0
    for _ in range(args.outer):
        t0 = time.perf_counter()
        checksum = forward_many(audio)
        _ = float(checksum)  # hard device->host sync
        dt = time.perf_counter() - t0
        best = max(best, args.k_inner * args.batch_size / dt)

    print(json.dumps({
        "metric": f"serving windows/sec/chip ({scorer.model_type}, "
                  f"make_batch_scorer, scan-checksum)",
        "value": round(best, 1),
        "unit": "windows/s",
        "paths": scorer.paths,
    }))


if __name__ == "__main__":
    main()
