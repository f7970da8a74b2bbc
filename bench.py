#!/usr/bin/env python3
"""Benchmark: feature-extraction + inference windows/sec/chip.

Measures the fused Pallas-MFCC frontend + simple_gru forward on
device-resident 1-second audio windows — the TPU counterpart of the
reference's single-stream C++ path and its own headline config (GRU/TFLite:
feature 3.051 ms + invoke 2.216 ms => ~190 windows/sec/core,
/root/reference/inference/README.md:170-171; see BASELINE.md).  Same
architecture class on both sides: RNN here vs the RNN baseline (the CNN/MNN
pair is 3.27M vs 265 w/s — see PARITY.md for every family).

Methodology: `k_inner` iterations run inside ONE jitted `lax.scan` whose
carry accumulates a checksum over every score — a single device dispatch
per measurement, immune to async-dispatch/DCE artifacts, with the ~32 ms
tunnel round-trip amortised over k_inner*B windows.  Each iteration feeds
the frontend kernel an iteration-dependent scalar gain (an SMEM operand),
which (a) keeps the body non-loop-invariant so XLA cannot hoist the work
out of the scan, and (b) unlike the previous sub-batch dynamic-index
scheme, adds no per-iteration HBM copy of the batch (measured: indexing a
(n_stack, B, S) pool capped effective input bandwidth at ~160 GB/s; the
scalar-gain form reads the same fixed batch at ~315 GB/s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import time

import numpy as np

BASELINE_WINDOWS_PER_SEC = 190.0  # reference TFLite path, BASELINE.md


def bench(batch_size: int = 8192, k_inner: int = 128,
          outer: int = 8, model_type: str = "simple_gru",
          use_pallas: bool = True, audio_dtype: str = "float32",
          fuse_conv1: "bool | str" = False, classifier_tile: int = 16,
          handoff_dtype: str = "float32", time_major: bool = False) -> float:
    # batch 8192 measured best for the GRU flagship (4096: ~3.8M, 8192:
    # ~4.35M w/s — bigger batches amortise per-dispatch scan overheads;
    # 16384 compiles for many minutes through the tunnel for ~no gain)
    import jax
    import jax.numpy as jnp

    from tpu_speech_commands.frontend import Frontend
    from tpu_speech_commands.models import features_to_input, init_model, score_fn
    from tpu_speech_commands.params import pr
    from tpu_speech_commands.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    if use_pallas:
        from tpu_speech_commands.ops import make_fused_frontend

        # bfloat16 handoff halves the feature tensor's HBM round trip
        # between the frontend and a bf16 Pallas classifier; the
        # classifier rounds its matmul inputs to bf16 anyway, so the
        # scores are bit-identical (tests/test_pallas_frontend.py)
        # time_major hands off (T, B, F): both kernels drop their
        # narrow-lane sublane transposes (ops/pallas_frontend.py)
        frontend = make_fused_frontend(
            pr, batch_tile=16, out_dtype=jnp.dtype(handoff_dtype),
            time_major=time_major,
        )
    else:
        fe = Frontend(pr)

        def frontend(audio, gain):
            # decode PCM16 before the gain multiply — `audio * gain` would
            # promote to float and skip Frontend's own int16 decode branch,
            # leaving features scaled 32768x vs the fused path
            if audio.dtype == jnp.int16:
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            return fe(audio * gain)
    # bf16 activations for the classifier: standard TPU serving precision
    # (params stay f32; frontend numerics stay exact f32). Top-1 agreement
    # with the f32 model is 1.0, max softmax delta ~5e-4 — and the
    # reference's own TFLite apps allow fp16 inference
    # (speech_commands.cpp SetAllowFp16PrecisionForFp32).
    model, variables = init_model(model_type, 5, jax.random.PRNGKey(0),
                                  batch_size=2, dtype=jnp.bfloat16)

    if fuse_conv1 not in (False, True, "classifier", "rnn"):
        raise ValueError(
            f"fuse_conv1 must be False, True, 'classifier' or 'rnn'; got "
            f"{fuse_conv1!r}"
        )
    if time_major and (not use_pallas or
                       fuse_conv1 not in ("classifier", "rnn")):
        raise ValueError(
            "time_major needs the fused frontend AND a fused classifier "
            "(fuse_conv1='classifier'|'rnn') — the XLA paths are batch-major"
        )
    if fuse_conv1 == "classifier":
        # whole-classifier megakernel: all conv blocks + dense head in ONE
        # Pallas kernel — zero intermediate HBM traffic
        # (ops/pallas_classifier.py)
        from tpu_speech_commands.ops.pallas_classifier import (
            make_fused_cnn_classifier,
        )

        fused_cls = make_fused_cnn_classifier(
            variables, separable=(model_type == "simple_cnn_lite"),
            batch_tile=classifier_tile, compute_dtype=jnp.bfloat16,
            time_major=time_major,
        )

        def forward(variables, audio, gain):
            feats = frontend(audio, gain)
            return score_fn(fused_cls(feats))
    elif fuse_conv1 == "rnn":
        # fused RNN classifier: hoisted per-gate input projections + the
        # 30-step recurrence unrolled in VMEM (ops/pallas_rnn.py)
        from tpu_speech_commands.ops.pallas_rnn import (
            make_fused_rnn_classifier,
        )

        fused_rnn = make_fused_rnn_classifier(
            variables, cell_type=model_type.removeprefix("simple_"),
            batch_tile=classifier_tile, compute_dtype=jnp.bfloat16,
            time_major=time_major,
        )

        def forward(variables, audio, gain):
            feats = frontend(audio, gain)
            return score_fn(fused_rnn(feats))
    elif fuse_conv1:
        # CNN serving path with conv block 1 as a fused Pallas kernel
        # (conv+bias+relu6+pool in VMEM — the pre-pool activation never
        # touches HBM; ops/pallas_cnn.py)
        from tpu_speech_commands.ops import make_fused_cnn_forward

        fused_fwd = make_fused_cnn_forward(
            model, variables, batch_tile=classifier_tile,
            compute_dtype=jnp.bfloat16,
        )

        def forward(variables, audio, gain):
            feats = frontend(audio, gain)
            return score_fn(fused_fwd(feats))
    else:
        def forward(variables, audio, gain):
            feats = frontend(audio, gain)
            x = features_to_input(feats, model_type)
            return score_fn(model.apply(variables, x, train=False))

    @jax.jit
    def forward_many(variables, audio):
        # k_inner iterations over the same device-resident batch; the
        # per-iteration gain keeps every iteration live (no hoisting)
        def body(carry, i):
            gain = 1.0 + 1e-9 * i.astype(jnp.float32)
            scores = forward(variables, audio, gain)
            return carry + scores.sum().astype(jnp.float32), None

        checksum, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(k_inner, dtype=jnp.int32)
        )
        return checksum

    rng = np.random.default_rng(0)
    host_audio = rng.standard_normal((batch_size, pr.max_samples))
    if audio_dtype == "int16":
        # raw PCM16 staging — the deployment-native input format (wav files
        # and mic captures are int16; the kernel decodes x/32768 in VMEM),
        # and half the HBM read traffic of float32
        host_audio = np.clip(host_audio * 8192.0, -32768, 32767).astype(np.int16)
    else:
        host_audio = host_audio.astype(np.float32)
    audio = jax.device_put(jnp.asarray(host_audio))
    variables = jax.device_put(variables)

    checksum = forward_many(variables, audio)  # warmup/compile
    assert np.isfinite(float(checksum))

    best = 0.0
    for _ in range(outer):
        t0 = time.perf_counter()
        checksum = forward_many(variables, audio)
        _ = float(checksum)  # hard device->host sync on real data
        dt = time.perf_counter() - t0
        best = max(best, k_inner * batch_size / dt)
    return best


def main():
    # fastest measured assembly first (fused frontend + fused RNN
    # classifier), then progressively safer fallbacks; the metric label
    # names the path that actually produced the number
    attempts = [
        ("fused Pallas CT-DFT MFCC + fused RNN classifier kernel",
         dict(use_pallas=True, fuse_conv1="rnn", classifier_tile=128,
              handoff_dtype="bfloat16", time_major=True)),
        ("fused Pallas CT-DFT MFCC + XLA scan classifier",
         dict(use_pallas=True)),
        ("XLA GEMM MFCC + XLA scan classifier",
         dict(use_pallas=False)),
    ]
    import sys
    import traceback

    best, best_path = 0.0, "no path succeeded"
    for path, kw in attempts:
        try:
            best = max(best, bench(**kw))
        except Exception:
            # a silent downgrade to a ~20x-slower fallback would read as a
            # perf regression with no cause; stdout stays one JSON line
            print(f"bench path failed: {path}", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            continue
        if best > 0:
            best_path = path
            break  # this path worked; skip the slower fallbacks
    print(
        json.dumps(
            {
                "metric": "feature+inference windows/sec/chip "
                          "(simple_gru — the reference's headline RNN "
                          f"config — {best_path}, scan-checksum)",
                "value": round(best, 1),
                "unit": "windows/s",
                "vs_baseline": round(best / BASELINE_WINDOWS_PER_SEC, 2),
            }
        )
    )


def _arm_watchdog():
    """Fail loudly instead of hanging forever when the TPU tunnel is down.

    A dead tunnel makes jax device init block indefinitely at 0% CPU
    (CLAUDE.md: observed multi-hour outages); without a watchdog the
    whole bench run hangs with no diagnostic.  Generous default — a cold
    compile through the tunnel is ~2-5 min per path and main() tries 3.
    """
    import os
    import threading

    timeout_s = float(os.environ.get("TSC_BENCH_TIMEOUT_S", "2400"))
    if timeout_s <= 0:
        return

    def fire():
        import sys

        print(
            f"bench.py watchdog: no result after {timeout_s:.0f}s — "
            "TPU tunnel down or device lease stuck; aborting",
            file=sys.stderr,
        )
        sys.stderr.flush()
        os._exit(3)

    t = threading.Timer(timeout_s, fire)
    t.daemon = True
    t.start()


if __name__ == "__main__":
    _arm_watchdog()
    main()
