#!/usr/bin/env python3
"""Round-3 perf experiments (dev tool): is the frontend really at the floor?

docs/ROADMAP.md records the frontend-only rate (4.79M windows/s at
batch_tile=16) as sitting AT a "measured f32 audio load floor ~307-315
GB/s" — but that floor was measured with ONE load-only kernel shape.  A
v5e's HBM spec is ~819 GB/s, so this script re-derives the floor across
batch tiles and re-sweeps the two production kernels:

  load-only kernel @ batch_tile 16/32/64/128  -> true achievable read BW
  fused CT frontend @ batch_tile 16/32        -> does a bigger tile load faster?
  GRU flagship pipeline @ classifier_tile 128/256 -> does 2x tile amortise
                                                     the serial recurrence?

Methodology is bench.py's (fixed batch + iteration-dependent SMEM gain in
ONE jitted lax.scan with a fetched checksum) — see DESIGN.md §2 for why
naive loops and dynamic-indexed pools both lie on this platform.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_speech_commands.params import pr
from tpu_speech_commands.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()


def make_load_only(batch_tile: int):
    """Read the audio block, emit one lane-sum column per row."""
    n_samples = pr.max_samples

    def kernel(gain_ref, audio_ref, out_ref):
        gain = gain_ref[0, 0]
        out_ref[:] = jnp.sum(audio_ref[:] * gain, axis=1, keepdims=True)

    def fn(audio, gain):
        batch = audio.shape[0]
        gain = jnp.asarray(gain, jnp.float32).reshape(1, 1)
        grid = (batch // batch_tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((batch_tile, n_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((batch_tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, 1), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=batch * n_samples,
                bytes_accessed=batch * n_samples * 4 + batch * 4,
                transcendentals=0,
            ),
        )(gain, audio)

    return fn


def measure(fn, audio, k_inner=128, outer=6):
    @jax.jit
    def many(audio):
        def body(carry, i):
            gain = 1.0 + 1e-9 * i.astype(jnp.float32)
            out = fn(audio, gain)
            return carry + out.sum().astype(jnp.float32), None

        checksum, _ = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(k_inner, dtype=jnp.int32)
        )
        return checksum

    c = many(audio)
    assert np.isfinite(float(c))
    best = 0.0
    for _ in range(outer):
        t0 = time.perf_counter()
        c = many(audio)
        _ = float(c)
        dt = time.perf_counter() - t0
        best = max(best, k_inner * audio.shape[0] / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", nargs="+",
                    default=["gru_tile", "load", "frontend_tile"],
                    choices=["gru_tile", "load", "frontend_tile"])
    ap.add_argument("--batch", type=int, default=8192)
    args = ap.parse_args()

    bytes_per_window = pr.max_samples * 4

    if "gru_tile" in args.exp:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "..", ".."))
        import bench as benchmod

        for ct in (128, 256):
            try:
                r = benchmod.bench(batch_size=args.batch, use_pallas=True,
                                   fuse_conv1="rnn", classifier_tile=ct,
                                   handoff_dtype="bfloat16")
                print(f"gru pipeline classifier_tile={ct}: "
                      f"{r/1e6:.3f} M windows/s", flush=True)
            except Exception as e:  # VMEM overflow etc. — record and go on
                print(f"gru pipeline classifier_tile={ct}: FAILED {e!r}",
                      flush=True)

    rng = np.random.default_rng(0)
    audio = jax.device_put(jnp.asarray(
        rng.standard_normal((args.batch, pr.max_samples)).astype(np.float32)
    ))

    if "load" in args.exp:
        for bt in (16, 32, 64, 128):
            r = measure(make_load_only(bt), audio)
            print(f"load-only batch_tile={bt}: {r/1e6:.3f} M windows/s "
                  f"= {r*bytes_per_window/1e9:.0f} GB/s", flush=True)

    if "frontend_tile" in args.exp:
        from tpu_speech_commands.ops import make_fused_frontend

        for bt in (16, 32):
            fe = make_fused_frontend(pr, batch_tile=bt)

            def fn(a, g, fe=fe):
                return fe(a, g)

            r = measure(fn, audio)
            print(f"frontend batch_tile={bt}: {r/1e6:.3f} M windows/s "
                  f"= {r*bytes_per_window/1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
