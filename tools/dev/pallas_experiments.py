#!/usr/bin/env python3
"""Pallas frontend optimization experiments (dev tool, round-1 era).

HISTORICAL: these variants explored the DENSE-DFT kernel; the production
kernel has since moved to the two-stage Cooley-Tukey GEMM-DFT
(ops/pallas_frontend.py dft_mode='ct'), whose own tried-and-rejected
variants (per-piece mel accumulation, duplicated-row mel, bf16 matmuls,
int16 staging, input-projection hoist) are recorded in docs/ROADMAP.md.
Kept for the record of what was tried, NOT as a harness template: the
measure() loop here dynamic-indexes a sub-batch pool inside the scan,
which copies the slice every iteration (~160 GB/s input cap, CLAUDE.md)
— variants faster than ~2.5M windows/s measure identically under it.
bench.py's fixed-batch + iteration-dependent-gain scan is the correct
methodology for new experiments.

Variants measured with a single-dispatch checksum (out.sum() fetched to
host), immune to async-dispatch artifacts:

  tile8/tile16/tile32 — dense kernel at different batch tiles
  combined            — cos|sin fused into ONE (W, 2*bins) matmul
  xla                 — the jnp lowering for comparison
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_speech_commands.frontend import Frontend, numpy_ref
from tpu_speech_commands.ops import make_fused_frontend
from tpu_speech_commands.ops.pallas_frontend import _padded_matrices, _params_key
from tpu_speech_commands.params import pr
from tpu_speech_commands.utils.compilation_cache import enable_compilation_cache

LOG_EPS = numpy_ref.LOG_EPS


def make_combined_kernel(batch_tile: int):
    """cos|sin concatenated: one (T*TB, W) @ (W, 2*bins) matmul."""
    cos, sin, filt, dct_t = _padded_matrices(_params_key(pr), "mfcc")
    window, hop = pr.window_samples, pr.hop_samples
    n_frames = 1 + (pr.max_samples - window) // hop
    n_mfcc = pr.n_mfcc
    bins = cos.shape[1]
    cs = np.concatenate([cos, sin], axis=1)  # (W, 2*bins)
    inv_fft = np.float32(1.0 / pr.n_fft)

    def kernel(audio_ref, cs_ref, filt_ref, dct_ref, out_ref):
        audio = audio_ref[:]
        frames = jnp.concatenate(
            [audio[:, t * hop : t * hop + window] for t in range(n_frames)]
        )
        reim = jnp.dot(frames, cs_ref[:], preferred_element_type=jnp.float32)
        re, im = reim[:, :bins], reim[:, bins:]
        power = (re * re + im * im) * inv_fft
        mels = jnp.log(jnp.clip(
            jnp.dot(power, filt_ref[:], preferred_element_type=jnp.float32),
            LOG_EPS, None))
        coeffs = jnp.dot(mels, dct_ref[:], preferred_element_type=jnp.float32)
        energy = jnp.log(jnp.clip(jnp.sum(power, -1, keepdims=True), LOG_EPS, None))
        out = jnp.concatenate([energy, coeffs[:, 1:n_mfcc]], -1)
        out_ref[:] = out.reshape(n_frames, batch_tile, n_mfcc).transpose(1, 0, 2)

    matrices = (jnp.asarray(cs), jnp.asarray(filt), jnp.asarray(dct_t))

    def frontend(audio):
        batch = audio.shape[0]
        grid = (batch // batch_tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((batch_tile, pr.max_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cs.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(filt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(dct_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((batch_tile, n_frames, n_mfcc),
                                   lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, n_frames, n_mfcc), jnp.float32),
        )(audio, *matrices)

    return frontend


def make_bf16_kernel(batch_tile: int):
    """DFT matrices passed as true bf16 arrays; frames cast once."""
    cos, sin, filt, dct_t = _padded_matrices(_params_key(pr), "mfcc")
    window, hop = pr.window_samples, pr.hop_samples
    n_frames = 1 + (pr.max_samples - window) // hop
    n_mfcc = pr.n_mfcc
    inv_fft = np.float32(1.0 / pr.n_fft)

    def kernel(audio_ref, cos_ref, sin_ref, filt_ref, dct_ref, out_ref):
        audio = audio_ref[:]
        frames = jnp.concatenate(
            [audio[:, t * hop : t * hop + window] for t in range(n_frames)]
        ).astype(jnp.bfloat16)
        re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
        power = (re * re + im * im) * inv_fft
        mels = jnp.log(jnp.clip(
            jnp.dot(power, filt_ref[:], preferred_element_type=jnp.float32),
            LOG_EPS, None))
        coeffs = jnp.dot(mels, dct_ref[:], preferred_element_type=jnp.float32)
        energy = jnp.log(jnp.clip(jnp.sum(power, -1, keepdims=True), LOG_EPS, None))
        out = jnp.concatenate([energy, coeffs[:, 1:n_mfcc]], -1)
        out_ref[:] = out.reshape(n_frames, batch_tile, n_mfcc).transpose(1, 0, 2)

    matrices = (
        jnp.asarray(cos, jnp.bfloat16),
        jnp.asarray(sin, jnp.bfloat16),
        jnp.asarray(filt),
        jnp.asarray(dct_t),
    )

    def frontend(audio):
        batch = audio.shape[0]
        grid = (batch // batch_tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((batch_tile, pr.max_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cos.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(sin.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(filt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(dct_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((batch_tile, n_frames, n_mfcc),
                                   lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, n_frames, n_mfcc), jnp.float32),
        )(audio, *matrices)

    return frontend


def make_reshape_kernel(batch_tile: int):
    """window == 2*hop fast framing: frames = concat of adjacent hop blocks
    (2 large copies instead of n_frames strided slices)."""
    cos, sin, filt, dct_t = _padded_matrices(_params_key(pr), "mfcc")
    window, hop = pr.window_samples, pr.hop_samples
    assert window == 2 * hop
    n_frames = 1 + (pr.max_samples - window) // hop
    n_blocks = n_frames + 1
    n_mfcc = pr.n_mfcc
    inv_fft = np.float32(1.0 / pr.n_fft)

    def kernel(audio_ref, cos_ref, sin_ref, filt_ref, dct_ref, out_ref):
        audio = audio_ref[:]  # (TB, S)
        blocks = audio[:, : n_blocks * hop].reshape(batch_tile, n_blocks, hop)
        # frame = [block_t, block_{t+1}] -> DFT splits into two half-window
        # matmuls (no concat: Mosaic rejects offset-mismatched concats)
        f1 = blocks[:, :-1, :].reshape(batch_tile * n_frames, hop)
        f2 = blocks[:, 1:, :].reshape(batch_tile * n_frames, hop)
        re = (
            jnp.dot(f1, cos_ref[:hop, :], preferred_element_type=jnp.float32)
            + jnp.dot(f2, cos_ref[hop:, :], preferred_element_type=jnp.float32)
        )
        im = (
            jnp.dot(f1, sin_ref[:hop, :], preferred_element_type=jnp.float32)
            + jnp.dot(f2, sin_ref[hop:, :], preferred_element_type=jnp.float32)
        )
        power = (re * re + im * im) * inv_fft
        mels = jnp.log(jnp.clip(
            jnp.dot(power, filt_ref[:], preferred_element_type=jnp.float32),
            LOG_EPS, None))
        coeffs = jnp.dot(mels, dct_ref[:], preferred_element_type=jnp.float32)
        energy = jnp.log(jnp.clip(jnp.sum(power, -1, keepdims=True), LOG_EPS, None))
        out = jnp.concatenate([energy, coeffs[:, 1:n_mfcc]], -1)
        out_ref[:] = out.reshape(batch_tile, n_frames, n_mfcc)

    matrices = (jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(filt),
                jnp.asarray(dct_t))

    def frontend(audio):
        batch = audio.shape[0]
        grid = (batch // batch_tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((batch_tile, pr.max_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(cos.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(sin.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(filt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(dct_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((batch_tile, n_frames, n_mfcc),
                                   lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, n_frames, n_mfcc), jnp.float32),
        )(audio, *matrices)

    return frontend


def measure(name, frontend, audio, k_inner: int = 128):
    """RTT-amortised scan-checksum (see bench.py methodology)."""
    n_stack = audio.shape[0] // 2048
    stack = audio[: n_stack * 2048].reshape(n_stack, 2048, audio.shape[1])

    @jax.jit
    def many(stack):
        def body(c, i):
            a = jax.lax.dynamic_index_in_dim(stack, i % n_stack, 0, False)
            return c + frontend(a).sum(), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(k_inner, dtype=jnp.int32))
        return c

    c = many(stack)
    assert np.isfinite(float(c))
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        c = many(stack)
        _ = float(c)
        best = max(best, k_inner * 2048 / (time.perf_counter() - t0))
    print(f"{name}: {best:,.0f} windows/s (amortised)")
    return best


def main():
    enable_compilation_cache()
    B = 16384
    rng = np.random.default_rng(0)
    audio = jax.device_put(
        jnp.asarray(rng.standard_normal((B, pr.max_samples)).astype(np.float32))
    )

    variants = dict(
        tile16=lambda: make_fused_frontend(pr, batch_tile=16),
        tile32=lambda: make_fused_frontend(pr, batch_tile=32),
        combined16=lambda: make_combined_kernel(16),
        bf16mat16=lambda: make_bf16_kernel(16),
        bf16mat32=lambda: make_bf16_kernel(32),
        reshape16=lambda: make_reshape_kernel(16),
        reshape32=lambda: make_reshape_kernel(32),
        xla=lambda: Frontend(pr),
    )
    for name in sys.argv[1:] or variants:
        measure(name, variants[name](), audio)


if __name__ == "__main__":
    main()
