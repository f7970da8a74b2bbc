#!/usr/bin/env python3
"""Round-4 frontend experiment: attack the ~1.7x compute-vs-load gap with
the stage-1-on-MXU (decimation-swap) family, as a same-session A/B
(VERDICT r3 'next' item 2).

The decimation-swap family, worked out:

  The CT kernel factors the 1024-point DFT as stage 1 = 8-point DFT
  across the lane-aligned planes (VPU radix-2 butterfly, 48 ns/window in
  the r3 omission profile) and stage 2 = 128-point DFT along lanes (MXU
  matmuls, ~68 ns incl. power).  "Do the 128-point lane-axis DFT on the
  MXU and fold the 8-point cross-plane stage into the stage-2 matrices"
  means computing X[k'] = sum_a P_a @ D_a with D_a(l, k') =
  W8^{(k' mod 8) a} * exp(-2*pi*i*k'*l/1024) — but sum_a P_a @ D_a over
  the 8 lane-contiguous plane slices of a frame IS the dense matmul
  F @ [D_0; ...; D_7] on the full (M, 1024) frame rows, flop-for-flop:
  2*M*1024*1024 vs the CT stage-2's 2*M*128*1792 — the 8-point factor's
  savings exist ONLY as a shared VPU intermediate; on the MXU its block
  structure becomes dense columns.  The swap endpoint is therefore
  exactly the existing dft_mode='dense' kernel (all DFT flops on the
  MXU, zero VPU butterfly), and the A/B below measures it directly.

Variants measured (same session, same audio pool):
  ct       — production (auto) kernel, f32
  dense    — decimation-swap endpoint: full DFT as one MXU matmul pair
  ct-hi    — production kernel under jax.default_matmul_precision
             ('highest'): quantifies the cost of closing the measured
             ~2-3e-2 f32-MXU rounding gap vs the f64 oracle
  dense-hi — dense under 'highest'
  load     — load-only kernel (the ~585 GB/s floor, for headroom context)

Run on the real chip: python tools/dev/r4_mxu_stage1.py --batch 8192
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch_tile", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_speech_commands.frontend import numpy_ref
    from tpu_speech_commands.ops.pallas_frontend import make_fused_frontend
    from tpu_speech_commands.params import pr
    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    rng = np.random.default_rng(7)
    audio = jnp.asarray(
        rng.standard_normal((args.batch, pr.max_samples)).astype(np.float32)
    )
    small = audio[:64]
    oracle = np.stack([
        numpy_ref.vectorize_raw(np.asarray(r, np.float64), pr)
        for r in np.asarray(small)
    ])[:, -pr.n_features:, :].astype(np.float32)

    tb = args.batch_tile
    n_windows = args.batch * args.iters

    def measure(fn, label, highest=False):
        ctx = (jax.default_matmul_precision("highest") if highest
               else _null())
        with ctx:
            jit_fn = jax.jit(fn)
            d = float(np.abs(np.asarray(jit_fn(small)) - oracle).max())

            # k_inner iterations inside one jitted scan; the gain operand
            # keeps the body live (SKILL.md: fixed-input bodies get hoisted)
            @jax.jit
            def many(a):
                def body(acc, g):
                    return acc + fn(a, g).sum(), None

                out, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    jnp.arange(1, args.iters + 1, dtype=jnp.float32),
                )
                return out

            float(many(audio))  # compile + warm
            t0 = time.perf_counter()
            float(many(audio))
            dt = time.perf_counter() - t0
        rate = n_windows / dt
        print(f"{label:10s}: {rate/1e6:7.3f} M windows/s   "
              f"max|err| vs f64 oracle = {d:.2e}", flush=True)
        return rate

    from contextlib import nullcontext as _null

    ct = make_fused_frontend(pr, batch_tile=tb, dft_mode="ct")
    dense = make_fused_frontend(pr, batch_tile=tb, dft_mode="dense")

    base = measure(ct, "ct")
    measure(dense, "dense")
    measure(ct, "ct-hi", highest=True)
    measure(dense, "dense-hi", highest=True)

    # load-only floor: read the audio block, emit a (TB, F)-shaped token
    n_frames, n_mfcc = pr.n_features, pr.n_mfcc

    def load_kernel(gain_ref, audio_ref, out_ref):
        a = audio_ref[:] * gain_ref[0, 0]
        out_ref[:] = jnp.broadcast_to(
            jnp.sum(a, axis=-1, keepdims=True), out_ref.shape
        )

    def load_only(a, gain=None):
        g = jnp.asarray(1.0 if gain is None else gain, jnp.float32)
        g = g.reshape(1, 1)
        return pl.pallas_call(
            load_kernel,
            grid=(a.shape[0] // tb,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tb, a.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, n_frames * n_mfcc),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (a.shape[0], n_frames * n_mfcc), jnp.float32
            ),
        )(g, a)

    @jax.jit
    def many_load(a):
        def body(acc, g):
            return acc + load_only(a, g).sum(), None

        out, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            jnp.arange(1, args.iters + 1, dtype=jnp.float32),
        )
        return out

    float(many_load(audio))
    t0 = time.perf_counter()
    float(many_load(audio))
    dt = time.perf_counter() - t0
    print(f"{'load':10s}: {n_windows/dt/1e6:7.3f} M windows/s   "
          f"(audio load floor)", flush=True)
    print(f"\nbaseline ct = {base/1e6:.3f} M w/s; the decimation-swap "
          "endpoint is 'dense' (see module docstring for the algebra)")


if __name__ == "__main__":
    main()
