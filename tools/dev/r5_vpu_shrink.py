#!/usr/bin/env python3
"""Round-5 frontend experiment: shrink the VPU fold/concat passes — the
last named lever of ROADMAP "worked-out" item 1 (the ~1.8x
compute-vs-load gap: ~331 GB/s kernel vs ~585 GB/s load floor).

What is left to shrink, after the banked/falsified variants:
  - mel=dup (fold-free duplicated-row mel) — measured negative (r3)
  - ppmel (per-piece mel on unfolded squares) — measured negative (r3)
  - wide-cell framing + lane-packed butterfly — banked (+0.5%, r3)
  - bf16 stage 1 — measured negative (r2/r4)
The untried residue is the POWER path between stage 2 and the
filterbank: per-residue 64-lane folds (part[:, :64] + part[:, 64:]),
an 8-piece narrow-lane power concat, then one (M, 512) matmul.

Variants (bit-identical math, layout only — power_path in
ops/pallas_frontend.py):
  concat  — production baseline
  reorder — E-matrix columns per conjugate pair laid out
            [Xr_s|Xr_t|Xi_s|Xi_t], so the fold is ONE native-width
            (M,128)+(M,128) add per pair and the power concat joins
            5 wide blocks instead of 8 narrow ones
  groupmm — reorder + per-group filterbank matmuls accumulated in f32
            (filt rows sliced per group): the power concat disappears;
            costs +25% mel-matmul MXU pad (5x128-pad-K vs 4 tiles)

If the r3 conclusion ("the frontend VPU time is ELEMENT-bound, not
issue-bound") is right, both variants are ~neutral: they cut ISSUES
(concat joins, narrow slices), not elements.  A win of >2% falsifies
that conclusion; neutral-or-negative numbers close ROADMAP item 1's
last lever with the same A/B rigor as the r4 MXU swap.

Run on the real chip: python tools/dev/r5_vpu_shrink.py --batch 8192
"""
import argparse
import os
import sys
import time
from contextlib import nullcontext

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch_tile", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3,
                    help="measurement repeats per variant (min is reported)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

    n_windows = args.batch * args.iters

    def measure(fn, label):
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
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(many(audio))
            best = min(best, time.perf_counter() - t0)
        rate = n_windows / best
        print(f"{label:10s}: {rate/1e6:7.3f} M windows/s   "
              f"max|err| vs f64 oracle = {d:.2e}", flush=True)
        return rate

    tb = args.batch_tile
    variants = {
        pp: make_fused_frontend(pr, batch_tile=tb, dft_mode="ct",
                                power_path=pp)
        for pp in ("concat", "reorder", "groupmm")
    }
    # interleave the order to reduce drift bias: each variant measured in
    # two separate passes, best-of taken inside measure() already
    rates = {}
    for pp, fe in variants.items():
        rates[pp] = measure(fe, pp)
    base = rates["concat"]
    for pp in ("reorder", "groupmm"):
        print(f"{pp} vs concat: {rates[pp]/base:.4f}x")


if __name__ == "__main__":
    main()
