#!/usr/bin/env python3
"""Stage-omission profile of the production CT frontend kernel (dev tool).

The fused frontend is COMPUTE-bound (load-only reads ~585 GB/s ≈ 9.1M
windows/s-equivalent; the kernel runs ~5.2M — r3_experiments.py), and the
layout/bf16/tile levers are all measured negatives (docs/ROADMAP.md).  To
find WHERE the compute goes, this builds kernel variants truncated after
each pipeline stage:

  load < framing < butterfly < stage2-power < mel < log < full

Each variant computes the pipeline up to its stage and then consumes
every produced element with a cheap fold into a fixed (TB, 128) output
block (so jaxpr DCE cannot delete the stage under test, and the write
cost is identical across variants).  Successive rate deltas ≈ per-stage
cost.  Methodology is bench.py's scan-checksum (iteration-dependent SMEM
gain, one dispatch).

Run on TPU:  python tools/dev/r3_omission.py
"""
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

from tpu_speech_commands.ops.pallas_frontend import (
    CT_J,
    LANES,
    _ct_matrices,
    _decode_audio,
    _dft8_real,
    _gain_smem,
    _params_key,
)
from tpu_speech_commands.frontend.dsp import safe_log
from tpu_speech_commands.params import pr
from tpu_speech_commands.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()

STAGES = ["load", "framing", "butterfly", "power", "mel", "log", "full"]


def make_truncated(stage: str, batch_tile: int = 16,
                   constant_block: bool = False):
    """constant_block reuses ONE audio block for every grid step (the
    index map ignores i, so Mosaic fetches it once): per-step time is
    then pure compute — subtracting rates isolates stage compute even
    below the DMA floor."""
    return _make_truncated(stage, batch_tile, constant_block)


def _make_truncated(stage: str, batch_tile: int, constant_block: bool):
    p = pr
    ct_cos, ct_sin, e2a, e2b, filt_half, filt_nyq, dct_t = _ct_matrices(
        _params_key(p), "mfcc"
    )
    n2 = p.n_fft // LANES
    half = n2 // 2
    window, hop = p.window_samples, p.hop_samples
    n_samples = p.max_samples
    n_frames = 1 + (n_samples - window) // hop
    n_mfcc, n_filt = p.n_mfcc, p.n_filt
    assert n2 == 8, "profile assumes the production butterfly config"
    overlap = 2 * hop == p.n_fft and (n_frames + 1) * hop <= n_samples
    assert overlap
    nyq_scale = np.float32(1.0 / np.sqrt(p.n_fft))

    def fold_rows(x2):
        # consume a frame-major (T*TB, L) tensor into (TB, L<=128): sum
        # over frames — same op count for every variant that reaches it
        t = x2.shape[0] // batch_tile
        out = x2.reshape(t, batch_tile, x2.shape[1]).sum(0)
        if out.shape[1] < LANES:
            out = jnp.pad(out, ((0, 0), (0, LANES - out.shape[1])))
        return out[:, :LANES]

    def kernel(gain_ref, audio_ref, ea_ref, eb_ref, filt_ref, fnyq_ref,
               dct_ref, out_ref):
        audio = _decode_audio(audio_ref, gain_ref)
        if stage == "load":
            out_ref[:] = audio[:, :LANES] + audio[:, -LANES:]
            return
        cells = [
            jnp.concatenate(
                [audio[:, t * hop + c * LANES: t * hop + (c + 1) * LANES]
                 for t in range(n_frames + 1)]
            )
            for c in range(half)
        ]
        m_rows = n_frames * batch_tile
        planes = [cells[a][:m_rows] for a in range(half)] + [
            cells[a][batch_tile: m_rows + batch_tile] for a in range(half)
        ]
        if stage == "framing":
            acc = planes[0]
            for pl_ in planes[1:]:
                acc = acc + pl_
            out_ref[:] = fold_rows(acc)
            return
        t_re, t_im = _dft8_real(planes, jnp.float32)
        if stage == "butterfly":
            acc = t_re[0]
            for s in (1, 2, 3, 4):
                acc = acc + t_re[s]
            for s in (1, 2, 3):
                acc = acc + t_im[s]
            out_ref[:] = fold_rows(acc)
            return

        def mm(x, e):
            return jnp.dot(x, e, preferred_element_type=jnp.float32)

        pieces = []
        for s in range(n2):
            sr = s if s <= half else n2 - s
            tr = t_re[sr]
            if sr in (0, half):
                xri = mm(tr, ea_ref[s])
            elif s <= half:
                xri = mm(tr, ea_ref[s]) + mm(t_im[sr], eb_ref[s])
            else:
                xri = mm(tr, ea_ref[s]) - mm(t_im[sr], eb_ref[s])
            sq = xri * xri
            pieces.append(sq[:, :CT_J] + sq[:, CT_J:])
        power = jnp.concatenate(pieces, axis=-1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        alt = (1 - 2 * (iota % 2)).astype(jnp.float32) * nyq_scale
        xnyq = jnp.sum(t_re[0] * alt, -1, keepdims=True)
        if stage == "power":
            folded = (power[:, :LANES] + power[:, LANES:2 * LANES]
                      + power[:, 2 * LANES:3 * LANES]
                      + power[:, 3 * LANES:] + xnyq)
            out_ref[:] = fold_rows(folded)
            return
        mels_e = mm(power, filt_ref[:]) + (xnyq * xnyq) * fnyq_ref[:]
        if stage == "mel":
            out_ref[:] = fold_rows(mels_e)
            return
        logs = safe_log(mels_e)
        if stage == "log":
            out_ref[:] = fold_rows(logs)
            return
        coeffs = mm(logs[:, :n_filt], dct_ref[:])
        out = jnp.concatenate(
            [logs[:, n_filt: n_filt + 1], coeffs[:, 1:n_mfcc]], -1
        )
        out_ref[:] = fold_rows(out)

    mats = [jnp.asarray(m) for m in (e2a, e2b, filt_half, filt_nyq, dct_t)]

    def fn(audio, gain):
        batch = audio.shape[0]
        grid = (batch // batch_tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((batch_tile, n_samples),
                             (lambda i: (0, 0)) if constant_block
                             else (lambda i: (i, 0)),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(m.shape, (lambda i, n=m.ndim: (0,) * n),
                             memory_space=pltpu.VMEM)
                for m in mats
            ],
            out_specs=pl.BlockSpec((batch_tile, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, LANES), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=batch * n_samples,
                bytes_accessed=batch * n_samples * 4 + batch * LANES * 4,
                transcendentals=0,
            ),
        )(_gain_smem(gain), audio, *mats)

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
    batch = int(os.environ.get("OMIT_BATCH", "8192"))
    rng = np.random.default_rng(0)
    audio = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, pr.max_samples)).astype(np.float32)
    ))
    for const in (False, True):
        label = "compute-only (constant block)" if const else "streamed"
        print(f"-- {label} --", flush=True)
        prev_ns = None
        for stage in STAGES:
            r = measure(make_truncated(stage, constant_block=const), audio)
            ns = 1e9 / r
            delta = ("" if prev_ns is None
                     else f"  (+{ns - prev_ns:.1f} ns/win)")
            print(f"{stage:>10}: {r / 1e6:6.3f} M w/s = {ns:6.1f} "
                  f"ns/win{delta}", flush=True)
            prev_ns = ns


if __name__ == "__main__":
    main()
