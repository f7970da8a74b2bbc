#!/usr/bin/env python3
"""CT-frontend layout experiments (round 3): the kernel is COMPUTE-bound.

r3_experiments.py re-derived the audio load floor: a load-only kernel
reads ~585 GB/s (not the ~315 GB/s recorded in round 2), so the frontend
at ~5.17M windows/s (331 GB/s) has up to ~1.8x compute headroom.  This
script A/Bs layout variants of the production CT kernel
(ops/pallas_frontend._make_ct_frontend):

  framing = 'concat'  — production: 4 cell streams built from 31 slice
                        concats each, frame-major rows, output transposed
  framing = 'reshape' — batch-major rows: ONE reshape of the audio block
                        to (TB, T+1, n2/2, 128); each DFT plane is a
                        strided sublane slice; no concats, and the output
                        reshape needs NO transpose

  mel = 'concat'      — production: per-residue 64-lane fold + 8-piece
                        concat + one (M,512)@(512,w) matmul
  mel = 'dup'         — fold/concat-free: per-residue (M,128)@(128,w)
                        accumulate against duplicated-row filters
                        (row j and j+64 both carry bin k=n2*j+s); 2x the
                        mel MACs, zero VPU fold/copy traffic

Run on TPU: prints windows/s for each combo + max|delta| vs production.
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
    make_fused_frontend,
)
from tpu_speech_commands.frontend.dsp import safe_log
from tpu_speech_commands.params import pr
from tpu_speech_commands.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()


def make_variant(framing: str, mel: str, batch_tile: int = 16,
                 interpret: bool = False):
    p = pr
    feature_type = "mfcc"
    ct_cos, ct_sin, e2a, e2b, filt_half, filt_nyq, dct_t = _ct_matrices(
        _params_key(p), feature_type
    )
    n2 = p.n_fft // LANES
    half = n2 // 2
    window, hop = p.window_samples, p.hop_samples
    n_samples = p.max_samples
    n_frames = 1 + (n_samples - window) // hop
    n_mfcc, n_filt = p.n_mfcc, p.n_filt
    width = filt_half.shape[1]
    nyq_scale = np.float32(1.0 / np.sqrt(p.n_fft))
    assert 2 * hop == p.n_fft and (n_frames + 1) * hop <= n_samples
    assert hop % LANES == 0
    blocks_per_hop = hop // LANES  # == half

    if mel == "dup":
        # (n2, 128, width): rows j and j+64 both carry bin k = n2*j + s
        filt_dup = np.zeros((n2, LANES, width), np.float32)
        for s in range(n2):
            rows = filt_half[s * CT_J : (s + 1) * CT_J]
            filt_dup[s, :CT_J] = rows
            filt_dup[s, CT_J:] = rows
        mel_mats = [jnp.asarray(filt_dup)]
    else:
        mel_mats = [jnp.asarray(filt_half)]

    def kernel(gain_ref, audio_ref, ea_ref, eb_ref, filt_ref, fnyq_ref,
               dct_ref, out_ref):
        audio = _decode_audio(audio_ref, gain_ref)  # (TB, S)
        if framing == "reshape":
            # batch-major rows m = b*T + t: one reshape, strided sublane
            # slices per plane, NO output transpose
            x4 = audio[:, : (n_frames + 1) * hop].reshape(
                batch_tile, n_frames + 1, blocks_per_hop, LANES
            )
            planes = [
                x4[:, :n_frames, c, :].reshape(batch_tile * n_frames, LANES)
                for c in range(half)
            ] + [
                x4[:, 1:, c, :].reshape(batch_tile * n_frames, LANES)
                for c in range(half)
            ]
        else:
            cells = [
                jnp.concatenate(
                    [
                        audio[:, t * hop + c * LANES : t * hop + (c + 1) * LANES]
                        for t in range(n_frames + 1)
                    ]
                )
                for c in range(half)
            ]
            m_rows_ = n_frames * batch_tile
            planes = [cells[a][:m_rows_] for a in range(half)] + [
                cells[a][batch_tile : m_rows_ + batch_tile]
                for a in range(half)
            ]
        t_re, t_im = _dft8_real(planes, jnp.float32)

        def mm(x, e):
            return jnp.dot(x, e, preferred_element_type=jnp.float32)

        xris = []
        for s in range(n2):
            sr = s if s <= half else n2 - s
            tr = t_re[sr]
            if sr in (0, half):
                xri = mm(tr, ea_ref[s])
            elif s <= half:
                xri = mm(tr, ea_ref[s]) + mm(t_im[sr], eb_ref[s])
            else:
                xri = mm(tr, ea_ref[s]) - mm(t_im[sr], eb_ref[s])
            xris.append(xri)

        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        alt = (1 - 2 * (iota % 2)).astype(jnp.float32) * nyq_scale
        xnyq = jnp.sum(t_re[0] * alt, -1, keepdims=True)

        if mel == "dup":
            acc = (xnyq * xnyq) * fnyq_ref[:]
            for s in range(n2):
                sq = xris[s] * xris[s]
                acc = acc + mm(sq, filt_ref[s])
            mels_e = acc
        else:
            pieces = [
                (xris[s] * xris[s])[:, :CT_J] + (xris[s] * xris[s])[:, CT_J:]
                for s in range(n2)
            ]
            power = jnp.concatenate(pieces, axis=-1)
            mels_e = mm(power, filt_ref[:]) + (xnyq * xnyq) * fnyq_ref[:]
        logs = safe_log(mels_e)
        coeffs = mm(logs[:, :n_filt], dct_ref[:])
        out = jnp.concatenate(
            [logs[:, n_filt : n_filt + 1], coeffs[:, 1:n_mfcc]], -1
        )
        if framing == "reshape":
            out_ref[:] = out.reshape(batch_tile, n_frames, n_mfcc)
        else:
            out_ref[:] = (
                out.reshape(n_frames, batch_tile, n_mfcc).transpose(1, 0, 2)
            )

    mats = [jnp.asarray(e2a), jnp.asarray(e2b), mel_mats[0],
            jnp.asarray(filt_nyq), jnp.asarray(dct_t)]

    def frontend(audio, gain=None):
        batch = audio.shape[0]
        gain = _gain_smem(gain)
        grid = (batch // batch_tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((batch_tile, n_samples), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec(m.shape, (lambda i, n=m.ndim: (0,) * n),
                             memory_space=pltpu.VMEM)
                for m in mats
            ],
            out_specs=pl.BlockSpec(
                (batch_tile, n_frames, n_mfcc), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, n_frames, n_mfcc),
                                           jnp.float32),
            interpret=interpret,
        )(gain, audio, *mats)

    return frontend


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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--check_only", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    small = jax.device_put(jnp.asarray(
        rng.standard_normal((64, pr.max_samples)).astype(np.float32)))
    prod = make_fused_frontend(pr, batch_tile=16)
    ref = np.asarray(prod(small))

    combos = [("concat", "concat"), ("reshape", "concat"),
              ("concat", "dup"), ("reshape", "dup")]
    variants = {}
    for fr, me in combos:
        v = make_variant(fr, me)
        out = np.asarray(v(small))
        d = np.max(np.abs(out - ref))
        print(f"framing={fr} mel={me}: max|delta| vs production = {d:.2e}",
              flush=True)
        # mel='dup' reorders the f32 mel sum (8 partial matmuls vs one
        # K=512 matmul): on white noise both sit ~1.8e-2 from the float64
        # oracle (measured), so allow reorder-level deltas here; framing
        # variants with mel='concat' are bit-exact.
        assert d < 5e-2, (fr, me, d)
        variants[(fr, me)] = v
    if args.check_only:
        return

    audio = jax.device_put(jnp.asarray(
        rng.standard_normal((args.batch, pr.max_samples)).astype(np.float32)))
    r = measure(lambda a, g: prod(a, g), audio)
    print(f"production frontend: {r/1e6:.3f} M windows/s", flush=True)
    for (fr, me), v in variants.items():
        r = measure(v, audio)
        print(f"framing={fr} mel={me}: {r/1e6:.3f} M windows/s", flush=True)


if __name__ == "__main__":
    main()
