#!/usr/bin/env python3
"""Wide-cell framing + lane-packed butterfly experiment (dev tool).

The stage-omission profile (tools/dev/r3_omission.py) puts framing at
~21 ns/window and the DFT-8 butterfly at ~48 ns/window — together ~36%
of the kernel's ~190 ns.  Both stages are issue-heavy, not element-heavy:

  production framing: 4 cell streams x 31 slice-concats of (TB, 128);
  production butterfly: 22 vector ops on (M, 128) planes.

With 50% overlap the four within-hop segments are CONTIGUOUS in lanes
(audio[:, t*hop : t*hop+512] == [x0|x1|x2|x3] of frame t), so ONE wide
cell stream covers them: 31 slice-concats of (TB, 512) — a quarter of
the concat operands for the same element traffic.  The butterfly's
first two radix stages then run lane-packed:

  P = wide[:M], Q = wide[TB:M+TB]          # [x0|x1|x2|x3], [x4..x7]
  A = P + Q = [ev_a|od_a|ev_b|od_b]        # 1 op instead of 4
  S = P - Q = [ev_s|od_s|ev_t|od_t]        # 1 op instead of 4
  B1 = A[:,:256]+A[:,256:] = [ev0|od0]     # 1 op instead of 2
  B2 = A[:,:256]-A[:,256:] = [ev2|od2]     # 1 op instead of 2

then the final combinations proceed on 128-aligned lane slices exactly
as _dft8_real — identical association order, so the variant is
bit-exact vs production.  ~14 stage-1 ops instead of 22 and ~31 concat
operands instead of 124.

RESULT (TPU v5e, same-session A/B, batch 8192, tile 16, time-major):
see docs/ROADMAP.md — run this file to reproduce.
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

from tpu_speech_commands.frontend.dsp import safe_log
from tpu_speech_commands.ops.pallas_frontend import (
    CT_J,
    LANES,
    _ct_matrices,
    _decode_audio,
    _emit_features,
    _gain_smem,
    _params_key,
    make_fused_frontend,
)
from tpu_speech_commands.params import pr
from tpu_speech_commands.utils.compilation_cache import enable_compilation_cache

enable_compilation_cache()


def make_widecell(batch_tile: int = 16, time_major: bool = True):
    p = pr
    ct_cos, ct_sin, e2a, e2b, filt_half, filt_nyq, dct_t = _ct_matrices(
        _params_key(p), "mfcc"
    )
    n2 = p.n_fft // LANES
    half = n2 // 2
    assert n2 == 8
    window, hop = p.window_samples, p.hop_samples
    n_samples = p.max_samples
    n_frames = 1 + (n_samples - window) // hop
    n_mfcc, n_filt = p.n_mfcc, p.n_filt
    assert 2 * hop == p.n_fft and (n_frames + 1) * hop <= n_samples
    nyq_scale = np.float32(1.0 / np.sqrt(p.n_fft))
    kappa = np.float32(np.sqrt(0.5))

    # conjugate-residue pairing, as production
    groups = [(0, e2a[0], None, [0]), (half, e2a[half], None, [half])]
    for s in range(1, half):
        groups.append((
            s,
            np.concatenate([e2a[s], e2a[n2 - s]], axis=1),
            np.concatenate([e2b[s], -e2b[n2 - s]], axis=1),
            [s, n2 - s],
        ))
    ea_pack = np.concatenate([g[1] for g in groups], axis=1)
    eb_pack = np.concatenate([g[2] for g in groups if g[2] is not None],
                             axis=1)

    def kernel(gain_ref, audio_ref, ea_ref, eb_ref, filt_ref, fnyq_ref,
               dct_ref, out_ref):
        audio = _decode_audio(audio_ref, gain_ref)
        wide = jnp.concatenate(
            [audio[:, t * hop: t * hop + half * LANES]
             for t in range(n_frames + 1)]
        )  # ((T+1)*TB, 512): frame t's first four segments, lane-packed
        m_rows_ = n_frames * batch_tile
        p_blk = wide[:m_rows_]                        # [x0|x1|x2|x3]
        q_blk = wide[batch_tile: m_rows_ + batch_tile]  # [x4|x5|x6|x7]
        a_w = p_blk + q_blk   # [ev_a|od_a|ev_b|od_b]
        s_w = p_blk - q_blk   # [ev_s|od_s|ev_t|od_t]
        b1 = a_w[:, : 2 * LANES] + a_w[:, 2 * LANES:]  # [ev0|od0]
        b2 = a_w[:, : 2 * LANES] - a_w[:, 2 * LANES:]  # [ev2|od2]
        ev_s = s_w[:, :LANES]
        od_s = s_w[:, LANES: 2 * LANES]
        ev_t = s_w[:, 2 * LANES: 3 * LANES]
        od_t = s_w[:, 3 * LANES:]
        u = (od_s - od_t) * kappa
        v = (od_s + od_t) * kappa
        t_re = {
            0: b1[:, :LANES] + b1[:, LANES:],
            1: ev_s + u,
            2: b2[:, :LANES],
            3: ev_s - u,
            4: b1[:, :LANES] - b1[:, LANES:],
        }
        t_im = {1: -ev_t - v, 2: -b2[:, LANES:], 3: ev_t - v}

        def mm(x, e):
            return jnp.dot(x, e, preferred_element_type=jnp.float32)

        piece_by_s = {}
        a_off = b_off = 0
        for sr, a_mat, b_mat, residues in groups:
            w = a_mat.shape[1]
            xri = mm(t_re[sr], ea_ref[:, a_off:a_off + w])
            a_off += w
            if b_mat is not None:
                xri = xri + mm(t_im[sr], eb_ref[:, b_off:b_off + w])
                b_off += w
            sq = xri * xri
            for gi, s in enumerate(residues):
                part = sq[:, gi * LANES:(gi + 1) * LANES]
                piece_by_s[s] = part[:, :CT_J] + part[:, CT_J:]
        power = jnp.concatenate(
            [piece_by_s[s] for s in range(n2)], axis=-1
        )
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        alt = (1 - 2 * (iota % 2)).astype(jnp.float32) * nyq_scale
        xnyq = jnp.sum(t_re[0] * alt, -1, keepdims=True)
        mels_e = mm(power, filt_ref[:]) + (xnyq * xnyq) * fnyq_ref[:]
        logs = safe_log(mels_e)
        coeffs = mm(logs[:, :n_filt], dct_ref[:])
        out = jnp.concatenate(
            [logs[:, n_filt: n_filt + 1], coeffs[:, 1:n_mfcc]], -1
        )
        _emit_features(out_ref, out, n_frames, batch_tile, n_mfcc,
                       jnp.float32, time_major)

    mats = [jnp.asarray(m) for m in
            (ea_pack, eb_pack, filt_half, filt_nyq, dct_t)]

    def fn(audio, gain=None):
        batch = audio.shape[0]
        grid = (batch // batch_tile,)
        if time_major:
            out_shape = jax.ShapeDtypeStruct((n_frames, batch, n_mfcc),
                                             jnp.float32)
            out_spec = pl.BlockSpec((n_frames, batch_tile, n_mfcc),
                                    lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)
        else:
            out_shape = jax.ShapeDtypeStruct((batch, n_frames, n_mfcc),
                                             jnp.float32)
            out_spec = pl.BlockSpec((batch_tile, n_frames, n_mfcc),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)
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
            out_specs=out_spec,
            out_shape=out_shape,
        )(_gain_smem(gain), audio, *mats)

    return fn


def measure(fn, audio, k_inner=128, outer=6):
    @jax.jit
    def many(audio):
        def body(carry, i):
            g = 1.0 + 1e-9 * i.astype(jnp.float32)
            out = fn(audio, g)
            return carry + out.sum().astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(k_inner, dtype=jnp.int32))
        return c

    c = many(audio)
    assert np.isfinite(float(c))
    best = 0.0
    for _ in range(outer):
        t0 = time.perf_counter()
        c = many(audio)
        _ = float(c)
        best = max(best, k_inner * audio.shape[0] / (time.perf_counter() - t0))
    return best


def main():
    batch = int(os.environ.get("WC_BATCH", "8192"))
    rng = np.random.default_rng(0)
    audio = jax.device_put(jnp.asarray(
        rng.standard_normal((batch, pr.max_samples)).astype(np.float32)
    ))
    prod = make_fused_frontend(pr, batch_tile=16, time_major=True)
    wide = make_widecell(batch_tile=16, time_major=True)
    small = audio[:64]
    ref = np.asarray(prod(small))
    got = np.asarray(wide(small))
    d = float(np.abs(got - ref).max())
    print(f"widecell parity max|d|={d:.2e}", flush=True)
    assert d == 0.0, "expected bit-exact (same association order)"
    for name, fn in (("prod", prod), ("widecell", wide)):
        r = measure(fn, audio)
        print(f"{name:>9}: {r / 1e6:6.3f} M w/s = {1e9 / r:6.1f} ns/win",
              flush=True)


if __name__ == "__main__":
    main()
