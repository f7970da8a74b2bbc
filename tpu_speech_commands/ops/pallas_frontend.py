"""Fused Pallas TPU kernel for the MFCC/bark feature frontend.

One kernel per batch tile fuses the whole chain in VMEM:

    framing (static slices — never materialised in HBM)
    -> DFT as two MXU matmuls (frames @ cos, frames @ sin)
    -> power (VPU)  -> filterbank matmul (MXU) -> safe_log (VPU)
    -> DCT matmul (MXU) -> energy-coefficient substitution

vs the XLA path (frontend/dsp.py), this avoids writing the framed copy of
the audio ((T*W)/S ≈ 2x the input bytes for the default 50%-overlap config)
and every intermediate (power spectrum is 2x the frame bytes again) to HBM
— the frontend is bandwidth-bound, so fusing is the whole game.

DFT/filter matrices are zero-padded to lane multiples (513 -> 576 bins);
padded bins carry zero power so mel sums and the total-energy term are
unchanged.  Numerics match frontend/dsp.py to float32 accuracy (verified
in tests/test_pallas_frontend.py via interpret mode on CPU and on TPU by
bench parity).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..frontend import numpy_ref
from ..frontend.dsp import (
    bark_matrix,
    dct_t_matrix,
    dft_matrices,
    mel_matrix,
    safe_log,
)
from ..params import ListenerParams, pr

LOG_EPS = numpy_ref.LOG_EPS


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache()
def _padded_matrices(params_key, feature_type: str):
    """(cos, sin, filt, dct_t) with the bin axis padded to a lane multiple."""
    p = ListenerParams(*params_key)
    cos, sin = dft_matrices(p.window_samples, p.n_fft)
    if feature_type == "mfcc":
        filt = mel_matrix(p.sample_rate, p.n_filt, p.n_fft_bins)
    elif feature_type == "bark":
        filt = bark_matrix(p.sample_rate, p.n_filt, p.n_fft)
    else:
        raise ValueError(f"unknown feature_type: {feature_type}")
    n_bins = cos.shape[1]
    padded = _round_up(n_bins, 128)
    cos_p = np.zeros((cos.shape[0], padded), np.float32)
    sin_p = np.zeros((sin.shape[0], padded), np.float32)
    filt_p = np.zeros((padded, filt.shape[1]), np.float32)
    cos_p[:, :n_bins] = cos
    sin_p[:, :n_bins] = sin
    filt_p[:n_bins] = filt
    dct_t = dct_t_matrix(p.n_filt)
    return cos_p, sin_p, filt_p, dct_t


def _params_key(p: ListenerParams):
    return (
        p.buffer_t, p.window_t, p.hop_t, p.sample_rate, p.sample_depth,
        p.n_fft, p.n_filt, p.n_mfcc, p.use_delta, p.threshold_config,
        p.threshold_center,
    )


LANES = 128


def _ct_eligible(p: ListenerParams) -> bool:
    """The Cooley-Tukey GEMM-DFT needs n_fft = n2*128 with n2 even (the
    stage-1 butterfly treats the T[n2/2] residue row as purely real, which
    only holds for even n2, and the 50%-overlap cell streams cover n2
    planes in half+half pairs) and a window that fills the transform
    exactly (no zero-padding tail)."""
    n2 = p.n_fft // LANES
    return (
        p.n_fft % LANES == 0
        and n2 >= 2
        and n2 % 2 == 0
        and p.window_samples == p.n_fft
    )


CT_J = LANES // 2  # stage-2 columns per residue: k = n2*j + s, j < 64


@functools.lru_cache()
def _ct_matrices(params_key, feature_type: str):
    """Constants for the two-stage Cooley-Tukey GEMM DFT (docs/DESIGN.md §2).

    Decimation n = 128*a + b (a < n2 = n_fft/128, b < 128) — a free
    lane-aligned split, no transpose anywhere:

        T[s, b]      = sum_a frame[128a+b] * W_n2^{s a}      (VPU stage)
        X[n2*j + s]  = sum_b T[s, b] * W_nfft^{(n2 j + s) b} (MXU stage)

    Only the physical half-spectrum is computed: per residue s the j < 64
    columns cover bins k = n2*j + s <= n_fft/2 - 1 (mirror bins are
    redundant for power), so real and imaginary parts PACK into one
    128-lane matmul: [Xr | Xi] = T_r @ [Er|Ei] ± T_i @ [-Ei|Er].  The one
    remaining bin — Nyquist, k = n_fft/2 — is real and falls out of T[0]
    as an alternating-sign row sum (X[nyq] = sum_b (-1)^b T[0, b]).

    Returns:
      ct_cos/ct_sin — (n2, n2) stage-1 coefficient tables (host constants,
        baked into the kernel as scalars; zeros/±1 folded away)
      e2a/e2b — (n2, 128, 128) packed stage-2 matrices [Er|Ei] / [-Ei|Er],
        pre-scaled by 1/sqrt(n_fft) so |X|^2 lands power-normalised
      filt_half — (n_fft/2, pad(n_filt+1)) permuted filterbank: row
        s*64 + j holds the weights of physical bin k = n2*j + s, and
        column n_filt is an all-ones energy flag so total energy rides
        the same matmul
      filt_nyq — (1, pad(n_filt+1)) the Nyquist bin's filter row
      dct_t — (n_filt, n_filt) transposed DCT-II
    """
    p = ListenerParams(*params_key)
    n_fft, n_filt = p.n_fft, p.n_filt
    n2 = n_fft // LANES

    ang1 = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    ct_cos = np.cos(ang1)
    ct_sin = -np.sin(ang1)

    scale = np.float64(1.0 / np.sqrt(n_fft))
    b_idx = np.arange(LANES, dtype=np.float64)[:, None]
    e2a = np.zeros((n2, LANES, LANES), np.float32)
    e2b = np.zeros((n2, LANES, LANES), np.float32)
    for s in range(n2):
        k = n2 * np.arange(CT_J, dtype=np.float64)[None, :] + s
        ang2 = 2.0 * np.pi * b_idx * k / n_fft
        er = scale * np.cos(ang2)
        ei = -scale * np.sin(ang2)
        e2a[s, :, :CT_J], e2a[s, :, CT_J:] = er, ei
        e2b[s, :, :CT_J], e2b[s, :, CT_J:] = -ei, er

    if feature_type == "mfcc":
        filt = mel_matrix(p.sample_rate, p.n_filt, p.n_fft_bins)
    elif feature_type == "bark":
        filt = bark_matrix(p.sample_rate, p.n_filt, p.n_fft)
    else:
        raise ValueError(f"unknown feature_type: {feature_type}")
    width = _round_up(n_filt + 1, LANES)
    filt_half = np.zeros((n2 * CT_J, width), np.float32)
    for s in range(n2):
        for j in range(CT_J):
            k = n2 * j + s
            filt_half[s * CT_J + j, :n_filt] = filt[k]
            filt_half[s * CT_J + j, n_filt] = 1.0
    filt_nyq = np.zeros((1, width), np.float32)
    filt_nyq[0, :n_filt] = filt[n_fft // 2]
    filt_nyq[0, n_filt] = 1.0
    dct_t = dct_t_matrix(n_filt)
    return ct_cos, ct_sin, e2a, e2b, filt_half, filt_nyq, dct_t


def _coef_sum(planes, coefs, dtype):
    """sum_a coefs[a]*planes[a] with compile-time zero-skip and ±1 folding."""
    acc = None
    for plane, c in zip(planes, coefs):
        if abs(c) < 1e-12:
            continue
        if abs(c - 1.0) < 1e-12:
            term = plane
        elif abs(c + 1.0) < 1e-12:
            term = -plane
        else:
            term = plane * dtype(c)
        acc = term if acc is None else acc + term
    assert acc is not None
    return acc


def _dft8_real(x, dtype):
    """8-point DFT of real vector planes x[0..7] via radix-2 DIT butterflies.

    Returns (t_re, t_im) dicts for s in [0, 4] / [1, 3] — the conjugate
    half T[8-s] = conj(T[s]) is reconstructed by the caller.  22 vector ops
    (2 multiplies) vs ~70 for the generic coefficient sums.
    """
    # 4-point DFTs of the even- and odd-index samples
    ev_a, ev_s = x[0] + x[4], x[0] - x[4]
    ev_b, ev_t = x[2] + x[6], x[2] - x[6]
    od_a, od_s = x[1] + x[5], x[1] - x[5]
    od_b, od_t = x[3] + x[7], x[3] - x[7]
    ev0, ev2 = ev_a + ev_b, ev_a - ev_b      # Ev[0], Ev[2]
    od0, od2 = od_a + od_b, od_a - od_b      # Od[0], Od[2]
    # Ev[1] = ev_s - i*ev_t ; Od[1] = od_s - i*od_t
    # T[s] = Ev[s%4] + W8^s * Od[s%4]
    # W8^1*Od[1] = κ(1-i)(od_s - i*od_t) = κ(od_s-od_t) - iκ(od_s+od_t)
    # W8^3*Od[3] = κ(-1-i)(od_s + i*od_t) = -κ(od_s-od_t) - iκ(od_s+od_t)
    kappa = dtype(np.sqrt(0.5))
    u = (od_s - od_t) * kappa
    v = (od_s + od_t) * kappa
    t_re = {
        0: ev0 + od0,
        1: ev_s + u,
        2: ev2,
        3: ev_s - u,
        4: ev0 - od0,
    }
    t_im = {
        1: -ev_t - v,
        2: -od2,
        3: ev_t - v,
    }
    return t_re, t_im


def make_fused_frontend(
    params: ListenerParams | None = None,
    feature_type: str = "mfcc",
    batch_tile: int = 8,
    interpret: bool = False,
    fast_math: bool = False,
    dft_mode: str = "auto",
    out_dtype=jnp.float32,
    time_major: bool = False,
    emit_deltas: bool = False,
    power_path: str = "groupmm",
):
    """Build the fused (B, max_samples) -> (B, T, n_mfcc) frontend.

    B must be a multiple of batch_tile.  emit_deltas=True applies the
    backward-difference deltas (use_delta, data_utils.py:50-58 semantics)
    INSIDE the kernel — on the frame-major result the time shift is a
    batch_tile-row shift, so deltas cost one subtract in VMEM and the
    feature width doubles to 2*n_mfcc.  This keeps delta configs on the
    time-major / bf16-handoff fast path (an XLA add_deltas between two
    Pallas kernels would force an f32 (B, T, F) HBM round trip and the
    sublane transpose back to batch-major).  emit_deltas=False leaves
    deltas to the caller (frontend.dsp.add_deltas).

    time_major emits (T, B, n_mfcc) instead — the kernel's internal
    result is already frame-major, so this layout skips the per-tile
    (T, TB, F) sublane transpose entirely (Mosaic lowers narrow-lane
    transposes as per-sublane copies), and the Pallas classifier
    kernels consume frame-major blocks with a plain reshape instead of
    their own inverse transpose.  Use for Pallas->Pallas handoffs
    (serving.make_batch_scorer wires it automatically).

    out_dtype: dtype of the emitted feature tensor.  The kernel computes
    in float32 regardless; bfloat16 output halves the inter-kernel HBM
    round trip when the consumer is a bf16 Pallas classifier (which would
    round the features to bf16 at its first matmul anyway, so the handoff
    loses no precision the classifier was going to keep).

    fast_math runs the DFT stage in bfloat16: the matmuls accumulate in
    float32 (preferred_element_type), but on the 'ct' path the stage-1
    plane sums (butterfly/coefficient adds) are elementwise bf16 ops, so
    CT error is somewhat above the dense path's — measured ~|MFCC| error
    grows from ~1e-4 to ~1e-2 either way (still far below feature
    variance); mel/DCT stay float32.

    dft_mode: 'dense' = one big (W, bins) DFT matmul pair; 'ct' = two-stage
    Cooley-Tukey GEMM DFT (~2.9x fewer MXU cycles, needs n_fft = n2*128 and
    window == n_fft); 'auto' picks 'ct' when eligible.

    power_path ('ct' only): layout of the |X|^2 fold between stage 2 and
    the filterbank — 'groupmm' (default; zero-concat, native-width folds,
    per-group filterbank matmuls, +7.6% over 'concat' in the round-5
    A/B), 'reorder', 'concat' (kept for tools/dev/r5_vpu_shrink.py).
    All three are the same math to float32 accuracy.
    """
    p = params or pr
    if dft_mode == "auto":
        dft_mode = "ct" if _ct_eligible(p) else "dense"
    if dft_mode == "ct":
        if not _ct_eligible(p):
            raise ValueError(
                "dft_mode='ct' needs n_fft an even multiple of 128 (>=256) "
                f"and window_samples == n_fft; got window={p.window_samples} "
                f"n_fft={p.n_fft}"
            )
        return _trim_to_contract(
            _make_ct_frontend(p, feature_type, batch_tile, interpret,
                              fast_math, out_dtype, time_major, emit_deltas,
                              power_path),
            p, time_major,
        )
    cos, sin, filt, dct_t = _padded_matrices(_params_key(p), feature_type)
    window, hop = p.window_samples, p.hop_samples
    n_samples = p.max_samples
    n_frames = 1 + (n_samples - window) // hop
    n_mfcc, n_filt = p.n_mfcc, p.n_filt
    n_feat, n_out = p.n_features, (2 * p.n_mfcc if emit_deltas else p.n_mfcc)
    inv_fft = np.float32(1.0 / p.n_fft)
    dft_dtype = jnp.bfloat16 if fast_math else jnp.float32

    def kernel(gain_ref, audio_ref, cos_ref, sin_ref, filt_ref, dct_ref,
               out_ref):
        audio = _decode_audio(audio_ref, gain_ref)  # (TB, S)
        frames = jnp.concatenate(
            [audio[:, t * hop : t * hop + window] for t in range(n_frames)]
        )  # (T*TB, W) — frame-major blocks, undone at the output reshape
        fr = frames.astype(dft_dtype)
        re = jnp.dot(fr, cos_ref[:].astype(dft_dtype),
                     preferred_element_type=jnp.float32)
        im = jnp.dot(fr, sin_ref[:].astype(dft_dtype),
                     preferred_element_type=jnp.float32)
        power = (re * re + im * im) * inv_fft
        mels = safe_log(
            jnp.dot(power, filt_ref[:], preferred_element_type=jnp.float32)
        )
        coeffs = jnp.dot(mels, dct_ref[:], preferred_element_type=jnp.float32)
        energy = safe_log(jnp.sum(power, -1, keepdims=True))
        out = jnp.concatenate([energy, coeffs[:, 1:n_mfcc]], -1)
        if emit_deltas:
            out = _kernel_deltas(out, batch_tile, n_frames, n_feat)
        _emit_features(out_ref, out, n_frames, batch_tile, n_out,
                       out_dtype, time_major)

    matrices = tuple(jnp.asarray(m) for m in (cos, sin, filt, dct_t))

    def frontend(audio: jax.Array, gain=None) -> jax.Array:
        batch = audio.shape[0]
        if batch % batch_tile != 0:  # not assert: python -O must still fail
            raise ValueError(
                f"batch {batch} not a multiple of batch_tile {batch_tile}"
            )
        gain = _gain_smem(gain)
        grid = (batch // batch_tile,)
        flops_tile = (
            2 * n_frames * batch_tile * window * cos.shape[1] * 2
            + 2 * n_frames * batch_tile * cos.shape[1] * n_filt
            + 2 * n_frames * batch_tile * n_filt * n_filt
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (batch_tile, n_samples), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(cos.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(sin.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(filt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(dct_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=_feature_out_spec(batch_tile, n_frames, n_out,
                                        time_major),
            out_shape=_feature_out_shape(batch, n_frames, n_out, out_dtype,
                                         time_major),
            cost_estimate=pl.CostEstimate(
                flops=flops_tile * grid[0],
                bytes_accessed=audio.size * audio.dtype.itemsize
                + batch * n_frames * n_out * jnp.dtype(out_dtype).itemsize,
                transcendentals=batch * n_frames * (n_filt + 1),
            ),
            interpret=interpret,
        )(gain, audio, *matrices)

    return _trim_to_contract(frontend, p, time_major)


def _kernel_deltas(out, batch_tile, n_frames, n_features):
    """Backward-difference deltas on the frame-major (T*TB, F) result.

    prev[t] = out[t-1] is just a batch_tile-row shift on the frame-major
    layout — one VMEM subtract, no transpose.  The XLA path
    (frontend/dsp.py Frontend.__call__) trims to the tail n_features
    frames BEFORE add_deltas, so the first RETAINED frame's delta is
    zero: reproduce that by zeroing frame t0 = n_frames - n_features
    (rows before t0 are trimmed away by _trim_to_contract)."""
    tb = batch_tile
    prev = jnp.concatenate([out[:tb], out[:-tb]])
    delta = out - prev  # frame 0: out - out = 0
    t0 = n_frames - n_features
    if t0 > 0:
        delta = jnp.concatenate([
            delta[: t0 * tb],
            jnp.zeros_like(delta[:tb]),
            delta[(t0 + 1) * tb :],
        ])
    return jnp.concatenate([out, delta], -1)


def _emit_features(out_ref, out, n_frames, batch_tile, n_mfcc, out_dtype,
                   time_major):
    """Write the kernel's frame-major (T*TB, F) result to the out block.

    time_major keeps the rows as-is — (T, TB, F) is just a reshape;
    batch-major pays one (T, TB, F) -> (TB, T, F) sublane transpose,
    which Mosaic lowers as per-sublane copies on this 13-lane tensor."""
    out3 = out.reshape(n_frames, batch_tile, n_mfcc)
    if not time_major:
        out3 = out3.transpose(1, 0, 2)
    out_ref[:] = out3.astype(out_dtype)


def _feature_out_spec(batch_tile, n_frames, n_mfcc, time_major):
    if time_major:
        return pl.BlockSpec((n_frames, batch_tile, n_mfcc),
                            lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return pl.BlockSpec((batch_tile, n_frames, n_mfcc),
                        lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _feature_out_shape(batch, n_frames, n_mfcc, out_dtype, time_major):
    shape = ((n_frames, batch, n_mfcc) if time_major
             else (batch, n_frames, n_mfcc))
    return jax.ShapeDtypeStruct(shape, out_dtype)


def _trim_to_contract(frontend, p: ListenerParams, time_major=False):
    """Keep the tail-aligned n_features frames (the model/streaming/native
    contract) when max_samples framing yields extra rows for this
    hop/window rounding — mirrors frontend.dsp.Frontend.__call__."""
    n_frames = (
        1 + (p.max_samples - p.window_samples) // p.hop_samples
        if p.max_samples >= p.window_samples else 0
    )
    if n_frames < p.n_features:
        raise ValueError(
            f"config yields {n_frames} frames from max_samples but the "
            f"model contract needs n_features={p.n_features} "
            f"(max_samples={p.max_samples}, window={p.window_samples}, "
            f"hop={p.hop_samples})"
        )
    if n_frames == p.n_features:
        return frontend

    def trimmed(audio: jax.Array, gain=None) -> jax.Array:
        out = frontend(audio, gain)
        return (out[-p.n_features :] if time_major
                else out[:, -p.n_features :, :])

    return trimmed


def _decode_audio(audio_ref, gain_ref):
    """Read the audio block as gained float32.

    Raw int16 PCM inputs are decoded in VMEM as x/32768 (buffer_to_audio
    convention) with the constant folded into the gain scalar — feeding
    PCM16 directly halves the kernel's HBM read traffic.
    """
    audio = audio_ref[:]
    gain = gain_ref[0, 0]
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) * (gain * jnp.float32(1.0 / 32768.0))
    return audio * gain


def _gain_smem(gain) -> jax.Array:
    """Normalise the optional audio pre-gain to a (1,1) f32 SMEM operand.

    The gain exists for two reasons: automatic-gain-control style input
    scaling in serving, and — fed an iteration-dependent value — it makes
    benchmark scan bodies non-loop-invariant so XLA cannot hoist the kernel
    (a fixed input would otherwise be computed once; see bench.py).
    """
    if gain is None:
        return jnp.ones((1, 1), jnp.float32)
    return jnp.asarray(gain, jnp.float32).reshape(1, 1)


def _make_ct_frontend(p: ListenerParams, feature_type: str, batch_tile: int,
                      interpret: bool, fast_math: bool,
                      out_dtype=jnp.float32, time_major: bool = False,
                      emit_deltas: bool = False,
                      power_path: str = "groupmm"):
    """Two-stage Cooley-Tukey GEMM-DFT variant of the fused frontend.

    Replaces the dense (W, bins) DFT matmul pair with:
      stage 1 (VPU): n2-point DFT across the lane-aligned planes
        frame[:, 128a:128a+128] — real input, so only s <= n2/2 needed
        (T[n2-s] = conj(T[s])) and T_i[0] = T_i[n2/2] = 0; n2 = 8 uses a
        radix-2 butterfly (22 vector ops), other sizes generic sums;
      stage 2 (MXU): only the physical half-spectrum, real+imag PACKED
        into one 128-lane matmul per residue: [Xr|Xi] = T_r@[Er|Ei]
        ± T_i@[-Ei|Er], and conjugate residues s / n2-s (which share the
        same T rows) further pair on lanes into (M,128)@(128,256)
        matmuls — 8 matmul issues at n2=8 vs the dense path's
        ~2x(1024 @ 640): ~5.7x fewer MXU cycles.  The Nyquist bin is
        real and comes from T[0] as an alternating-sign row sum.

    The half-spectrum bins land permuted (piece s, column j <-> physical
    bin k = n2*j + s); the permutation is absorbed into the filterbank
    matrix, which also carries an energy-flag column so total energy rides
    the same matmul.  Numerics: identical math to the dense path (same
    rfft), float32 accumulation.
    """
    ct_cos, ct_sin, e2a, e2b, filt_half, filt_nyq, dct_t = _ct_matrices(
        _params_key(p), feature_type
    )
    n2 = p.n_fft // LANES
    half = n2 // 2

    # conjugate-residue pairing: s and n2-s share T rows (T[n2-s] =
    # conj(T[s])), so their packed E matrices concatenate on lanes and
    # each pair costs ONE (M,128)@(128,256) matmul per T component
    # instead of two 128-wide ones — same flops, ~half the MXU issues
    # (bit-exact; measured neutral-to-+1% across sessions — kept for
    # the fewer issues, tools/dev/r3_stage2.py).  Groups:
    # (residue sr, a-columns, b-columns or None, residues covered);
    # all a/b blocks ride in two lane-packed operands with static
    # column offsets.
    #
    # power_path selects the power fold/concat layout (the round-5 VPU
    # shrink A/B, tools/dev/r5_vpu_shrink.py):
    #   'concat'  — production: per-residue 64-lane folds, one 8-piece
    #               power concat, one (M, n_fft/2) filterbank matmul
    #   'reorder' — pair E columns as [Xr_s|Xr_t|Xi_s|Xi_t] so the fold
    #               is ONE native-width add per pair and the power concat
    #               joins 5 wide blocks instead of 8 narrow ones
    #   'groupmm' — reorder + per-group filterbank matmul accumulate:
    #               the power concat disappears entirely (the filterbank
    #               rows are sliced per group instead)
    if power_path not in ("concat", "reorder", "groupmm"):
        raise ValueError(f"unknown power_path: {power_path}")
    if power_path == "concat":
        groups = [(0, e2a[0], None, [0]), (half, e2a[half], None, [half])]
        for s in range(1, half):
            groups.append((
                s,
                np.concatenate([e2a[s], e2a[n2 - s]], axis=1),
                np.concatenate([e2b[s], -e2b[n2 - s]], axis=1),
                [s, n2 - s],
            ))
        filt_rows = filt_half
        row_offsets = None
    else:
        # pairs first (their folds emit native 128-lane blocks), singles
        # last; E columns reordered to [Xr_s|Xr_t|Xi_s|Xi_t] so
        # fold = sq[:, :w/2] + sq[:, w/2:] pairs Xr^2 with Xi^2 per lane
        groups = []
        for s in range(1, half):
            t = n2 - s
            er_s, ei_s = e2a[s, :, :CT_J], e2a[s, :, CT_J:]
            er_t, ei_t = e2a[t, :, :CT_J], e2a[t, :, CT_J:]
            a_mat = np.concatenate([er_s, er_t, ei_s, ei_t], axis=1)
            # X_s = T_r@[Er_s|Ei_s] + T_i@[-Ei_s|Er_s];
            # X_t (conjugate residue) flips the T_i sign
            b_mat = np.concatenate([-ei_s, ei_t, er_s, -er_t], axis=1)
            groups.append((s, a_mat, b_mat, [s, t]))
        groups.append((0, e2a[0], None, [0]))
        groups.append((half, e2a[half], None, [half]))
        # filterbank rows permuted to the fold output order
        filt_rows = np.concatenate([
            np.concatenate([filt_half[s * CT_J:(s + 1) * CT_J]
                            for s in g[3]])
            for g in groups
        ])
        row_offsets = np.cumsum(
            [0] + [len(g[3]) * CT_J for g in groups]).tolist()
    ea_pack = np.concatenate([g[1] for g in groups], axis=1)
    eb_blocks = [g[2] for g in groups if g[2] is not None]
    eb_pack = (np.concatenate(eb_blocks, axis=1) if eb_blocks
               else np.zeros((LANES, LANES), np.float32))
    window, hop = p.window_samples, p.hop_samples
    n_samples = p.max_samples
    n_frames = 1 + (n_samples - window) // hop
    n_mfcc, n_filt = p.n_mfcc, p.n_filt
    n_feat, n_out = p.n_features, (2 * p.n_mfcc if emit_deltas else p.n_mfcc)
    dft_dtype = jnp.bfloat16 if fast_math else jnp.float32

    nyq_scale = np.float32(1.0 / np.sqrt(p.n_fft))

    # 50%-overlap framing (hop == n_fft/2): plane a+n2/2 of frame t IS
    # plane a of frame t+1, so n2/2 overlapping "cell streams" cover all
    # n2 planes with half the copies (the shifted twin is a row slice)
    overlap = 2 * hop == p.n_fft and (n_frames + 1) * hop <= n_samples

    def kernel(gain_ref, audio_ref, ea_ref, eb_ref, filt_ref, fnyq_ref,
               dct_ref, out_ref):
        audio = _decode_audio(audio_ref, gain_ref)  # (TB, S)
        # plane a = lane slice [128a, 128a+128) of every frame, frame-major
        # rows (M = T*TB) — 128-aligned static slices, never a transpose
        if overlap and n2 == 8:
            # wide-cell framing + lane-packed butterfly: the four within-hop
            # segments are CONTIGUOUS in lanes, so ONE (…, 4*128) cell
            # stream covers them (31 slice-concats instead of 124) and the
            # butterfly's first two radix stages run lane-packed (one wide
            # op instead of four narrow).  Association order is identical
            # to _dft8_real → bit-exact (tools/dev/r3_widecell.py, +0.5%).
            wide = jnp.concatenate(
                [audio[:, t * hop : t * hop + half * LANES]
                 for t in range(n_frames + 1)]
            ).astype(dft_dtype)  # ((T+1)*TB, 512) = [x0|x1|x2|x3] per frame
            m_rows_ = n_frames * batch_tile
            p_blk = wide[:m_rows_]                          # [x0|x1|x2|x3]
            q_blk = wide[batch_tile : m_rows_ + batch_tile]  # [x4..x7]
            a_w = p_blk + q_blk   # [ev_a|od_a|ev_b|od_b]
            s_w = p_blk - q_blk   # [ev_s|od_s|ev_t|od_t]
            b1 = a_w[:, : 2 * LANES] + a_w[:, 2 * LANES :]  # [ev0|od0]
            b2 = a_w[:, : 2 * LANES] - a_w[:, 2 * LANES :]  # [ev2|od2]
            ev_s = s_w[:, :LANES]
            od_s = s_w[:, LANES : 2 * LANES]
            ev_t = s_w[:, 2 * LANES : 3 * LANES]
            od_t = s_w[:, 3 * LANES :]
            kappa = dft_dtype(np.sqrt(0.5))
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
        else:
            if overlap:
                cells = [
                    jnp.concatenate(
                        [
                            audio[:, t * hop + c * LANES : t * hop + (c + 1) * LANES]
                            for t in range(n_frames + 1)
                        ]
                    ).astype(dft_dtype)
                    for c in range(half)
                ]  # ((T+1)*TB, 128) each
                m_rows_ = n_frames * batch_tile
                planes = [cells[a][:m_rows_] for a in range(half)] + [
                    cells[a][batch_tile : m_rows_ + batch_tile]
                    for a in range(half)
                ]
            else:
                planes = [
                    jnp.concatenate(
                        [
                            audio[:, t * hop + a * LANES : t * hop + (a + 1) * LANES]
                            for t in range(n_frames)
                        ]
                    ).astype(dft_dtype)
                    for a in range(n2)
                ]
            if n2 == 8:
                t_re, t_im = _dft8_real(planes, dft_dtype)
            else:
                t_re = {
                    s: _coef_sum(planes, ct_cos[s], dft_dtype)
                    for s in range(half + 1)
                }
                t_im = {
                    s: _coef_sum(planes, ct_sin[s], dft_dtype)
                    for s in range(1, half)
                }

        def mm(x, e):
            return jnp.dot(x, e.astype(dft_dtype),
                           preferred_element_type=jnp.float32)

        a_off = b_off = 0
        if power_path == "concat":
            piece_by_s = {}
            for sr, a_mat, b_mat, residues in groups:
                w = a_mat.shape[1]
                xri = mm(t_re[sr], ea_ref[:, a_off:a_off + w])
                a_off += w
                if b_mat is not None:  # pair: [Xr_s|Xi_s|Xr_t|Xi_t]
                    xri = xri + mm(t_im[sr], eb_ref[:, b_off:b_off + w])
                    b_off += w
                sq = xri * xri
                for gi, s in enumerate(residues):
                    part = sq[:, gi * LANES:(gi + 1) * LANES]
                    piece_by_s[s] = part[:, :CT_J] + part[:, CT_J:]  # |X|^2
            power = jnp.concatenate(
                [piece_by_s[s] for s in range(n2)], axis=-1
            )  # (M, n_fft/2) in residue order, matching filt_half's rows
            mel_blocks = [(power, 0, n2 * CT_J)]
        else:
            # reordered pairs emit [Xr_s|Xr_t|Xi_s|Xi_t]: the fold is ONE
            # top-half + bottom-half add per group and its output block is
            # already lane-packed in filt_rows' row order
            blocks = []
            for sr, a_mat, b_mat, residues in groups:
                w = a_mat.shape[1]
                xri = mm(t_re[sr], ea_ref[:, a_off:a_off + w])
                a_off += w
                if b_mat is not None:
                    xri = xri + mm(t_im[sr], eb_ref[:, b_off:b_off + w])
                    b_off += w
                sq = xri * xri
                blocks.append(sq[:, : w // 2] + sq[:, w // 2 :])
            if power_path == "reorder":
                power = jnp.concatenate(blocks, axis=-1)
                mel_blocks = [(power, 0, n2 * CT_J)]
            else:  # groupmm: no power concat at all
                mel_blocks = [
                    (blk, r0, r1) for blk, r0, r1 in
                    zip(blocks, row_offsets[:-1], row_offsets[1:])
                ]

        # Nyquist bin: X[n_fft/2] = sum_b (-1)^b T[0, b]  (real)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        alt = (1 - 2 * (iota % 2)).astype(jnp.float32) * nyq_scale
        xnyq = jnp.sum(t_re[0].astype(jnp.float32) * alt, -1, keepdims=True)

        mels_e = (xnyq * xnyq) * fnyq_ref[:]
        for blk, r0, r1 in mel_blocks:
            mels_e = mels_e + jnp.dot(blk, filt_ref[r0:r1],
                                      preferred_element_type=jnp.float32)
        logs = safe_log(mels_e)
        coeffs = jnp.dot(logs[:, :n_filt], dct_ref[:],
                         preferred_element_type=jnp.float32)
        out = jnp.concatenate(
            [logs[:, n_filt : n_filt + 1], coeffs[:, 1:n_mfcc]], -1
        )
        if emit_deltas:
            out = _kernel_deltas(out, batch_tile, n_frames, n_feat)
        _emit_features(out_ref, out, n_frames, batch_tile, n_out,
                       out_dtype, time_major)

    e2a_mat = jnp.asarray(ea_pack)
    e2b_mat = jnp.asarray(eb_pack)
    filt_mat = jnp.asarray(filt_rows)
    fnyq_mat = jnp.asarray(filt_nyq)
    dct_mat = jnp.asarray(dct_t)

    # MXU work per tile: packed stage-2 matmuls + filterbank + DCT
    n_mm = 2 * 1 + 2 * (n2 - 2)
    m_rows = n_frames * batch_tile

    def frontend(audio: jax.Array, gain=None) -> jax.Array:
        batch = audio.shape[0]
        if batch % batch_tile != 0:  # not assert: python -O must still fail
            raise ValueError(
                f"batch {batch} not a multiple of batch_tile {batch_tile}"
            )
        gain = _gain_smem(gain)
        grid = (batch // batch_tile,)
        flops_tile = (
            2 * m_rows * LANES * LANES * n_mm
            + 2 * m_rows * (p.n_fft // 2) * (n_filt + 1)
            + 2 * m_rows * n_filt * n_filt
            + m_rows * LANES * 4 * n2 * n2  # stage-1 VPU upper bound
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (batch_tile, n_samples), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(ea_pack.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(eb_pack.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(filt_half.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(filt_nyq.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(dct_t.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=_feature_out_spec(batch_tile, n_frames, n_out,
                                        time_major),
            out_shape=_feature_out_shape(batch, n_frames, n_out, out_dtype,
                                         time_major),
            cost_estimate=pl.CostEstimate(
                flops=flops_tile * grid[0],
                bytes_accessed=audio.size * audio.dtype.itemsize
                + batch * n_frames * n_out * jnp.dtype(out_dtype).itemsize,
                transcendentals=batch * n_frames * (n_filt + 1),
            ),
            interpret=interpret,
        )(gain, audio, e2a_mat, e2b_mat, filt_mat, fnyq_mat, dct_mat)

    return frontend
