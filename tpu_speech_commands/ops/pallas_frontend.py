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
from ..frontend.dsp import bark_matrix, dft_matrices, mel_matrix
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
    else:
        filt = bark_matrix(p.sample_rate, p.n_filt, p.n_fft)
    n_bins = cos.shape[1]
    padded = _round_up(n_bins, 128)
    cos_p = np.zeros((cos.shape[0], padded), np.float32)
    sin_p = np.zeros((sin.shape[0], padded), np.float32)
    filt_p = np.zeros((padded, filt.shape[1]), np.float32)
    cos_p[:, :n_bins] = cos
    sin_p[:, :n_bins] = sin
    filt_p[:n_bins] = filt
    dct_t = numpy_ref.dct_matrix(p.n_filt).T.astype(np.float32)
    return cos_p, sin_p, filt_p, dct_t


def _params_key(p: ListenerParams):
    return (
        p.buffer_t, p.window_t, p.hop_t, p.sample_rate, p.sample_depth,
        p.n_fft, p.n_filt, p.n_mfcc, p.use_delta, p.threshold_config,
        p.threshold_center,
    )


def make_fused_frontend(
    params: ListenerParams | None = None,
    feature_type: str = "mfcc",
    batch_tile: int = 8,
    interpret: bool = False,
    fast_math: bool = False,
):
    """Build the fused (B, max_samples) -> (B, T, n_mfcc) frontend.

    B must be a multiple of batch_tile.  Deltas (use_delta) are applied
    outside the kernel by the caller (frontend.dsp.add_deltas).

    fast_math runs the DFT matmuls (the FLOPs-dominant stage) in bfloat16
    with float32 accumulation — ~|MFCC| error grows from ~1e-4 to ~1e-2
    (still far below feature variance); mel/DCT stay float32.
    """
    p = params or pr
    cos, sin, filt, dct_t = _padded_matrices(_params_key(p), feature_type)
    window, hop = p.window_samples, p.hop_samples
    n_samples = p.max_samples
    n_frames = 1 + (n_samples - window) // hop
    n_mfcc, n_filt = p.n_mfcc, p.n_filt
    inv_fft = np.float32(1.0 / p.n_fft)
    dft_dtype = jnp.bfloat16 if fast_math else jnp.float32

    def kernel(audio_ref, cos_ref, sin_ref, filt_ref, dct_ref, out_ref):
        audio = audio_ref[:]  # (TB, S)
        frames = jnp.concatenate(
            [audio[:, t * hop : t * hop + window] for t in range(n_frames)]
        )  # (T*TB, W) — frame-major blocks, undone at the output reshape
        fr = frames.astype(dft_dtype)
        re = jnp.dot(fr, cos_ref[:].astype(dft_dtype),
                     preferred_element_type=jnp.float32)
        im = jnp.dot(fr, sin_ref[:].astype(dft_dtype),
                     preferred_element_type=jnp.float32)
        power = (re * re + im * im) * inv_fft
        mels = jnp.log(
            jnp.clip(
                jnp.dot(power, filt_ref[:], preferred_element_type=jnp.float32),
                LOG_EPS, None,
            )
        )
        coeffs = jnp.dot(mels, dct_ref[:], preferred_element_type=jnp.float32)
        energy = jnp.log(jnp.clip(jnp.sum(power, -1, keepdims=True), LOG_EPS, None))
        out = jnp.concatenate([energy, coeffs[:, 1:n_mfcc]], -1)
        # (T*TB, F) frame-major -> (TB, T, F)
        out_ref[:] = out.reshape(n_frames, batch_tile, n_mfcc).transpose(1, 0, 2)

    matrices = tuple(jnp.asarray(m) for m in (cos, sin, filt, dct_t))

    def frontend(audio: jax.Array) -> jax.Array:
        batch = audio.shape[0]
        assert batch % batch_tile == 0, (
            f"batch {batch} not a multiple of batch_tile {batch_tile}"
        )
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
                pl.BlockSpec(
                    (batch_tile, n_samples), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(cos.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(sin.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(filt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(dct_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (batch_tile, n_frames, n_mfcc), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, n_frames, n_mfcc), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops_tile * grid[0],
                bytes_accessed=audio.size * 4 + batch * n_frames * n_mfcc * 4,
                transcendentals=batch * n_frames * (n_filt + 1),
            ),
            interpret=interpret,
        )(audio, *matrices)

    return frontend
