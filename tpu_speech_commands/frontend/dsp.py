"""TPU-native (jnp/XLA) batched DSP feature frontend.

Replaces the reference's per-sample CPU hot loop
(`classifier/data.py:30-46` -> `common/data_utils.py:61-86` -> sonopy) with a
batched, jit-compiled chain of MXU-friendly GEMMs:

    frames  = gather(audio)                  # (B*T, W) rectangular window
    re, im  = frames @ C, frames @ S         # real DFT as two matmuls
    power   = (re^2 + im^2) / n_fft          # VPU elementwise
    mels    = safe_log(power @ M^T)          # mel/bark filterbank matmul
    coeffs  = mels @ D^T [, :n_mfcc]         # DCT-II ortho matmul
    coeffs[..., 0] = safe_log(sum(power))    # energy-coefficient swap

The DFT-as-GEMM formulation (vs an FFT) maps the entire frontend onto the
MXU with no scalar loops or dynamic shapes, and XLA fuses the elementwise
stages into the matmuls.  For the default config the per-window cost is
2*1024*513*2 ≈ 2.1 MFLOP — trivially small for a TPU core, so the frontend
is HBM-bound and the GEMM form is the right trade (cf. PAPERS.md MelT).

Numerics match the NumPy oracle (`numpy_ref.py`, itself validated against the
documented sonopy algorithm / `inference/tflite/mfcc.h`) to float32 accuracy;
matmuls run at Precision.HIGHEST so TPU results stay within ~1e-4 of the
float64 reference after the log compression.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..params import ListenerParams, pr
from . import numpy_ref

LOG_EPS = numpy_ref.LOG_EPS

_PRECISION = jax.lax.Precision.HIGHEST


def safe_log(x: jax.Array) -> jax.Array:
    return jnp.log(jnp.clip(x, LOG_EPS, None))


# ---------------------------------------------------------------------------
# Constant matrices (computed in float64 NumPy, stored as float32)
# ---------------------------------------------------------------------------

@functools.lru_cache()
def dft_matrices(window_samples: int, n_fft: int):
    """Real/imag DFT matrices (W, n_fft//2+1), float32.

    Equivalent to np.fft.rfft(frame, n=n_fft): frames longer than n_fft are
    truncated, shorter ones zero-padded (zero rows contribute nothing).
    """
    n_bins = n_fft // 2 + 1
    n_used = min(window_samples, n_fft)
    n = np.arange(n_used, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    cos = np.zeros((window_samples, n_bins))
    sin = np.zeros((window_samples, n_bins))
    cos[:n_used] = np.cos(angle)
    sin[:n_used] = np.sin(angle)
    return cos.astype(np.float32), sin.astype(np.float32)


@functools.lru_cache()
def mel_matrix(sample_rate: int, num_filt: int, fft_len: int) -> np.ndarray:
    """(fft_len, num_filt) float32 — transposed sonopy mel filterbank."""
    return numpy_ref.mel_filterbanks(sample_rate, num_filt, fft_len).T.astype(
        np.float32
    )


@functools.lru_cache()
def bark_matrix(sample_rate: int, num_filt: int, n_fft: int) -> np.ndarray:
    """(fft_len, num_filt) float32 — transposed reference bark filterbank."""
    return numpy_ref.bark_filterbanks(
        nfilts=num_filt, nfft=n_fft, sample_rate=sample_rate
    ).T.astype(np.float32)


@functools.lru_cache()
def dct_t_matrix(n: int) -> np.ndarray:
    """(n, n) float32 — transposed orthonormal DCT-II matrix."""
    return numpy_ref.dct_matrix(n).T.astype(np.float32)


# ---------------------------------------------------------------------------
# Batched frontend
# ---------------------------------------------------------------------------

def frame_signal(audio: jax.Array, window_samples: int, hop_samples: int) -> jax.Array:
    """(..., S) -> (..., T, W) rectangular-window framing, full windows only.

    Matches sonopy's chop_array (`bark_feature.py:80-82`): frame t covers
    samples [t*hop, t*hop + window).
    """
    n_samples = audio.shape[-1]
    n_frames = 1 + (n_samples - window_samples) // hop_samples
    idx = (
        hop_samples * np.arange(n_frames)[:, None]
        + np.arange(window_samples)[None, :]
    )
    return audio[..., idx]


class Frontend:
    """Batched feature frontend bound to a ListenerParams config.

    feature_type: 'mfcc' (sonopy path) or 'bark' (BFCC path,
    `bark_feature.py:156-175`).

    Callable on a batch of fixed-length audio (B, max_samples) float32 in
    [-1, 1]; returns (B, n_features, feature_size) float32.  Pure function of
    its inputs — safe under jit/vmap/shard_map with the batch axis sharded.
    """

    def __init__(self, params: ListenerParams | None = None, feature_type: str = "mfcc"):
        # SNAPSHOT the config: the DFT/filterbank/DCT matrices below are
        # built from it once, so holding a live alias to the mutable
        # global `pr` would let a later inject_params silently mix new
        # scalar config (n_fft normalization, framing) with old matrices
        p = (params or pr).replace()
        self.params = p
        self.feature_type = feature_type
        if feature_type == "mfcc":
            filt = mel_matrix(p.sample_rate, p.n_filt, p.n_fft_bins)
        elif feature_type == "bark":
            filt = bark_matrix(p.sample_rate, p.n_filt, p.n_fft)
        else:
            raise ValueError(f"unknown feature_type: {feature_type}")
        cos, sin = dft_matrices(p.window_samples, p.n_fft)
        self._cos = jnp.asarray(cos)
        self._sin = jnp.asarray(sin)
        self._filt = jnp.asarray(filt)
        self._dct_t = jnp.asarray(dct_t_matrix(p.n_filt))
        # output frame count == the model contract (__call__ tail-trims
        # max_samples framing to it); a config where max_samples framing
        # yields FEWER frames than the contract cannot be satisfied
        frames_from_max = (
            1 + (p.max_samples - p.window_samples) // p.hop_samples
            if p.max_samples >= p.window_samples else 0
        )
        if frames_from_max < p.n_features:
            raise ValueError(
                f"config yields {frames_from_max} frames from max_samples "
                f"but the model contract needs n_features={p.n_features}"
            )
        self.n_frames = p.n_features

    def power_from_frames(self, frames: jax.Array) -> jax.Array:
        """(..., W) frames -> (..., n_fft//2+1) power spectrum."""
        re = jnp.matmul(frames, self._cos, precision=_PRECISION)
        im = jnp.matmul(frames, self._sin, precision=_PRECISION)
        return (re * re + im * im) / self.params.n_fft

    def power_spec(self, audio: jax.Array) -> jax.Array:
        """(..., S) -> (..., T, n_fft//2+1) power spectrogram."""
        p = self.params
        frames = frame_signal(audio, p.window_samples, p.hop_samples)
        return self.power_from_frames(frames)

    def features_from_frames(self, frames: jax.Array) -> jax.Array:
        """(..., W) frames -> (..., n_mfcc) cepstral features (no deltas)."""
        p = self.params
        powers = self.power_from_frames(frames)
        mels = safe_log(jnp.matmul(powers, self._filt, precision=_PRECISION))
        coeffs = jnp.matmul(mels, self._dct_t, precision=_PRECISION)[..., : p.n_mfcc]
        energy = safe_log(jnp.sum(powers, axis=-1, keepdims=True))
        return jnp.concatenate([energy, coeffs[..., 1:]], axis=-1)

    def __call__(self, audio: jax.Array) -> jax.Array:
        """(..., S) audio -> (..., T, feature_size) features.

        Accepts float32 in [-1, 1] or raw int16 PCM (decoded as x/32768,
        the buffer_to_audio convention — deployment feeds PCM16 directly,
        halving host->device/HBM bytes)."""
        p = self.params
        # ValueError, not a downstream shape surprise: too-short audio
        # would frame into FEWER than n_features rows (the tail slice
        # below silently returns them all), surfacing as an opaque
        # mismatch inside the jitted model apply far from the cause
        need = p.window_samples + (p.n_features - 1) * p.hop_samples
        if audio.shape[-1] < need:
            raise ValueError(
                f"audio length {audio.shape[-1]} yields fewer than "
                f"n_features={p.n_features} frames (need >= {need} "
                "samples); pad_audio to max_samples first"
            )
        if audio.dtype == jnp.int16:
            audio = audio.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        frames = frame_signal(audio, p.window_samples, p.hop_samples)
        feats = self.features_from_frames(frames)
        # the model/streaming/native contract is n_features rows (derived
        # from buffer_samples); max_samples framing can yield one extra
        # frame for some hop/window roundings — keep the tail-aligned rows
        # (command sits at the buffer tail, pad_audio semantics).  The
        # reference errors on such configs (fixed Keras Input shape vs
        # audio_to_feature's max_samples framing, data_utils.py:61-86).
        feats = feats[..., -p.n_features :, :]
        if p.use_delta:
            feats = add_deltas(feats)
        return feats

    def pad_audio(self, audio: jax.Array) -> jax.Array:
        """Truncate/left-zero-pad trailing axis to max_samples
        (data_utils.py:73-86 semantics: command sits at the buffer tail)."""
        p = self.params
        n = audio.shape[-1]
        if n >= p.max_samples:
            return audio[..., : p.max_samples]
        pad = [(0, 0)] * (audio.ndim - 1) + [(p.max_samples - n, 0)]
        return jnp.pad(audio, pad)


def add_deltas(features: jax.Array) -> jax.Array:
    """Backward-difference deltas on axis -2 (time), concatenated on axis -1
    (data_utils.py:50-58)."""
    diff = features[..., 1:, :] - features[..., :-1, :]
    zeros = jnp.zeros_like(features[..., :1, :])
    deltas = jnp.concatenate([zeros, diff], axis=-2)
    return jnp.concatenate([features, deltas], axis=-1)
