"""NumPy reference implementation of the DSP feature frontend.

This is the **test oracle** and CPU fallback for the TPU (jnp/Pallas)
frontend.  It re-implements, from the documented algorithm, the exact math of
the reference pipeline:

- the sonopy MFCC algorithm used by `common/data_utils.py:61-70` in
  david8862/tf-keras-speech-commands.  The algorithm is documented inside the
  reference twice: a verbatim framing/power-spec copy in
  `common/bark_feature.py:80-89` and a faithful C++ port in
  `inference/tflite/mfcc.h:295-456`.  Quirks preserved:
  * rectangular window, no pre-emphasis (`mfcc.h` use_preprocess=false path)
  * power = (re^2 + im^2) / n_fft  (`bark_feature.py:85-89`)
  * mel filterbank high edge at **sample_rate**, not Nyquist
    (`inference/tflite/speech_commands.h:305-307`)
  * filterbank bin index = int(freq * (n_fft/2+1) / sample_rate)
    (`mfcc.h:245`)
  * safe_log clamps at float64 eps (`bark_feature.py:75-77`)
  * DCT-II ortho, keep first n_mfcc (`mfcc.h:38-71`)
  * coefficient 0 replaced with safe_log(total frame power)
    (`mfcc.h:358-359`)
- the bark/BFCC alternate frontend (`common/bark_feature.py:92-175`),
  including the reference quirk that ``bark_filterbanks`` maps bark points to
  FFT bins using the *default* nfft=512 / sample_rate=16000 constants
  regardless of the nfft/sample_rate arguments (`bark_feature.py:49-56`
  defaults used by the calls at `bark_feature.py:119,133`).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..params import pr

# Matches np.finfo(float).eps used by the reference safe_log
# (bark_feature.py:75-77).
LOG_EPS = float(np.finfo(np.float64).eps)


def safe_log(x):
    """log with clamp at float64 eps — prevents log(0)/log(<0)."""
    return np.log(np.clip(x, LOG_EPS, None))


# ---------------------------------------------------------------------------
# Framing + power spectrum (sonopy algorithm, bark_feature.py:80-89)
# ---------------------------------------------------------------------------

def chop_array(arr, window_size, hop_size):
    """Full rectangular windows of `arr` at stride `hop_size`.

    chop_array([1,2,3], 2, 1) -> [[1,2], [2,3]]; a trailing partial window
    is discarded (sonopy framing semantics, reference bark_feature.py:80-82).
    Returns a list of views so callers can np.array() or iterate.
    """
    arr = np.asarray(arr)
    n_frames = 1 + (len(arr) - window_size) // hop_size if len(arr) >= window_size else 0
    return [arr[t * hop_size : t * hop_size + window_size] for t in range(n_frames)]


def power_spec(audio: np.ndarray, window_stride, fft_size):
    """Power spectrum of rectangular-window frames.

    Frames `audio` with chop_array, zero-pads each frame to `fft_size`,
    and returns |rfft|^2 / fft_size — the reference normalises by the FFT
    length rather than the window length (bark_feature.py:85-89).
    """
    window_size, hop_size = window_stride
    frames = chop_array(audio, window_size, hop_size)
    if not frames:
        return np.empty((0, fft_size // 2 + 1))
    spectrum = np.fft.rfft(np.stack(frames), n=fft_size)
    return (np.abs(spectrum) ** 2) / fft_size


# ---------------------------------------------------------------------------
# Mel filterbank (sonopy construction; C++ port mfcc.h:230-264)
# ---------------------------------------------------------------------------

def hertz_to_mels(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mels_to_hertz(mel):
    return 700.0 * (np.exp(np.asarray(mel, dtype=np.float64) / 1127.0) - 1.0)


@lru_cache()
def mel_filterbanks(sample_rate: int, num_filt: int, fft_len: int) -> np.ndarray:
    """Triangular mel filterbank, (num_filt, fft_len).

    ``fft_len`` is the number of rfft bins (n_fft//2 + 1).  The grid spans
    mel(0)..mel(sample_rate) — the sonopy quirk of using sample_rate (not
    Nyquist) as the high edge — over num_filt+2 points; each point maps to a
    bin via int(freq * fft_len / sample_rate) (mfcc.h:245).
    """
    grid_mels = np.linspace(
        hertz_to_mels(0.0), hertz_to_mels(float(sample_rate)), num_filt + 2
    )
    grid_hertz = mels_to_hertz(grid_mels)
    grid_indices = (grid_hertz * fft_len / sample_rate).astype(int)

    banks = np.zeros((num_filt, fft_len))
    for i, (left, middle, right) in enumerate(
        zip(grid_indices, grid_indices[1:], grid_indices[2:])
    ):
        left_c, middle_c, right_c = (
            min(left, fft_len),
            min(middle, fft_len),
            min(right, fft_len),
        )
        if middle_c > left_c:
            banks[i, left_c:middle_c] = (
                np.arange(left_c, middle_c) - left
            ) / float(middle - left)
        if right_c > middle_c:
            banks[i, middle_c:right_c] = (right - np.arange(middle_c, right_c)) / float(
                right - middle
            )
    return banks


# ---------------------------------------------------------------------------
# DCT-II (ortho) as an explicit matrix (mfcc.h:38-71 equivalent)
# ---------------------------------------------------------------------------

@lru_cache()
def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix D with y = D @ x  (scipy.fftpack.dct norm='ortho')."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] *= np.sqrt(0.5)
    return d


def dct_ortho(x: np.ndarray) -> np.ndarray:
    """DCT-II with ortho norm along the last axis."""
    return x @ dct_matrix(x.shape[-1]).T


# ---------------------------------------------------------------------------
# MFCC pipeline (sonopy mfcc_spec equivalent)
# ---------------------------------------------------------------------------

def mel_spec(audio, sample_rate, window_stride=(160, 80), fft_size=512, num_filt=20):
    """Log-mel spectrogram; returns (mels, powers)."""
    powers = power_spec(audio, window_stride, fft_size)
    if powers.size == 0:
        return np.empty((0, num_filt)), powers
    filters = mel_filterbanks(sample_rate, num_filt, powers.shape[1])
    mels = safe_log(powers @ filters.T)
    return mels, powers


def mfcc_spec(
    audio,
    sample_rate,
    window_stride=(160, 80),
    fft_size=512,
    num_filt=20,
    num_coeffs=13,
):
    """MFCC features, (n_frames, num_coeffs); coeff 0 <- log total frame power."""
    mels, powers = mel_spec(audio, sample_rate, window_stride, fft_size, num_filt)
    if len(mels) == 0:
        return np.empty((0, min(num_filt, num_coeffs)))
    mfccs = dct_ortho(mels)[:, :num_coeffs]
    mfccs[:, 0] = safe_log(np.sum(powers, 1))  # replace first band with log energy
    return mfccs


# ---------------------------------------------------------------------------
# Bark / BFCC alternate frontend (bark_feature.py:16-175)
# ---------------------------------------------------------------------------

# The reference's fft<->bark helpers default to these constants, and
# bark_filterbanks calls them with defaults — so bin mapping always uses
# nfft=512 / sample_rate=16000 regardless of the passed arguments
# (bark_feature.py:37-56 defaults; call sites bark_feature.py:119,133).
_BARK_DEFAULT_SR = 16000
_BARK_DEFAULT_NFFT = 512


def hz2bark(f):
    """Hz -> bark (Wang, Sekey & Gersho, 1992)."""
    return 6.0 * np.arcsinh(np.asarray(f, dtype=np.float64) / 600.0)


def bark2hz(fb):
    return 600.0 * np.sinh(np.asarray(fb, dtype=np.float64) / 6.0)


def fft2bark(j, sample_rate=_BARK_DEFAULT_SR, nfft=_BARK_DEFAULT_NFFT):
    return hz2bark((np.asarray(j, dtype=np.float64) * sample_rate) / (nfft + 1))


def bark2fft(fb, sample_rate=_BARK_DEFAULT_SR, nfft=_BARK_DEFAULT_NFFT):
    return (nfft + 1) * bark2hz(fb) / sample_rate


def _bark_filter_gain(fb, fc):
    """Trapezoid-ish bark filter magnitude Fm (bark_feature.py:59-72)."""
    if fc - 2.5 <= fb <= fc - 0.5:
        return 10 ** (2.5 * (fb - fc + 0.5))
    elif fc - 0.5 < fb < fc + 0.5:
        return 1.0
    elif fc + 0.5 <= fb <= fc + 1.3:
        return 10 ** (-2.5 * (fb - fc - 0.5))
    return 0.0


@lru_cache()
def bark_filterbanks(
    nfilts=20, nfft=512, sample_rate=16000, low_freq=0, high_freq=None
):
    """Bark filterbank, (nfilts, nfft//2+1), 'constant' scale.

    NOTE (reference quirk, preserved): bark->bin mapping inside the loop uses
    the *default* nfft=512 / sample_rate=16000 constants, not the arguments —
    exactly as `bark_feature.py:92-136` behaves.
    """
    high_freq = high_freq or sample_rate / 2
    low_bark = hz2bark(low_freq)
    high_bark = hz2bark(high_freq)
    bark_points = np.linspace(low_bark, high_bark, nfilts + 4)

    bins = np.floor(bark2fft(bark_points))  # default-constant mapping (quirk)
    fbank = np.zeros((nfilts, nfft // 2 + 1))

    for i in range(nfilts):
        fc = bark_points[i + 2]
        for j in range(int(bins[i]), int(bins[i + 4])):
            if j >= fbank.shape[1]:
                break
            fb = fft2bark(j)  # default-constant mapping (quirk)
            fbank[i, j] = _bark_filter_gain(float(fb), float(fc))
    return np.abs(fbank)


def bark_spec(audio, sample_rate, window_size, hop_size, fft_size=512, num_filt=24):
    """Log bark spectrogram (bark_feature.py:139-153)."""
    powers = power_spec(audio, (window_size, hop_size), fft_size)
    filterbanks = bark_filterbanks(
        nfilts=num_filt, nfft=fft_size, sample_rate=sample_rate
    )
    return safe_log(powers @ filterbanks.T)


def bfcc_spec(
    audio, sample_rate, window_size, hop_size, fft_size=512, num_filt=26, num_coeffs=13
):
    """BFCC features (bark_feature.py:156-175); coeff 0 <- log total power."""
    powers = power_spec(audio, (window_size, hop_size), fft_size)
    if powers.size == 0:
        return np.empty((0, min(num_filt, num_coeffs)))
    filterbanks = bark_filterbanks(
        nfilts=num_filt, nfft=fft_size, sample_rate=sample_rate
    )
    barks = safe_log(powers @ filterbanks.T)
    bfccs = dct_ortho(barks)[:, :num_coeffs]
    bfccs[:, 0] = safe_log(np.sum(powers, 1))
    return bfccs


# ---------------------------------------------------------------------------
# High-level helpers matching common/data_utils.py
# ---------------------------------------------------------------------------

def add_deltas(features: np.ndarray) -> np.ndarray:
    """Backward-difference deltas concatenated on the last axis
    (data_utils.py:50-58): deltas[i] = f[i] - f[i-1], deltas[0] = 0."""
    deltas = np.zeros_like(features)
    deltas[1:] = features[1:] - features[:-1]
    return np.concatenate([features, deltas], -1)


def vectorize_raw(audio: np.ndarray, params=None, frontend: str = "mfcc") -> np.ndarray:
    """Audio -> feature vectors, no length clipping (data_utils.py:61-70)."""
    p = params or pr
    if len(audio) == 0:
        raise ValueError("Cannot vectorize empty audio!")
    if frontend == "mfcc":
        return mfcc_spec(
            audio,
            p.sample_rate,
            (p.window_samples, p.hop_samples),
            fft_size=p.n_fft,
            num_filt=p.n_filt,
            num_coeffs=p.n_mfcc,
        )
    elif frontend == "bark":
        return bfcc_spec(
            audio,
            p.sample_rate,
            p.window_samples,
            p.hop_samples,
            fft_size=p.n_fft,
            num_filt=p.n_filt,
            num_coeffs=p.n_mfcc,
        )
    raise ValueError(f"unknown frontend: {frontend}")


def audio_to_feature(audio_data: np.ndarray, params=None, frontend: str = "mfcc"):
    """Truncate to max_samples, left-pad with zeros, vectorize (+deltas)
    (data_utils.py:73-86)."""
    p = params or pr
    audio_data = audio_data[: p.max_samples]
    if len(audio_data) < p.max_samples:
        audio_data = np.concatenate(
            [np.zeros((p.max_samples - len(audio_data),)), audio_data]
        )
    feature = vectorize_raw(audio_data, p, frontend)
    if p.use_delta:
        feature = add_deltas(feature)
    return feature
