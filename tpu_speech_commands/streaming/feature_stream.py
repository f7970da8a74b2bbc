"""Incremental streaming feature extraction under jit.

Re-formulates the reference ring-buffer update (`listen.py:96-114`) as a
fixed-shape, jit-compatible state transition so the whole
chunk -> features -> logits step compiles into ONE device program:

reference state (ragged)            ->  fixed-shape state here
  audio_buffer (buffer_samples,)        audio   (buffer_samples,) f32
  window_audio (variable length)        fill    int32 — pending-sample
                                        count; the pending samples ARE the
                                        tail of `audio`, so no second buffer.
                                        Scalar for a single stream; carries
                                        the stream axis in batched serving so
                                        streams join/leave independently
  mfccs (n_features, n_mfcc)            feats   (n_features, n_mfcc) f32

Per chunk (chunk_size static): append chunk to the ring, grow `fill`; if
fill >= window, emit n_new = 1 + (fill-window)//hop frames exactly like
sonopy's chop_array over window_audio, consume n_new*hop pending samples,
and roll the feature buffer left by n_new.  n_new is data-dependent but
bounded by the static MAX_NEW = 1 + (chunk_size-1)//hop, so frames are
computed at MAX_NEW static positions and merged with a dynamic slice.

Chunk-for-chunk output parity with the reference updater is covered by
tests/test_streaming.py against a NumPy replica.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.dsp import Frontend
from ..params import ListenerParams, pr


@dataclass(frozen=True)
class StreamConfig:
    chunk_size: int
    params: ListenerParams

    @property
    def max_new(self) -> int:
        """Static bound on frames emitted per chunk: pending length peaks at
        window-1+chunk, giving 1 + (chunk-1)//hop frames."""
        return 1 + (self.chunk_size - 1) // self.params.hop_samples


def init_stream_state(params: ListenerParams | None = None,
                      n_streams: int | None = None):
    """Zeroed streaming state (audio ring, pending count, feature buffer) —
    mirrors listen.py:90-92.  With n_streams, every field (including the
    pending-sample counter `fill`) carries a leading stream axis, so
    streams may join, leave, or reset at different times."""
    p = params or pr
    lead = () if n_streams is None else (n_streams,)
    return {
        "audio": jnp.zeros(lead + (p.buffer_samples,), jnp.float32),
        "fill": jnp.zeros(lead, jnp.int32),
        "feats": jnp.zeros(lead + (p.n_features, p.n_mfcc), jnp.float32),
    }


def reset_streams(state, mask):
    """Zero the state of streams where `mask` is True (shape (n_streams,)).

    Jit-compatible: use when a serving slot is vacated or re-assigned so a
    new caller never sees the previous stream's audio. Returns a new state.
    Requires batched state (init_stream_state(n_streams=...)).
    """
    mask = jnp.asarray(mask, bool)
    # ValueError, not assert: under python -O a scalar state would be
    # silently broadcast to (n, ...) shapes and corrupt the stream
    if state["fill"].ndim != 1 or mask.ndim != 1:
        raise ValueError(
            "reset_streams needs a batched stream state (per-stream fill)"
        )
    return {
        "audio": jnp.where(mask[:, None], 0.0, state["audio"]),
        "fill": jnp.where(mask, 0, state["fill"]),
        "feats": jnp.where(mask[:, None, None], 0.0, state["feats"]),
    }


def make_stream_update(frontend: Frontend, chunk_size: int):
    """Build the jittable (state, chunk) -> (state, features) transition."""
    p = frontend.params
    cfg = StreamConfig(chunk_size, p)
    window, hop = p.window_samples, p.hop_samples
    buf_len = p.buffer_samples
    max_new = cfg.max_new
    if max_new > p.n_features:
        raise ValueError(
            "chunk_size too large for incremental update; lower chunk_size"
        )
    # start0 = buf_len - fill must stay >= 0 for dynamic_slice correctness:
    # fill peaks at window - 1 + chunk_size right before extraction, beyond
    # which dynamic_slice would clamp and silently emit corrupted frames.
    if window + chunk_size - 1 > buf_len:
        raise ValueError(
            "chunk_size too large for the audio buffer: need "
            "window_samples + chunk_size - 1 <= buffer_samples"
        )

    def update(state, chunk):
        """state/chunk may carry identical leading stream axes.  `fill` is
        either a shared scalar (lock-step streams) or carries the stream
        axis itself (independent join/leave/reset cadence per stream)."""
        audio = jnp.concatenate(
            [state["audio"][..., chunk_size:], chunk], axis=-1
        )
        fill = state["fill"] + chunk_size

        n_new = jnp.where(fill >= window, 1 + (fill - window) // hop, 0)

        # window_audio == the trailing `fill` samples of the stream; frame j
        # covers window_audio[j*hop : j*hop+window]
        start0 = buf_len - fill
        if fill.ndim == 0:
            frames = jnp.stack(
                [
                    jax.lax.dynamic_slice_in_dim(audio, start0 + j * hop,
                                                 window, axis=-1)
                    for j in range(max_new)
                ],
                axis=-2,
            )  # (..., max_new, window)
        else:
            # per-stream starts: one gather instead of max_new dynamic
            # slices. Rows j >= n_new[s] read clipped/garbage positions and
            # are discarded by the per-stream roll below; rows j < n_new[s]
            # are provably in bounds (fill >= window + (n_new-1)*hop).
            offs = (
                start0[..., None, None]
                + (jnp.arange(max_new) * hop)[:, None]
                + jnp.arange(window)[None, :]
            )  # (..., max_new, window)
            offs = jnp.clip(offs, 0, buf_len - 1)
            frames = jnp.take_along_axis(audio[..., None, :], offs, axis=-1)
        new_feats = frontend.features_from_frames(frames)  # (..., max_new, F)

        # roll the feature buffer left by n_new and append the n_new valid rows
        stacked = jnp.concatenate([state["feats"], new_feats], axis=-2)
        if fill.ndim == 0:
            feats = jax.lax.dynamic_slice_in_dim(
                stacked, n_new, p.n_features, axis=-2
            )
        else:
            rows = n_new[..., None, None] + jnp.arange(p.n_features)[:, None]
            feats = jnp.take_along_axis(stacked, rows, axis=-2)
        fill = fill - n_new * hop
        new_state = {"audio": audio, "fill": fill, "feats": feats}
        out = feats
        if p.use_delta:
            # deltas computed on the output copy only — the reference mutates
            # its state here (listen.py:108-110), which breaks on the next
            # chunk; we keep state un-deltaed (documented fix)
            from ..frontend.dsp import add_deltas

            out = add_deltas(feats)
        return new_state, out

    return update


class NumpyStreamReplica:
    """Direct NumPy replica of the reference update_vectors (listen.py:96-114)
    — the parity oracle for the jit streamer."""

    def __init__(self, params: ListenerParams | None = None):
        from ..frontend import numpy_ref

        self.p = params or pr
        self._vectorize = partial(numpy_ref.vectorize_raw, params=self.p)
        self.audio_buffer = np.zeros(self.p.buffer_samples)
        self.window_audio = np.array([])
        self.mfccs = np.zeros((self.p.n_features, self.p.n_mfcc))

    def update(self, chunk_audio: np.ndarray) -> np.ndarray:
        self.audio_buffer = np.concatenate(
            (self.audio_buffer[len(chunk_audio) :], chunk_audio)
        )
        self.window_audio = np.concatenate((self.window_audio, chunk_audio))
        if len(self.window_audio) >= self.p.window_samples:
            new_features = self._vectorize(self.window_audio)
            self.window_audio = self.window_audio[
                len(new_features) * self.p.hop_samples :
            ]
            if len(new_features) > len(self.mfccs):
                new_features = new_features[-len(self.mfccs) :]
            self.mfccs = np.concatenate(
                (self.mfccs[len(new_features) :], new_features)
            )
        return self.mfccs
