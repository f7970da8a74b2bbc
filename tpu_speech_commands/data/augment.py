"""On-device audio augmentation (jit-able, batched).

The reference augments offline with CPU tools (add_noise.py, wav_merge.py,
audio_reverberation.py) and trains on cached features.  Here augmentation
runs *inside the training step* on TPU — random gain, random time shift,
and random-SNR background-noise mixing — feeding the fused frontend, so
every epoch sees fresh augmentations at negligible cost (the frontend
processes ~600k windows/s; augmentation is a few VPU ops on top).

All functions are pure (key-in, arrays-out) and shard with the batch axis.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    snr_db_min: float = 5.0
    snr_db_max: float = 20.0
    noise_prob: float = 0.7     # fraction of samples that get noise mixed in
    shift_max: float = 0.1      # max |time shift| as a fraction of the buffer
    gain_min: float = 0.8
    gain_max: float = 1.2


def augment_batch(
    key: jax.Array,
    audio: jax.Array,           # (B, S) float32
    noise_bank: jax.Array,      # (N, S) float32 background clips
    config: AugmentConfig = AugmentConfig(),
) -> jax.Array:
    """Randomly gain-scale, time-shift, and noise-mix a batch of clips."""
    batch, n_samples = audio.shape
    k_gain, k_shift, k_pick, k_snr, k_apply = jax.random.split(key, 5)

    # random gain
    gain = jax.random.uniform(
        k_gain, (batch, 1), minval=config.gain_min, maxval=config.gain_max
    )
    out = audio * gain

    # random time shift, zero backfill, truncation at the edges — the
    # standard speech-commands recipe (±shift_max of the buffer).  Note
    # commands sit at the buffer TAIL (pad_audio left-pads), so a
    # positive shift can clip up to shift_max off a full-length word's
    # ending; that truncation is part of the regularisation, same as the
    # TF speech_commands ±100 ms shift on 1 s clips.
    max_shift = int(config.shift_max * n_samples)
    if max_shift > 0:
        shift = jax.random.randint(
            k_shift, (batch,), -max_shift, max_shift + 1
        )
        idx = jnp.arange(n_samples)[None, :] - shift[:, None]
        valid = (idx >= 0) & (idx < n_samples)
        idx = jnp.clip(idx, 0, n_samples - 1)
        out = jnp.take_along_axis(out, idx, axis=1) * valid

    # random noise clip at random SNR for a random subset; with an empty
    # bank the stage is skipped (shape is static, so this is a trace-time
    # branch) — randint(0, 0) + a gather from (0, S) would otherwise fail
    # deep inside the jitted step with an unactionable error
    n_noise = noise_bank.shape[0]
    if n_noise > 0:
        pick = jax.random.randint(k_pick, (batch,), 0, n_noise)
        noise = noise_bank[pick]
        snr_db = jax.random.uniform(
            k_snr, (batch, 1), minval=config.snr_db_min,
            maxval=config.snr_db_max
        )
        p_sig = jnp.mean(out**2, axis=1, keepdims=True)
        p_noise = jnp.mean(noise**2, axis=1, keepdims=True) + 1e-12
        scale = jnp.sqrt(p_sig / (10.0 ** (snr_db / 10.0)) / p_noise)
        mixed = out + scale * noise
        use_noise = (
            jax.random.uniform(k_apply, (batch, 1)) < config.noise_prob
        )
        out = jnp.where(use_noise, mixed, out)

    return jnp.clip(out, -1.0, 1.0)


def make_audio_pipeline(
    frontend,
    model_type: str,
    noise_bank,
    config: AugmentConfig = AugmentConfig(),
):
    """Build the trainer `device_pipeline`: raw audio -> (augment when
    training) -> fused frontend -> model input, all inside the jitted step."""
    from ..models import features_to_input

    noise_bank = jnp.asarray(noise_bank, jnp.float32)
    if config.noise_prob > 0 and noise_bank.shape[0] == 0:
        raise ValueError(
            "augmentation noise bank is empty — the dataset has no "
            "'background' clips to mix in; add background wavs or set "
            "noise_prob=0"
        )

    def pipeline(key, audio, train: bool):
        if train:
            audio = augment_batch(key, audio, noise_bank, config)
        feats = frontend(audio)
        return features_to_input(feats, model_type)

    return pipeline
