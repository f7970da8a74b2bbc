"""On-device augmentation pipeline tests."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_speech_commands.data.augment import (
    AugmentConfig,
    augment_batch,
    make_audio_pipeline,
)
from tpu_speech_commands.frontend import Frontend


def _batch(rng, n=6):
    t = np.arange(16000) / 16000.0
    return jnp.asarray(np.stack([
        0.3 * np.sin(2 * np.pi * (300 + 100 * i) * t) for i in range(n)
    ]).astype(np.float32))


def _noise(rng, n=4):
    return jnp.asarray(
        0.05 * rng.standard_normal((n, 16000)).astype(np.float32)
    )


def test_augment_shapes_and_determinism(rng):
    audio = _batch(rng)
    noise = _noise(rng)
    key = jax.random.PRNGKey(0)
    a1 = augment_batch(key, audio, noise)
    a2 = augment_batch(key, audio, noise)
    assert a1.shape == audio.shape
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    a3 = augment_batch(jax.random.PRNGKey(1), audio, noise)
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_empty_noise_bank(rng):
    """An empty noise bank skips the mix stage in augment_batch (static
    shape, trace-time branch) and raises actionably at pipeline build —
    the bare gather from (0, S) used to fail deep inside the jitted step."""
    import pytest

    audio = _batch(rng)
    empty = jnp.zeros((0, 16000), jnp.float32)
    out = augment_batch(jax.random.PRNGKey(0), audio, empty)
    assert out.shape == audio.shape
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError, match="background"):
        make_audio_pipeline(Frontend(), "simple_cnn", empty)


def test_augment_bounded(rng):
    audio = _batch(rng)
    noise = _noise(rng)
    out = np.asarray(augment_batch(jax.random.PRNGKey(2), audio, noise))
    assert np.all(out >= -1.0) and np.all(out <= 1.0)
    assert np.all(np.isfinite(out))


def test_augment_noise_changes_signal(rng):
    audio = _batch(rng)
    noise = _noise(rng)
    cfg = AugmentConfig(noise_prob=1.0, shift_max=0.0, gain_min=1.0, gain_max=1.0)
    out = np.asarray(augment_batch(jax.random.PRNGKey(3), audio, noise, cfg))
    # pure gain/shift disabled -> any difference comes from mixed noise
    assert np.abs(out - np.asarray(audio)).max() > 1e-4


def test_pipeline_train_vs_eval(rng):
    audio = _batch(rng)
    noise = _noise(rng)
    pipe = make_audio_pipeline(Frontend(), "simple_cnn", np.asarray(noise))
    feats_eval = pipe(None, audio, False)
    assert feats_eval.shape == (6, 30, 20, 1)
    feats_train = pipe(jax.random.PRNGKey(0), audio, True)
    assert feats_train.shape == (6, 30, 20, 1)
    assert not np.allclose(np.asarray(feats_eval), np.asarray(feats_train))


def test_end_to_end_audio_training(tmp_path):
    """Trainer with device_pipeline learns separable synthetic audio."""
    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.training import Trainer, TrainerConfig, create_train_state

    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    xs, ys = [], []
    for label, freq in enumerate([0, 500, 2000]):  # 0 = background noise
        for i in range(16):
            if label == 0:
                clip = 0.05 * rng.standard_normal(16000)
            else:
                clip = (0.4 * np.sin(2 * np.pi * freq * t)
                        + 0.02 * rng.standard_normal(16000))
            xs.append(clip.astype(np.float32))
            ys.append(label)
    x = np.stack(xs)
    y = np.array(ys, np.int32)
    perm = rng.permutation(len(x))
    ds = Dataset(x[perm], y[perm])

    # simple_gru: no BatchNorm, so eval isn't skewed by unconverged running
    # stats on a tiny run (see CLAUDE.md note)
    frontend = Frontend()
    pipe = make_audio_pipeline(frontend, "simple_gru", x[y == 0][:4])
    tx = get_optimizer("adam", 5e-3, decay_type=None)
    model, state = create_train_state("simple_gru", 3, tx,
                                      jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=16, epochs=8, log_dir=str(tmp_path),
                        log_tensorboard=False)
    trainer = Trainer(model, state, "simple_gru", 3, cfg,
                      device_pipeline=pipe)
    history = trainer.fit(ds, ds, verbose=False)
    assert history[-1].loss < history[0].loss
    assert history[-1].val_accuracy > 0.7


def test_audio_pipeline_trains_on_8_device_mesh(tmp_path):
    """The raw-audio device pipeline (augment + frontend inside the train
    step) must shard over the batch axis of a multi-device mesh — one
    epoch-scan dispatch with the audio batch split across 'data'."""
    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.parallel import make_mesh
    from tpu_speech_commands.training import Trainer, TrainerConfig, create_train_state

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(1)
    t = np.arange(16000) / 16000.0
    x = np.stack([
        (0.4 * np.sin(2 * np.pi * (400 + 300 * (i % 3)) * t)
         + 0.02 * rng.standard_normal(16000)).astype(np.float32)
        for i in range(48)
    ])
    y = (np.arange(48) % 3).astype(np.int32)
    ds = Dataset(x, y)

    frontend = Frontend()
    pipe = make_audio_pipeline(frontend, "simple_gru", x[:2])
    tx = get_optimizer("adam", 5e-3, decay_type=None)
    model, state = create_train_state("simple_gru", 3, tx, jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=16, epochs=2, log_dir=str(tmp_path),
                        log_tensorboard=False)
    trainer = Trainer(model, state, "simple_gru", 3, cfg,
                      device_pipeline=pipe, mesh=make_mesh())
    history = trainer.fit(ds, ds, verbose=False)
    assert np.isfinite(history[-1].loss)
    assert history[-1].loss < history[0].loss
