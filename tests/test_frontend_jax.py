"""jnp (TPU-path) frontend vs NumPy oracle parity tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_speech_commands.frontend import Frontend, add_deltas, frame_signal, numpy_ref
from tpu_speech_commands.params import ListenerParams


@pytest.fixture(scope="module")
def audio_batch():
    rng = np.random.default_rng(7)
    t = np.arange(16000) / 16000.0
    batch = np.stack(
        [
            0.4 * np.sin(2 * np.pi * 300 * t) + 0.05 * rng.standard_normal(16000),
            0.2 * np.sin(2 * np.pi * 2000 * t) + 0.1 * rng.standard_normal(16000),
            rng.standard_normal(16000) * 0.3,
            np.concatenate([np.zeros(9000), rng.standard_normal(7000) * 0.5]),
        ]
    ).astype(np.float32)
    return batch


def test_frame_signal_matches_chop_array(rng):
    audio = rng.standard_normal((2, 4000)).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(audio), 512, 256))
    for b in range(2):
        expect = np.array(numpy_ref.chop_array(audio[b], 512, 256))
        np.testing.assert_allclose(frames[b], expect)


def test_mfcc_frontend_matches_oracle(audio_batch):
    fe = Frontend(ListenerParams())
    got = np.asarray(fe(jnp.asarray(audio_batch)))
    assert got.shape == (4, 30, 20)
    for b in range(len(audio_batch)):
        expect = numpy_ref.mfcc_spec(
            audio_batch[b].astype(np.float64),
            16000,
            (1024, 512),
            fft_size=1024,
            num_filt=20,
            num_coeffs=20,
        )
        np.testing.assert_allclose(got[b], expect, rtol=1e-3, atol=2e-3)


def test_bark_frontend_matches_oracle(audio_batch):
    fe = Frontend(ListenerParams(), feature_type="bark")
    got = np.asarray(fe(jnp.asarray(audio_batch)))
    for b in range(len(audio_batch)):
        expect = numpy_ref.bfcc_spec(
            audio_batch[b].astype(np.float64),
            16000,
            1024,
            512,
            fft_size=1024,
            num_filt=20,
            num_coeffs=20,
        )
        np.testing.assert_allclose(got[b], expect, rtol=1e-3, atol=2e-3)


def test_frontend_jits_and_is_deterministic(audio_batch):
    fe = Frontend(ListenerParams())
    f = jax.jit(fe.__call__)
    a = np.asarray(f(jnp.asarray(audio_batch)))
    b = np.asarray(f(jnp.asarray(audio_batch)))
    np.testing.assert_array_equal(a, b)


def test_use_delta_path(audio_batch):
    fe = Frontend(ListenerParams(use_delta=True))
    got = np.asarray(fe(jnp.asarray(audio_batch[:1])))
    assert got.shape == (1, 30, 40)
    expect = numpy_ref.audio_to_feature(
        audio_batch[0].astype(np.float64), ListenerParams(use_delta=True)
    )
    np.testing.assert_allclose(got[0], expect, rtol=1e-3, atol=2e-3)


def test_pad_audio_semantics():
    fe = Frontend(ListenerParams())
    short = jnp.ones((2, 7000), jnp.float32)
    padded = fe.pad_audio(short)
    assert padded.shape == (2, 16000)
    assert np.all(np.asarray(padded[:, :9000]) == 0)
    long = jnp.ones((2, 20000), jnp.float32)
    assert fe.pad_audio(long).shape == (2, 16000)


def test_add_deltas_matches_numpy(rng):
    f = rng.standard_normal((2, 5, 3)).astype(np.float32)
    got = np.asarray(add_deltas(jnp.asarray(f)))
    for b in range(2):
        np.testing.assert_allclose(got[b], numpy_ref.add_deltas(f[b]), rtol=1e-6)


def test_alt_config_shapes():
    p = ListenerParams(n_fft=512, n_filt=26, n_mfcc=13, window_t=0.025, hop_t=0.01)
    fe = Frontend(p)
    audio = jnp.zeros((3, p.max_samples), jnp.float32)
    out = fe(audio)
    n_frames = 1 + (p.max_samples - p.window_samples) // p.hop_samples
    assert out.shape == (3, n_frames, 13)


@pytest.mark.parametrize("params_kwargs", [
    # window shorter than the transform (zero-padded tail)
    dict(window_t=0.05, hop_t=0.025, n_fft=1024),
    # non-power-of-two FFT (any-size rfft path)
    dict(window_t=0.03, hop_t=0.015, n_fft=500),
    # short buffer, more filters/coeffs, deltas
    dict(buffer_t=0.5, n_filt=26, n_mfcc=13, use_delta=True),
    # small transform
    dict(window_t=0.016, hop_t=0.008, n_fft=256),
])
def test_frontend_matches_oracle_across_configs(params_kwargs, rng):
    """Property sweep: the XLA frontend must track the float64 oracle for
    arbitrary (valid) parameter combinations, not just the defaults."""
    p = ListenerParams(**params_kwargs)
    audio = rng.standard_normal((3, p.max_samples)).astype(np.float32)
    for feature_type in ("mfcc", "bark"):
        fe = Frontend(p, feature_type=feature_type)
        got = np.asarray(fe(jnp.asarray(audio)))
        expect = np.stack([
            numpy_ref.vectorize_raw(a.astype(np.float64), params=p,
                                    frontend=feature_type)
            for a in audio
        ])
        if p.use_delta:
            expect = np.stack([
                numpy_ref.add_deltas(e) for e in expect
            ])
        assert got.shape == expect.shape, (got.shape, expect.shape)
        np.testing.assert_allclose(
            got, expect, rtol=1e-3, atol=1e-4,
            err_msg=f"{feature_type} {params_kwargs}",
        )
