"""Pallas fused frontend vs the XLA/jnp frontend (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_speech_commands.frontend import Frontend
from tpu_speech_commands.ops import make_fused_frontend
from tpu_speech_commands.params import ListenerParams


@pytest.fixture(scope="module")
def audio_batch():
    rng = np.random.default_rng(21)
    t = np.arange(16000) / 16000.0
    rows = [
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(16000)
        for _ in range(8)
    ]
    return np.stack(rows).astype(np.float32)


def test_fused_matches_xla_frontend(audio_batch):
    p = ListenerParams()
    fused = make_fused_frontend(p, batch_tile=4, interpret=True)
    got = np.asarray(fused(jnp.asarray(audio_batch)))
    expect = np.asarray(Frontend(p)(jnp.asarray(audio_batch)))
    assert got.shape == expect.shape == (8, 30, 20)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_fused_bark_matches_xla(audio_batch):
    p = ListenerParams()
    fused = make_fused_frontend(p, feature_type="bark", batch_tile=8,
                                interpret=True)
    got = np.asarray(fused(jnp.asarray(audio_batch)))
    expect = np.asarray(Frontend(p, feature_type="bark")(jnp.asarray(audio_batch)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_fast_math_stays_close(audio_batch):
    p = ListenerParams()
    exact = np.asarray(Frontend(p)(jnp.asarray(audio_batch)))
    fast = np.asarray(
        make_fused_frontend(p, batch_tile=8, interpret=True, fast_math=True)(
            jnp.asarray(audio_batch)
        )
    )
    # bf16 DFT with f32 accumulate: ~1e-2 absolute, tiny vs feature range
    assert np.abs(fast - exact).max() < 0.05


def test_fused_rejects_bad_batch(audio_batch):
    fused = make_fused_frontend(ListenerParams(), batch_tile=8, interpret=True)
    with pytest.raises(AssertionError):
        fused(jnp.asarray(audio_batch[:5]))
