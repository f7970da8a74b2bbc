"""Streaming runtime tests: decoder, trigger, incremental feature parity,
and the end-to-end wav-replay Listener."""
import os

import numpy as np
import pytest
from scipy.stats import norm

import jax
import jax.numpy as jnp

from tpu_speech_commands.frontend import Frontend
from tpu_speech_commands.params import ListenerParams
from tpu_speech_commands.streaming import (
    NumpyStreamReplica,
    ThresholdDecoder,
    TriggerDetector,
    init_stream_state,
    make_stream_update,
)


# -- ThresholdDecoder --------------------------------------------------------

def test_decoder_edge_cases():
    dec = ThresholdDecoder(((6, 4),), center=0.2)
    assert dec.decode(0.0) == 0.0
    assert dec.decode(1.0) == 1.0


def test_decoder_monotonic():
    dec = ThresholdDecoder(((6, 4),), center=0.2)
    xs = np.linspace(1e-6, 1 - 1e-6, 200)
    ys = [dec.decode(float(x)) for x in xs]
    assert all(b >= a - 1e-12 for a, b in zip(ys, ys[1:]))
    assert all(0.0 <= y <= 1.0 for y in ys)


def test_decoder_matches_analytic_cdf():
    # decode maps logit(raw) through the N(mu, std) CDF, then recenters:
    # cp < center -> 0.5*cp/center ; else 0.5 + 0.5*(cp-center)/(1-center)
    mu, std, center = 6.0, 4.0, 0.2
    dec = ThresholdDecoder(((mu, std),), center=center)
    for raw in [0.3, 0.6, 0.9, 0.99, 0.9999]:
        logit = -np.log(1 / raw - 1)
        cp = norm.cdf((logit - mu) / std)
        expect = 0.5 * cp / center if cp < center else 0.5 + 0.5 * (cp - center) / (1 - center)
        got = dec.decode(raw)
        assert got == pytest.approx(expect, abs=0.02)


def test_decoder_encode_roundtrip():
    # The reference encode (listen.py:510-517) double-transforms the
    # threshold, so decode(encode(t)) == min(0.5*t/center, 1) — preserved.
    dec = ThresholdDecoder(((6, 4),), center=0.2)
    for threshold in [0.1, 0.2, 0.3]:
        raw = dec.encode(threshold)
        expect = min(0.5 * threshold / dec.center, 1.0)
        assert dec.decode(raw) == pytest.approx(expect, abs=0.05)


def test_decoder_encode_degenerate_config_no_nan():
    """zero-std threshold_config: encode must not 0/0-NaN (decode already
    guards out_range == 0; encode returns the step boundary)."""
    dec = ThresholdDecoder(((2, 0),), center=0.2)
    out = dec.encode(0.5)
    assert np.isfinite(out)
    assert out == pytest.approx(dec.sigmoid(dec.min_out))


def test_decoder_array():
    dec = ThresholdDecoder(((6, 4),), center=0.2)
    arr = np.array([0.1, 0.5, 0.9])
    out = dec.decode_array(arr)
    np.testing.assert_allclose(out, [dec.decode(v) for v in arr])


def test_decoder_array_bit_exact_vs_scalar():
    """Vectorised decode must match the scalar path exactly, including the
    0/1 pass-through, out-of-(0,1) asigmoid fallback, zero-std mixtures,
    and preserve input shape."""
    rng = np.random.default_rng(7)
    edge = np.array([0.0, 1.0, 1e-12, 1 - 1e-12, -0.5, 1.5])
    for cfg, center in [(((6, 4),), 0.2), (((6, 4), (2, 1)), 0.5), (((3, 0),), 0.2)]:
        dec = ThresholdDecoder(cfg, center)
        raw = np.concatenate([edge, rng.uniform(0, 1, 2000)])
        expect = np.array([dec.decode(float(v)) for v in raw])
        np.testing.assert_array_equal(dec.decode_array(raw), expect)
        shaped = raw[:2000].reshape(40, 50)
        assert dec.decode_array(shaped).shape == (40, 50)


def test_decoder_zero_range():
    """out_range == 0 degenerates to a step at min_out: cp = raw > min_out
    then the center rescale maps cp=1 -> 1.0, cp=0 -> 0.0 exactly."""
    dec = ThresholdDecoder(((5, 0),), center=0.5)
    assert dec.out_range == 0
    assert dec.decode(0.9) == 0.0  # raw 0.9 < min_out 5 -> cp 0
    dec_neg = ThresholdDecoder(((-5, 0),), center=0.5)
    assert dec_neg.decode(0.9) == 1.0  # raw 0.9 > min_out -5 -> cp 1
    assert dec.decode(0.0) == 0.0 and dec.decode(1.0) == 1.0  # passthrough


# -- TriggerDetector ---------------------------------------------------------

CLASSES = ["background", "left", "right"]


def test_trigger_fires_after_consecutive_activations():
    det = TriggerDetector(1024, CLASSES, sensitivity=0.5, trigger_level=3)
    fired = [det.update(1, 0.9) for _ in range(5)]
    # 1st update records the class; then activation 1,2,3,4 — 4>3 fires
    assert fired == [False, False, False, False, True]
    # refractory period: -(8*2048)//1024 = -16
    assert det.activation == -16


def test_trigger_requires_same_class():
    det = TriggerDetector(1024, CLASSES, trigger_level=2)
    assert not det.update(1, 0.9)
    assert not det.update(2, 0.9)  # class switch resets the streak
    assert not det.update(2, 0.9)
    assert not det.update(2, 0.9)
    assert det.update(2, 0.9)


def test_trigger_ignores_background_and_low_scores():
    det = TriggerDetector(1024, CLASSES, trigger_level=1)
    assert not det.update(0, 0.99)  # background never triggers
    assert not det.update(0, 0.99)
    assert not det.update(1, 0.3)  # below sensitivity
    assert not det.update(1, 0.3)


def test_trigger_counter_decay():
    det = TriggerDetector(1024, CLASSES, trigger_level=5)
    det.update(1, 0.9)  # records the class
    det.update(1, 0.9)
    det.update(1, 0.9)
    assert det.activation == 2
    det.update(1, 0.1)  # not activated -> decay
    assert det.activation == 1


def test_trigger_array_matches_scalar_detectors():
    """TriggerDetectorArray advances N slot state machines bit-exactly like
    N scalar TriggerDetectors over random score streams — including
    refractory periods, class switches and inactive-slot freezing (the
    multi-stream server's batched postprocess, round-2 verdict #6)."""
    from tpu_speech_commands.streaming import TriggerDetectorArray

    rng = np.random.default_rng(17)
    n_slots, ticks = 32, 400
    scalars = [TriggerDetector(1024, CLASSES, trigger_level=3)
               for _ in range(n_slots)]
    array = TriggerDetectorArray(1024, CLASSES, trigger_level=3,
                                 n_slots=n_slots)
    for t in range(ticks):
        idx = rng.integers(0, len(CLASSES), n_slots)
        # sticky streams: mostly repeat the previous class so streaks form
        if t > 0:
            keep = rng.random(n_slots) < 0.7
            idx = np.where(keep, prev_idx, idx)
        prev_idx = idx
        score = rng.random(n_slots)
        active = rng.random(n_slots) < 0.9
        want = np.array([
            scalars[i].update(int(idx[i]), float(score[i])) if active[i]
            else False
            for i in range(n_slots)
        ])
        got = array.update(idx, score, active)
        np.testing.assert_array_equal(got, want, err_msg=f"tick {t}")
        # occasional per-slot reset (stream leaves, slot re-admitted)
        if t % 37 == 0:
            slot = int(rng.integers(0, n_slots))
            scalars[slot] = TriggerDetector(1024, CLASSES, trigger_level=3)
            array.reset(slot)
    assert_same_state = [
        (scalars[i].activation, -1 if scalars[i].record_index is None
         else scalars[i].record_index) for i in range(n_slots)
    ]
    np.testing.assert_array_equal(
        array.activation, [s[0] for s in assert_same_state]
    )
    np.testing.assert_array_equal(
        array.record_index, [s[1] for s in assert_same_state]
    )


# -- incremental feature streaming parity ------------------------------------

@pytest.mark.parametrize("chunk_size", [1024, 512, 800])
def test_stream_matches_reference_replica(chunk_size):
    p = ListenerParams()
    fe = Frontend(p)
    update = jax.jit(make_stream_update(fe, chunk_size))
    state = init_stream_state(p)
    replica = NumpyStreamReplica(p)

    rng = np.random.default_rng(3)
    t = np.arange(p.sample_rate * 2) / p.sample_rate
    audio = (0.3 * np.sin(2 * np.pi * 700 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)

    n_chunks = len(audio) // chunk_size
    for c in range(n_chunks):
        chunk = audio[c * chunk_size : (c + 1) * chunk_size]
        state, feats = update(state, jnp.asarray(chunk))
        expect = replica.update(chunk.astype(np.float64))
        np.testing.assert_allclose(
            np.asarray(feats), expect, rtol=1e-3, atol=2e-3,
            err_msg=f"chunk {c} (size {chunk_size})",
        )


def test_multi_stream_batched_update_matches_per_stream():
    """The leading-stream-axis path must equal independent streams."""
    p = ListenerParams()
    fe = Frontend(p)
    update = jax.jit(make_stream_update(fe, 1024))
    rng = np.random.default_rng(9)
    audios = [rng.standard_normal(4096).astype(np.float32) for _ in range(3)]

    batched = init_stream_state(p, n_streams=3)
    singles = [init_stream_state(p) for _ in range(3)]
    for c in range(4):
        chunk_batch = jnp.asarray(
            np.stack([a[c * 1024 : (c + 1) * 1024] for a in audios])
        )
        batched, bfeats = update(batched, chunk_batch)
        for s in range(3):
            singles[s], sfeats = update(
                singles[s], jnp.asarray(audios[s][c * 1024 : (c + 1) * 1024])
            )
            np.testing.assert_allclose(
                np.asarray(bfeats)[s], np.asarray(sfeats), rtol=1e-5, atol=1e-5
            )


def test_multi_stream_staggered_starts_match_per_stream():
    """Streams joining at different times (per-stream fill counters): a
    slot reset mid-run via reset_streams must behave exactly like a fresh
    single stream from its own t=0."""
    from tpu_speech_commands.streaming.feature_stream import reset_streams

    p = ListenerParams()
    fe = Frontend(p)
    update = jax.jit(make_stream_update(fe, 1024))
    rng = np.random.default_rng(11)
    audios = [rng.standard_normal(8192).astype(np.float32) for _ in range(3)]
    joins = [0, 2, 5]  # chunk index at which each stream starts

    batched = init_stream_state(p, n_streams=3)
    assert batched["fill"].shape == (3,)
    singles = [init_stream_state(p) for _ in range(3)]
    sfeats = [None] * 3

    for c in range(8):
        # a joining stream resets its slot (as a serving frontend would)
        joining = np.array([c == j for j in joins])
        if joining.any():
            batched = reset_streams(batched, jnp.asarray(joining))
        chunk_batch = np.zeros((3, 1024), np.float32)
        for s in range(3):
            if c >= joins[s]:
                local = c - joins[s]
                chunk_batch[s] = audios[s][local * 1024 : (local + 1) * 1024]
        batched, bfeats = update(batched, jnp.asarray(chunk_batch))
        for s in range(3):
            if c >= joins[s]:
                local = c - joins[s]
                singles[s], sfeats[s] = update(
                    singles[s],
                    jnp.asarray(audios[s][local * 1024 : (local + 1) * 1024]),
                )
                np.testing.assert_allclose(
                    np.asarray(bfeats)[s], np.asarray(sfeats[s]),
                    rtol=1e-5, atol=1e-5,
                    err_msg=f"stream {s} chunk {c}",
                )
    # fills diverge across streams when hop does not divide the chunk evenly;
    # at chunk 1024 / hop 512 they happen to align — just check shape+validity
    assert batched["fill"].shape == (3,)
    assert bool(jnp.all(batched["fill"] >= 0))


def test_stream_audio_ring_matches_reference():
    p = ListenerParams()
    fe = Frontend(p)
    update = jax.jit(make_stream_update(fe, 1024))
    state = init_stream_state(p)
    replica = NumpyStreamReplica(p)
    rng = np.random.default_rng(5)
    for _ in range(4):
        chunk = rng.standard_normal(1024).astype(np.float32)
        state, _ = update(state, jnp.asarray(chunk))
        replica.update(chunk.astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(state["audio"]), replica.audio_buffer, rtol=1e-5, atol=1e-6
    )


# -- Listener end-to-end ------------------------------------------------------

def test_listener_wav_replay(tmp_path, capsys):
    from tpu_speech_commands.data.synthetic import synth_command_audio
    from tpu_speech_commands.data.wav import save_audio
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.streaming import Listener
    from tpu_speech_commands.training import create_train_state, save_checkpoint

    classes_path = tmp_path / "classes.txt"
    classes_path.write_text("\n".join(CLASSES) + "\n")

    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state("simple_cnn_lite", len(CLASSES), tx,
                                      jax.random.PRNGKey(0))
    ckpt = tmp_path / "model.npz"
    save_checkpoint(str(ckpt), state,
                    {"model_type": "simple_cnn_lite", "num_classes": len(CLASSES)})

    rng = np.random.default_rng(0)
    audio = np.concatenate([
        synth_command_audio("background", rng),
        synth_command_audio("left", rng),
    ])
    wav_path = tmp_path / "in.wav"
    save_audio(str(wav_path), audio)

    listener = Listener(
        model_path=str(ckpt),
        classes_path=str(classes_path),
        input_wav=str(wav_path),
        save_dir=str(tmp_path / "saved"),
    )
    listener.run_wav()
    out = capsys.readouterr().out
    # one confidence bar per chunk, the final partial chunk zero-padded
    # (the reference scores the ragged wav tail too, listen.py:403)
    assert out.count("\n") == -(-len(audio) // 1024)

    # each run_wav is an independent session: a repeat replay must print
    # the identical bar sequence, not score its opening chunks against the
    # previous run's ring-buffer tail / carried trigger counter
    listener.run_wav()
    assert capsys.readouterr().out == out


def test_listener_chime_selection(monkeypatch):
    """Both shipped chime assets are valid 16 kHz mono wavs and
    play_activate_audio honors chime_path (reference ships
    assets/{activate,wozai}.wav, listen.py:294-297)."""
    import sys
    import types

    from tpu_speech_commands.data.wav import wav_duration_samples
    from tpu_speech_commands.streaming import Listener

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    chimes = {}
    for name in ("activate.wav", "wozai.wav"):
        path = os.path.join(repo, "assets", name)
        n, rate = wav_duration_samples(path)
        assert rate == 16000 and n > 1000
        chimes[name] = path

    played = []

    class _FakeStream:
        def write(self, data):
            played.append(len(data))

        def stop_stream(self):
            pass

        def close(self):
            pass

    class _FakePyAudio:
        def open(self, **kwargs):
            played.append(("rate", kwargs["rate"]))
            return _FakeStream()

        def get_format_from_width(self, w):
            return w

        def terminate(self):
            pass

    fake = types.ModuleType("pyaudio")
    fake.PyAudio = _FakePyAudio
    monkeypatch.setitem(sys.modules, "pyaudio", fake)

    listener = Listener.__new__(Listener)  # no model needed for the chime
    listener.chime_path = chimes["wozai.wav"]
    listener.play_activate_audio()
    assert played and played[0] == ("rate", 16000) and len(played) > 1


def test_listener_int16_chunk_matches_bytes(tmp_path):
    """process_chunk must decode int16 ndarrays like bytes input (/32768)
    — an unscaled int16 array would produce garbage features silently."""
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.streaming import Listener
    from tpu_speech_commands.training import create_train_state, save_checkpoint

    classes_path = tmp_path / "classes.txt"
    classes_path.write_text("\n".join(CLASSES) + "\n")
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    _, state = create_train_state("simple_cnn_lite", len(CLASSES), tx,
                                  jax.random.PRNGKey(0))
    ckpt = tmp_path / "model.npz"
    save_checkpoint(str(ckpt), state,
                    {"model_type": "simple_cnn_lite", "num_classes": len(CLASSES)})

    rng = np.random.default_rng(7)
    pcm = (rng.standard_normal(2048) * 4000).astype(np.int16)

    a = Listener(model_path=str(ckpt), classes_path=str(classes_path))
    b = Listener(model_path=str(ckpt), classes_path=str(classes_path))
    for lo in range(0, 2048, 1024):
        chunk = pcm[lo : lo + 1024]
        s_bytes = a.process_chunk(chunk.tobytes())
        s_int16 = b.process_chunk(chunk)
    np.testing.assert_allclose(s_int16, s_bytes, rtol=1e-5, atol=1e-6)


def test_stream_update_alt_config_matches_replica():
    """The jit streamer must match the reference update at non-default
    params (smaller transform, different hop) too."""
    p = ListenerParams(window_t=0.016, hop_t=0.008, n_fft=256)
    fe = Frontend(p)
    update = jax.jit(make_stream_update(fe, 512))
    state = init_stream_state(p)
    replica = NumpyStreamReplica(p)
    rng = np.random.default_rng(13)
    for c in range(6):
        chunk = rng.standard_normal(512).astype(np.float32)
        state, feats = update(state, jnp.asarray(chunk))
        expect = replica.update(chunk.astype(np.float64))
        np.testing.assert_allclose(
            np.asarray(feats), expect, rtol=1e-3, atol=2e-3,
            err_msg=f"chunk {c}",
        )
