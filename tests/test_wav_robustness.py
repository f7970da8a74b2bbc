"""Robustness: extensible-format wavs and corrupt native model files."""
import os
import struct
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_extensible_wav(path, samples, rate=16000):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) PCM wav — stdlib `wave` rejects it."""
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    # 40-byte extensible fmt chunk: base 16 bytes + cbSize(22) +
    # validbits + channel mask + PCM SubFormat GUID
    guid = (b"\x01\x00\x00\x00\x00\x00\x10\x00"
            b"\x80\x00\x00\xaa\x00\x38\x9b\x71")
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, rate, rate * 2, 2, 16)
    fmt += struct.pack("<HHI", 22, 16, 0) + guid
    data_size = len(pcm)
    riff_size = 4 + (8 + len(fmt)) + (8 + data_size)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", data_size) + pcm)


def test_load_extensible_wav(tmp_path, rng):
    from tpu_speech_commands.data.wav import load_wav

    samples = 0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
    path = str(tmp_path / "ext.wav")
    write_extensible_wav(path, samples)
    audio = load_wav(path, 16000)
    assert len(audio) == 16000
    np.testing.assert_allclose(audio, samples, atol=2e-4)


def test_wav_duration_samples_extensible_fallback(tmp_path, rng):
    """Duration probing falls back to the RIFF parser for headers stdlib
    `wave` rejects — same format support as load_wav."""
    from tpu_speech_commands.data.wav import wav_duration_samples

    path = str(tmp_path / "ext_dur.wav")
    write_extensible_wav(path, 0.2 * rng.standard_normal(12345))
    n, rate = wav_duration_samples(path)
    assert (n, rate) == (12345, 16000)


def test_audio_to_buffer_clips_full_scale():
    """+1.0 must saturate to 32767, not wrap to -32768 (polarity glitch)."""
    from tpu_speech_commands.data.wav import audio_to_buffer, buffer_to_audio

    out = np.frombuffer(
        audio_to_buffer(np.array([1.0, -1.0, 2.0, 0.5])), dtype="<i2"
    )
    assert out[0] == 32767 and out[2] == 32767
    assert out[1] == -32768
    # in-range values still round-trip through buffer_to_audio
    assert buffer_to_audio(audio_to_buffer(np.array([0.5])))[0] == (
        pytest.approx(0.5, abs=1e-4)
    )


def test_native_wav_reader_extensible(tmp_path, rng, gru_blob):
    """The C++ reader handles extensible wavs too (via speech_commands app)."""
    lib = os.path.join(REPO, "native", "build", "speech_commands")
    if not os.path.exists(lib):
        pytest.skip("native apps not built")
    blob = gru_blob

    wav = str(tmp_path / "ext.wav")
    write_extensible_wav(wav, 0.2 * rng.standard_normal(16000))
    out = subprocess.run([lib, "--model", blob, "--wav", wav],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "model invoke time" in out.stdout


def write_24bit_wav(path, samples, rate=16000):
    vals = (np.clip(samples, -1, 1) * 8388607).astype(np.int32)
    b = np.zeros((len(vals), 3), np.uint8)
    u = vals.astype(np.uint32) & 0xFFFFFF
    b[:, 0] = u & 0xFF
    b[:, 1] = (u >> 8) & 0xFF
    b[:, 2] = (u >> 16) & 0xFF
    pcm = b.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 3, 3, 24)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(pcm))
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


def test_load_24bit_wav(tmp_path):
    from tpu_speech_commands.data.wav import load_wav

    samples = 0.5 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)
    path = str(tmp_path / "w24.wav")
    write_24bit_wav(path, samples)
    audio = load_wav(path, 16000)
    np.testing.assert_allclose(audio, samples, atol=1e-3)


def _require_libtsc():
    """Skip (not ImportError-ERROR) when the native runtime isn't built —
    NativeModel raises ImportError, which pytest.raises(RuntimeError)
    would not catch."""
    if not os.path.exists(os.path.join(REPO, "native", "build", "libtsc.so")):
        pytest.skip("native runtime not built")


@pytest.fixture(scope="module")
def gru_blob(tmp_path_factory):
    """One shared 3-class simple_gru .tscm export (the four native tests
    below each re-built an identical one before)."""
    _require_libtsc()
    import jax

    from tpu_speech_commands.export.native_format import export_native
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.params import pr
    from tpu_speech_commands.training import create_train_state, save_checkpoint

    tmp = tmp_path_factory.mktemp("gru_blob")
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    _, state = create_train_state("simple_gru", 3, tx, jax.random.PRNGKey(0))
    ckpt = str(tmp / "m.npz")
    save_checkpoint(ckpt, state, {"model_type": "simple_gru", "num_classes": 3,
                                  "classes": ["background", "a", "b"],
                                  "params": pr.to_dict()})
    blob = str(tmp / "m.tscm")
    export_native(ckpt, blob)
    return blob


def test_native_model_loader_rejects_corrupt(tmp_path):
    _require_libtsc()
    from tpu_speech_commands.native_binding import NativeModel

    bad = tmp_path / "bad.tscm"
    bad.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(RuntimeError):
        NativeModel(str(bad))

    truncated = tmp_path / "trunc.tscm"
    truncated.write_bytes(b"TSCM" + struct.pack("<II", 1, 1 << 30))
    with pytest.raises(RuntimeError):
        NativeModel(str(truncated))


def test_native_model_loader_rejects_truncated_tensor(tmp_path, gru_blob):
    """A valid blob cut mid-tensor must error, not load a zero-filled
    kernel tail and silently predict garbage."""
    from tpu_speech_commands.native_binding import NativeModel

    data = open(gru_blob, "rb").read()
    cut = tmp_path / "cut.tscm"
    cut.write_bytes(data[: len(data) - 100])  # drop the last kernel's tail
    with pytest.raises(RuntimeError):
        NativeModel(str(cut))


def test_native_app_bounded_alloc_on_huge_data_size(tmp_path, rng, gru_blob):
    """A crafted data-chunk size near 4 GiB must not drive the allocation
    (bounded by the bytes actually in the file) — decode what is present
    instead of bad_alloc/SIGABRT."""
    app = os.path.join(REPO, "native", "build", "speech_commands")
    if not os.path.exists(app):
        pytest.skip("native apps not built")
    blob = gru_blob

    pcm = (0.1 * rng.standard_normal(16000) * 32767).astype("<i2").tobytes()
    bad = tmp_path / "huge.wav"
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    with open(bad, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 0xFFFFFFF0) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", 0xFFFFFFF0) + pcm)  # lying size
    out = subprocess.run([app, "--model", blob, "--wav", str(bad)],
                         capture_output=True, text=True)
    assert out.returncode == 0  # decoded the 16000 real samples
    assert "background" in out.stdout or ":" in out.stdout


def test_native_app_rejects_malformed_fmt_chunk(tmp_path, rng, gru_blob):
    """A wav whose fmt chunk is shorter than 16 bytes must be refused
    (the field reads would land out of bounds), not crash the app."""
    lib = os.path.join(REPO, "native", "build", "speech_commands")
    if not os.path.exists(lib):
        pytest.skip("native apps not built")
    blob = gru_blob

    bad = tmp_path / "badfmt.wav"
    fmt = struct.pack("<HHI", 1, 1, 16000)  # 8-byte fmt chunk: malformed
    with open(bad, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    out = subprocess.run([lib, "--model", blob, "--wav", str(bad)],
                         capture_output=True, text=True)
    assert out.returncode != 0
    assert "fmt" in (out.stderr + out.stdout)
