"""Smoke tests for the audio_process / misc tool CLIs (run as subprocesses,
like users do)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools", "audio_process")


def run_tool(script, *args, cwd=TOOLS):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(cwd, script), *args],
        capture_output=True, text=True, check=True, env=env, cwd=cwd,
    )


@pytest.fixture()
def wav_dir(tmp_path):
    from tpu_speech_commands.data.wav import save_audio

    rng = np.random.default_rng(0)
    d = tmp_path / "wavs"
    d.mkdir()
    t = np.arange(16000) / 16000.0
    for i, freq in enumerate([300, 900]):
        audio = 0.4 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(16000)
        save_audio(str(d / f"tone_{i}.wav"), audio.astype(np.float32))
    # a quiet file for silent_check
    save_audio(str(d / "quiet.wav"), np.zeros(16000, np.float32))
    return d


def test_white_noise_and_add_noise(tmp_path, wav_dir):
    noise_dir = tmp_path / "noise"
    run_tool("white_noise.py", "--output_path", str(noise_dir), "--count", "2",
             "--seed", "1")
    assert len(os.listdir(noise_dir)) == 2
    out = tmp_path / "noisy"
    run_tool("add_noise.py", "--voice_path", str(wav_dir), "--noise_path",
             str(noise_dir), "--output_path", str(out), "--snr", "10",
             "--seed", "2")
    assert len(os.listdir(out)) == 3


def test_wav_filter(tmp_path, wav_dir):
    out = tmp_path / "filtered"
    run_tool("wav_filter.py", "--input_path", str(wav_dir), "--output_path",
             str(out), "--filter_type", "lowpass", "--cutoff", "500")
    from tpu_speech_commands.data.wav import load_wav

    # 900 Hz tone heavily attenuated by the 500 Hz low-pass
    orig = load_wav(str(wav_dir / "tone_1.wav"))
    filt = load_wav(str(out / "tone_1.wav"))
    assert np.abs(filt[2000:]).mean() < 0.3 * np.abs(orig[2000:]).mean()


def test_audio_split_and_convert(tmp_path, wav_dir):
    out = tmp_path / "split"
    run_tool("audio_split.py", "--input_path", str(wav_dir / "tone_0.wav"),
             "--output_path", str(out), "--chunk_time", "0.25")
    assert len(os.listdir(out)) == 4
    conv = tmp_path / "conv"
    run_tool("audio_convert.py", "--input_path", str(out), "--output_path",
             str(conv), "--sample_rate", "8000")
    from tpu_speech_commands.data.wav import wav_duration_samples

    n, rate = wav_duration_samples(os.path.join(conv, os.listdir(conv)[0]))
    assert rate == 8000 and n == 2000


def test_audio_convert_preserves_subdirs(tmp_path):
    """Same-named wavs in different class subdirs must not overwrite each
    other in the output (out_path keeps the relative subpath)."""
    from tpu_speech_commands.data.wav import save_audio

    src = tmp_path / "corpus"
    for cls in ("bed", "cat"):
        (src / cls).mkdir(parents=True)
        save_audio(str(src / cls / "0a7c2a8d_nohash_0.wav"),
                   np.zeros(8000, np.float32))
    out = tmp_path / "conv_tree"
    run_tool("audio_convert.py", "--input_path", str(src),
             "--output_path", str(out), "--sample_rate", "16000")
    assert (out / "bed" / "0a7c2a8d_nohash_0.wav").exists()
    assert (out / "cat" / "0a7c2a8d_nohash_0.wav").exists()


@pytest.fixture()
def ramp_wav(tmp_path):
    """16 kHz mono ramp written as exact int16 samples (no float encode
    step), so conversions can be checked against a known grid."""
    import wave

    q = np.linspace(-30000, 30000, 16000).astype("<i2")
    path = tmp_path / "ramp.wav"
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(q.tobytes())
    return path, q.astype(np.float32) / 32768.0


# 8-bit: encode *127, decode /128 (the unsigned-wav convention) plus
# truncation -> worst case ~|x|/128 + 1/128
@pytest.mark.parametrize("bits,tol", [(8, 2 / 128 + 1e-6),
                                      (24, 3e-7), (32, 1e-6)])
def test_audio_convert_bit_depths_round_trip(tmp_path, ramp_wav, bits, tol):
    """--sample_bit 8/24/32 encode, decoded back by the independent
    load_wav codec (shift-based 24-bit decode vs the tool's view-slice
    encode), must reproduce the source to the bit depth's quantization."""
    import wave

    path, src = ramp_wav
    out = tmp_path / f"b{bits}"
    run_tool("audio_convert.py", "--input_path", str(path),
             "--output_path", str(out), "--sample_bit", str(bits))
    from tpu_speech_commands.data.wav import load_wav

    with wave.open(str(out / "ramp.wav"), "rb") as wf:
        assert wf.getsampwidth() == bits // 8
        assert wf.getframerate() == 16000
    got = load_wav(str(out / "ramp.wav"), 16000)
    assert np.abs(got - src).max() <= tol


def test_audio_convert_24bit_exact_bytes(tmp_path):
    """Little-endian 24-bit packing pinned on exactly-representable
    values: ±1.0/0.5/0.25/0 map to the hand-computed 3-byte patterns
    (sign extension + byte order are exactly the silent-failure spots)."""
    import wave

    q = np.array([-32768, 16384, 8192, 0], "<i2")  # -1.0, 0.5, 0.25, 0
    path = tmp_path / "pts.wav"
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(q.tobytes())
    out = tmp_path / "out24"
    run_tool("audio_convert.py", "--input_path", str(path),
             "--output_path", str(out), "--sample_bit", "24")
    with wave.open(str(out / "pts.wav"), "rb") as wf:
        raw = wf.readframes(wf.getnframes())
    # int(x * (2**23 - 1)) truncated toward zero, little-endian
    assert raw == bytes([0x01, 0x00, 0x80,   # -8388607
                         0xFF, 0xFF, 0x3F,   # 4194303
                         0xFF, 0xFF, 0x1F,   # 2097151
                         0x00, 0x00, 0x00])


def test_audio_convert_loudness(tmp_path, ramp_wav):
    path, _ = ramp_wav
    out = tmp_path / "loud"
    run_tool("audio_convert.py", "--input_path", str(path),
             "--output_path", str(out), "--loudness", "-20")
    from tpu_speech_commands.data.wav import load_wav

    got = load_wav(str(out / "ramp.wav"), 16000)
    dbfs = 20 * np.log10(np.sqrt((got ** 2).mean()))
    assert abs(dbfs - (-20.0)) < 0.05


def test_audio_convert_clip_length(tmp_path, ramp_wav):
    """clip_length: tail-clip when long, head-pad with silence when
    short (the command sits at the buffer tail — pad_audio semantics)."""
    path, src = ramp_wav
    from tpu_speech_commands.data.wav import load_wav

    short = tmp_path / "clip500"
    run_tool("audio_convert.py", "--input_path", str(path),
             "--output_path", str(short), "--clip_length", "500")
    got = load_wav(str(short / "ramp.wav"), 16000)
    assert len(got) == 8000
    assert np.abs(got - src[-8000:]).max() <= 2 / 32768  # the LAST 500 ms

    longer = tmp_path / "clip1500"
    run_tool("audio_convert.py", "--input_path", str(path),
             "--output_path", str(longer), "--clip_length", "1500")
    got = load_wav(str(longer / "ramp.wav"), 16000)
    assert len(got) == 24000
    assert np.abs(got[:8000]).max() == 0  # head-padded with silence
    assert np.abs(got[8000:] - src).max() <= 2 / 32768


def test_audio_convert_white_noise_pad_scale(tmp_path, ramp_wav):
    """--fill_white_noise uses the reference's bit-fraction convention
    (audio_convert.py:46-53): scale = 2**int(sample_bit*amplitude)
    counts — 2**11/32768 ≈ 0.0625 at 16-bit/0.7, NOT amplitude*full
    scale (which would be 11x larger)."""
    path, src = ramp_wav
    out = tmp_path / "noisy"
    run_tool("audio_convert.py", "--input_path", str(path),
             "--output_path", str(out), "--clip_length", "1500",
             "--fill_white_noise", "--seed", "3")
    from tpu_speech_commands.data.wav import load_wav

    got = load_wav(str(out / "ramp.wav"), 16000)
    pad = got[:8000]
    scale = 2 ** 11 / 32768.0  # truncnorm support is [-scale, scale]
    assert 0 < np.abs(pad).max() <= scale + 1 / 32768
    assert 0.3 * scale < pad.std() < 0.8 * scale  # std(truncnorm(-1,1)) ~ 0.54
    assert np.abs(got[8000:] - src).max() <= 2 / 32768


def test_audio_convert_raw_pcm(tmp_path, ramp_wav):
    """Headerless .pcm decode: direct file path AND inside a directory
    (globbed alongside *.wav); missing decode params refuse clearly."""
    _, src = ramp_wav
    from tpu_speech_commands.data.wav import load_wav

    indir = tmp_path / "rawin" / "sub"
    indir.mkdir(parents=True)
    pcm = indir / "tail.pcm"
    pcm.write_bytes((src[-4000:] * 32768).astype("<i2").tobytes())

    direct = tmp_path / "direct"
    run_tool("audio_convert.py", "--input_path", str(pcm),
             "--output_path", str(direct), "--sample_rate", "16000",
             "--channel_num", "1")
    got = load_wav(str(direct / "tail.wav"), 16000)
    assert np.abs(got - src[-4000:]).max() <= 2 / 32768

    tree = tmp_path / "tree"
    run_tool("audio_convert.py", "--input_path", str(tmp_path / "rawin"),
             "--output_path", str(tree), "--sample_rate", "16000",
             "--channel_num", "1")
    assert (tree / "sub" / "tail.wav").exists()

    with pytest.raises(subprocess.CalledProcessError) as err:
        run_tool("audio_convert.py", "--input_path", str(tmp_path / "rawin"),
                 "--output_path", str(tmp_path / "nope"))
    assert "--sample_rate and --channel_num" in err.value.stderr


def test_audio_convert_mp3_gate(tmp_path, ramp_wav):
    """--target_format mp3 needs ffmpeg: converts when present, refuses
    with an actionable message when not."""
    import shutil

    path, _ = ramp_wav
    out = tmp_path / "mp3"
    if shutil.which("ffmpeg"):
        run_tool("audio_convert.py", "--input_path", str(path),
                 "--output_path", str(out), "--target_format", "mp3")
        assert (out / "ramp.mp3").stat().st_size > 0
    else:
        with pytest.raises(subprocess.CalledProcessError) as err:
            run_tool("audio_convert.py", "--input_path", str(path),
                     "--output_path", str(out), "--target_format", "mp3")
        assert "ffmpeg" in err.value.stderr


def test_background_corpus_prepare_script(tmp_path, wav_dir):
    """The generalized dataset_prepare.sh (wav-only source, no ffmpeg in
    this image): converts + splits into <out>/sounds/background 1 s clips."""
    out = tmp_path / "corpus_out"
    script = os.path.join(REPO, "tools", "dataset", "background_corpus",
                          "dataset_prepare.sh")
    subprocess.run(["bash", script, str(wav_dir), str(out)],
                   capture_output=True, text=True, check=True)
    clips = os.listdir(out / "sounds" / "background")
    assert len(clips) >= 2  # three 1 s inputs -> >= one clip each
    from tpu_speech_commands.data.wav import wav_duration_samples

    n, rate = wav_duration_samples(
        str(out / "sounds" / "background" / clips[0]))
    assert rate == 16000 and n == 16000


def test_aishell_prepare_script_post_download(tmp_path, wav_dir):
    """The AISHELL per-corpus wrapper, exercised from a fake pre-downloaded
    data_aishell.tgz (the script skips wget when the archive exists):
    nested per-speaker tarballs -> 1 s clips under <out>/sounds/background."""
    import tarfile

    # fake archive layout: data_aishell/wav/S0002.tar.gz each holding wavs
    stage = tmp_path / "stage" / "data_aishell" / "wav"
    stage.mkdir(parents=True)
    inner_src = tmp_path / "inner" / "S0002"
    inner_src.mkdir(parents=True)
    import shutil

    for i, w in enumerate(sorted(os.listdir(wav_dir))):
        shutil.copy(os.path.join(wav_dir, w), inner_src / f"BAC{i}.wav")
    with tarfile.open(stage / "S0002.tar.gz", "w:gz") as t:
        t.add(inner_src, arcname="S0002")
    work = tmp_path / "work"
    work.mkdir()
    with tarfile.open(work / "data_aishell.tgz", "w:gz") as t:
        t.add(tmp_path / "stage" / "data_aishell", arcname="data_aishell")

    out = tmp_path / "corpus_out"
    script = os.path.join(REPO, "tools", "dataset", "aishell",
                          "dataset_prepare.sh")
    result = subprocess.run(["bash", script, str(out), str(work)],
                            capture_output=True, text=True)
    assert result.returncode == 0, result.stderr
    clips = os.listdir(out / "sounds" / "background")
    assert len(clips) >= 2
    # work tree cleaned but the archive kept for re-runs
    assert (work / "data_aishell.tgz").exists()
    assert not (work / "aishell_wav").exists()


def test_corpus_prepare_scripts_fail_cleanly_without_tools(tmp_path):
    """libri_speech/pdsounds wrappers need ffmpeg (absent in this image):
    they must exit non-zero with an actionable message, not half-run."""
    for corpus, needle in (("libri_speech", "ffmpeg"),
                           ("pdsounds", "p7zip|ffmpeg")):
        script = os.path.join(REPO, "tools", "dataset", corpus,
                              "dataset_prepare.sh")
        result = subprocess.run(
            ["bash", script, str(tmp_path / "out"), str(tmp_path / "work")],
            capture_output=True, text=True,
        )
        assert result.returncode != 0
        import re

        assert re.search(needle, result.stdout + result.stderr), (
            corpus, result.stdout, result.stderr)


def test_silent_check(wav_dir):
    result = run_tool("silent_check.py", "--input_path", str(wav_dir))
    assert "SILENT" in result.stdout and "quiet.wav" in result.stdout
    assert "1/3 silent" in result.stdout


def test_wav_check(wav_dir):
    result = run_tool("wav_check.py", "--input_path", str(wav_dir))
    assert "3 files, 0 bad format" in result.stdout


def test_speech_duration_and_vad_clip(tmp_path):
    from tpu_speech_commands.data.wav import save_audio

    rng = np.random.default_rng(3)
    # 0.5 s silence + 1 s loud tone + 0.5 s silence
    t = np.arange(16000) / 16000.0
    speech = 0.5 * np.sin(2 * np.pi * 400 * t)
    audio = np.concatenate([
        0.001 * rng.standard_normal(8000), speech,
        0.001 * rng.standard_normal(8000),
    ]).astype(np.float32)
    src = tmp_path / "long.wav"
    save_audio(str(src), audio)

    result = run_tool("speech_duration_check.py", "--input_path", str(src))
    assert "speech 0.5" in result.stdout

    out = tmp_path / "clips"
    run_tool("vad_clip.py", "--input_path", str(src), "--output_path", str(out))
    assert len(os.listdir(out)) >= 1


def test_vad_clip_with_learned_model(tmp_path):
    """--model_path: learned VAD (reference used a Conv-VAD Keras model;
    here any framework checkpoint scores speech as 1 - P(background)).
    The shipped pretrained direction model must flag the frame containing
    a synthesized command word but not the pure-noise frames."""
    from tpu_speech_commands.data.wav import load_wav, save_audio

    rng = np.random.default_rng(5)
    word = load_wav(os.path.join(REPO, "example", "left_1.wav"), 16000)
    audio = np.concatenate([
        0.002 * rng.standard_normal(32000), word[-16000:],
        0.002 * rng.standard_normal(32000),
    ]).astype(np.float32)
    src = tmp_path / "long.wav"
    save_audio(str(src), audio)

    out = tmp_path / "clips"
    run_tool(
        "vad_clip.py", "--input_path", str(src), "--output_path", str(out),
        "--model_path",
        os.path.join(REPO, "pretrained", "direction_simple_gru.npz"),
    )
    clips = os.listdir(out)
    # exactly the word second is voiced: one clip, not the noise frames
    assert len(clips) >= 1, clips
    total = sum(
        len(load_wav(str(out / c), 16000)) for c in clips
    )
    assert total <= 2 * 16000, (clips, total)  # noise frames not flagged


def test_wav_merge_and_reverb(tmp_path, wav_dir):
    out = tmp_path / "merged"
    run_tool("wav_merge.py", "--voice_path", str(wav_dir / "tone_0.wav"),
             "--noise_path", str(wav_dir / "tone_1.wav"),
             "--output_path", str(out), "--volume_ratio", "0.5")
    assert os.listdir(out) == ["tone_0.wav"]
    rev = tmp_path / "reverb"
    run_tool("audio_reverberation.py", "--input_path", str(wav_dir / "tone_0.wav"),
             "--output_path", str(rev), "--seed", "1")
    assert os.listdir(rev) == ["tone_0.wav"]


def test_annotation_update(tmp_path):
    import json

    src = tmp_path / "ann.jsonl"
    src.write_text(json.dumps({"audio_filepath": "/old/a.wav", "text": "x"}) + "\n")
    dst = tmp_path / "out.jsonl"
    run_tool("annotation_update.py", "--annotation_file", str(src),
             "--output_file", str(dst), "--old_prefix", "/old",
             "--new_prefix", "/new")
    assert json.loads(dst.read_text())["audio_filepath"] == "/new/a.wav"


def test_mfcc_feature_comparator(tmp_path, wav_dir):
    result = run_tool("mfcc_feature.py", "--audio_file", str(wav_dir / "tone_0.wav"),
                      "--output_path", str(tmp_path / "cmp"))
    assert "xla: max |delta| vs oracle" in result.stdout
    assert os.path.exists(tmp_path / "cmp" / "mfcc_numpy_oracle.txt")


def test_plot_tools(tmp_path, wav_dir):
    misc = os.path.join(REPO, "tools", "misc")
    out = tmp_path / "plot.png"
    run_tool("plot_audio.py", "--audio_file", str(wav_dir / "tone_0.wav"),
             "--output_file", str(out), cwd=misc)
    assert out.exists()
    out2 = tmp_path / "spec.png"
    run_tool("plot_spectrogram.py", "--audio_file", str(wav_dir / "tone_0.wav"),
             "--output_file", str(out2), cwd=misc)
    assert out2.exists()


def test_speech_command_split(tmp_path):
    """VAD segmentation: wake+command recordings split to the command
    segment; undetectable files land in the backup dir."""
    from tpu_speech_commands.data.wav import load_wav, save_audio

    sr = 16000
    rng = np.random.default_rng(3)
    t = lambda n: np.arange(n) / sr  # noqa: E731

    def tone(seconds, freq):
        return 0.5 * np.sin(2 * np.pi * freq * t(int(sr * seconds)))

    def silence(seconds):
        return 0.002 * rng.standard_normal(int(sr * seconds))

    raw = tmp_path / "raw"
    raw.mkdir()
    # wake word (0.5-1.1s) then command (2.0-2.8s)
    rec = np.concatenate([
        silence(0.5), tone(0.6, 500), silence(0.9), tone(0.8, 700),
        silence(0.5),
    ]).astype(np.float32)
    save_audio(str(raw / "good.wav"), rec, sample_rate=sr)
    # a single long tone: only one segment -> goes to backup
    save_audio(str(raw / "bad.wav"),
               np.concatenate([silence(0.3), tone(2.0, 600), silence(0.3)])
               .astype(np.float32), sample_rate=sr)

    # single-file mode prints the detected sections
    out = run_tool("speech_command_split.py", "--wav_path",
                   str(raw / "good.wav"))
    assert "speech sections" in out.stdout
    assert out.stdout.count("speech_begin") == 2

    # directory mode: split + backup
    split_dir, backup_dir = tmp_path / "split", tmp_path / "backup"
    out = run_tool(
        "speech_command_split.py", "--wav_path", str(raw),
        "--split_output_path", str(split_dir),
        "--backup_path", str(backup_dir),
    )
    assert "number of split wav file: 1" in out.stdout
    assert (split_dir / "good.wav").exists()
    assert (backup_dir / "bad.wav").exists()

    # the extracted clip contains the command tone (700 Hz), and with the
    # default 1 s head slack it is shorter than the original recording
    clip = load_wav(str(split_dir / "good.wav"), sample_rate=sr)
    assert len(clip) < len(rec)
    spec = np.abs(np.fft.rfft(clip))
    freqs = np.fft.rfftfreq(len(clip), 1 / sr)
    assert abs(freqs[spec.argmax()] - 700) < 20


def test_wav_play_info(wav_dir):
    # --info_only exercises the header dump + chunk preload without an
    # output device (PyAudio playback itself stays gated)
    out = run_tool("wav_play.py", "--wav_path", str(wav_dir),
                   "--info_only", "--chunk_size", "512")
    assert out.stdout.count("sample rate: 16000") == 3
    assert "total frames: 16000" in out.stdout
    assert "duration seconds: 1.0 s" in out.stdout
    assert "Playing (1/3)" in out.stdout and "Done" in out.stdout
