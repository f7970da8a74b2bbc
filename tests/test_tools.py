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
