"""Shared helpers for the audio_process CLI suite."""
import os
import sys
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def maybe_force_jax_platform():
    """Honor JAX_PLATFORMS before any jax usage — the axon TPU plugin
    ignores the env var, so tools apply it via the config knob (prevents
    CPU-only tools from contending for the single TPU chip)."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)


maybe_force_jax_platform()

from tpu_speech_commands.data.wav import load_wav, save_audio, wav_duration_samples  # noqa: E402,F401


def iter_wavs(path: str):
    """Yield wav paths from a file or directory."""
    if os.path.isdir(path):
        yield from sorted(glob(os.path.join(path, "**", "*.wav"), recursive=True))
    else:
        yield path


def out_path(output_dir: str, src_path: str, input_root: str | None = None) -> str:
    """Destination path for a processed wav.

    When input_root is a directory containing src_path, the relative
    subpath is preserved — a recursively-globbed corpus (class/name.wav
    trees) would otherwise collapse to basenames and silently overwrite
    same-named files from different classes."""
    rel = os.path.basename(src_path)
    if input_root and os.path.isdir(input_root):
        try:
            cand = os.path.relpath(os.path.abspath(src_path),
                                   os.path.abspath(input_root))
            if not cand.startswith(".."):
                rel = cand
        except ValueError:  # different drive (windows)
            pass
    dst = os.path.join(output_dir, rel)
    os.makedirs(os.path.dirname(dst) or output_dir, exist_ok=True)
    return dst
