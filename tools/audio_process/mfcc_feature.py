#!/usr/bin/env python3
"""Cross-implementation MFCC comparator — the frontend parity harness.

Reference equivalent of tools/audio_process/mfcc_feature.py (which diffed
sonopy/speechpy/librosa/python_speech_features): dumps MFCC arrays from
every implementation in this framework — NumPy oracle, XLA frontend,
Pallas fused kernel, native C++ library (if built) and librosa (if
installed) — to text files for diffing, and prints max deviations.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from _common import maybe_force_jax_platform  # noqa: F401 (applies on import)
from tpu_speech_commands.data.wav import load_wav
from tpu_speech_commands.frontend import numpy_ref
from tpu_speech_commands.params import inject_params, pr


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--audio_file", required=True)
    parser.add_argument("--output_path", default=None)
    parser.add_argument("--params_path", default=None)
    args = parser.parse_args()

    if args.params_path:
        inject_params(args.params_path)

    audio = load_wav(args.audio_file, pr.sample_rate)
    padded = audio[: pr.max_samples]
    if len(padded) < pr.max_samples:
        padded = np.concatenate([np.zeros(pr.max_samples - len(padded)), padded])

    results = {}
    results["numpy_oracle"] = numpy_ref.vectorize_raw(padded)

    import jax.numpy as jnp

    from tpu_speech_commands.frontend import Frontend

    results["xla"] = np.asarray(Frontend(pr)(jnp.asarray(padded[None], jnp.float32)))[0]

    try:
        from tpu_speech_commands.ops import make_fused_frontend

        fused = make_fused_frontend(pr, batch_tile=1, interpret=True)
        results["pallas"] = np.asarray(fused(jnp.asarray(padded[None], jnp.float32)))[0]
    except Exception as e:
        print(f"pallas unavailable: {e}")

    try:
        from tpu_speech_commands.native_binding import NativeFrontend

        results["native_cpp"] = NativeFrontend(pr)(padded.astype(np.float32))
    except Exception as e:
        print(f"native_cpp unavailable: {e}")

    try:
        import librosa

        results["librosa"] = librosa.feature.mfcc(
            y=padded.astype(np.float32), sr=pr.sample_rate, n_mfcc=pr.n_mfcc
        ).T
    except ImportError:
        pass

    base = results["numpy_oracle"]
    print(f"frames x coeffs: {base.shape}")
    for name, arr in results.items():
        if args.output_path:
            os.makedirs(args.output_path, exist_ok=True)
            np.savetxt(os.path.join(args.output_path, f"mfcc_{name}.txt"), arr,
                       fmt="%.6f")
        if name == "numpy_oracle" or arr.shape != base.shape:
            note = "" if name == "numpy_oracle" else " (shape differs — not comparable)"
            print(f"{name}: shape {arr.shape}{note}")
            continue
        print(f"{name}: max |delta| vs oracle = {np.abs(arr - base).max():.3e}")


if __name__ == "__main__":
    main()
