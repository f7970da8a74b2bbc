#!/usr/bin/env python3
"""Plot the mel/MFCC features the model actually sees, using the active
`pr` params (reference: tools/misc/plot_spectrogram.py)."""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from tpu_speech_commands.data.wav import load_wav
from tpu_speech_commands.frontend import numpy_ref
from tpu_speech_commands.params import inject_params, pr


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--audio_file", required=True)
    parser.add_argument("--params_path", default=None)
    parser.add_argument("--feature_type", default="mfcc",
                        choices=["mfcc", "bark"])
    parser.add_argument("--output_file", default=None)
    args = parser.parse_args()

    if args.params_path:
        inject_params(args.params_path)

    import matplotlib

    if args.output_file:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    audio = load_wav(args.audio_file, pr.sample_rate)
    feats = numpy_ref.audio_to_feature(audio, pr, frontend=args.feature_type)
    mels, _ = numpy_ref.mel_spec(
        audio[: pr.max_samples], pr.sample_rate,
        (pr.window_samples, pr.hop_samples), pr.n_fft, pr.n_filt,
    )

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    im0 = axes[0].imshow(mels.T, aspect="auto", origin="lower", cmap="magma")
    axes[0].set_title("log-mel spectrogram")
    axes[0].set_xlabel("frame")
    axes[0].set_ylabel("mel band")
    fig.colorbar(im0, ax=axes[0])
    im1 = axes[1].imshow(feats.T, aspect="auto", origin="lower", cmap="magma")
    axes[1].set_title(f"{args.feature_type} features (model input)")
    axes[1].set_xlabel("frame")
    axes[1].set_ylabel("coefficient")
    fig.colorbar(im1, ax=axes[1])
    fig.suptitle(os.path.basename(args.audio_file))
    fig.tight_layout()
    if args.output_file:
        fig.savefig(args.output_file, dpi=120)
        print(f"saved {args.output_file}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
