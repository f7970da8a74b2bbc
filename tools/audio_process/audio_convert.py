#!/usr/bin/env python3
"""Convert wav files to a target sample rate / mono / 16-bit
(reference: tools/audio_process/audio_convert.py, used by every
dataset_prepare.sh).  Stdlib wave + scipy polyphase resampling."""
import argparse

from _common import iter_wavs, load_wav, out_path, save_audio


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_path", required=True)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--sample_rate", type=int, default=16000)
    args = parser.parse_args()

    for wav_file in iter_wavs(args.input_path):
        audio = load_wav(wav_file, args.sample_rate, mono=True)
        dst = out_path(args.output_path, wav_file, args.input_path)
        save_audio(dst, audio, args.sample_rate)
        print(dst)


if __name__ == "__main__":
    main()
