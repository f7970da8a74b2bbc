#!/usr/bin/env python3
"""Extract voice clips from long recordings via energy VAD
(reference: tools/audio_process/vad_clip.py, which used a Conv-VAD model;
this uses the energy-band VAD from speech_duration_check)."""
import argparse
import os

import numpy as np

from _common import iter_wavs, load_wav, save_audio
from speech_duration_check import VoiceActivityDetector


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_path", required=True)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--sample_rate", type=int, default=16000)
    parser.add_argument("--min_clip_t", type=float, default=0.3)
    parser.add_argument("--pad_t", type=float, default=0.1,
                        help="context padding around each clip (seconds)")
    args = parser.parse_args()

    os.makedirs(args.output_path, exist_ok=True)
    vad = VoiceActivityDetector(args.sample_rate)
    for wav_file in iter_wavs(args.input_path):
        audio = load_wav(wav_file, args.sample_rate)
        active = vad.detect(audio)
        stem = os.path.splitext(os.path.basename(wav_file))[0]
        # contiguous active runs -> clips
        clip_idx = 0
        i = 0
        n = len(active)
        while i < n:
            if not active[i]:
                i += 1
                continue
            j = i
            while j < n and active[j]:
                j += 1
            start = max(0, int(i * vad.frame - args.pad_t * args.sample_rate))
            end = min(len(audio), int(j * vad.frame + args.pad_t * args.sample_rate))
            if (end - start) / args.sample_rate >= args.min_clip_t:
                dst = os.path.join(args.output_path, f"{stem}_clip{clip_idx}.wav")
                save_audio(dst, audio[start:end], args.sample_rate)
                print(dst)
                clip_idx += 1
            i = j
    print("done")


if __name__ == "__main__":
    main()
