#!/usr/bin/env python3
"""Play a wav file (PyAudio-gated; reference: tools/audio_process/wav_play.py).
Thin alias of audio_play.py kept for reference CLI-name parity."""
from audio_play import main

if __name__ == "__main__":
    main()
