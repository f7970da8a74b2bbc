#!/bin/bash
# Batch-convert mp3 files to 16 kHz / 16-bit / mono wav via ffmpeg
# (reference: tools/audio_process/mp3_convert.sh).
set -euo pipefail

if [ $# -lt 2 ]; then
    echo "usage: $0 <mp3_dir> <wav_output_dir> [sample_rate]"
    exit 2
fi
command -v ffmpeg >/dev/null || { echo "ffmpeg not found"; exit 1; }

SRC=$1
DST=$2
RATE=${3:-16000}
mkdir -p "$DST"
shopt -s nullglob
for f in "$SRC"/*.mp3; do
    base=$(basename "$f" .mp3)
    ffmpeg -loglevel error -y -i "$f" -ar "$RATE" -ac 1 -sample_fmt s16 \
        "$DST/$base.wav"
    echo "$DST/$base.wav"
done
