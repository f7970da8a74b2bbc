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
# recursive: corpora usually nest mp3s (artist/album/track.mp3); keep the
# relative subpath so same-named files in different dirs don't collide
find "$SRC" -type f -name '*.mp3' | while IFS= read -r f; do
    rel=${f#"$SRC"/}
    out="$DST/${rel%.mp3}.wav"
    mkdir -p "$(dirname "$out")"
    # -nostdin: ffmpeg otherwise drains the while-loop's stdin (the
    # remaining file list) looking for interactive commands
    ffmpeg -nostdin -loglevel error -y -i "$f" -ar "$RATE" -ac 1 \
        -sample_fmt s16 "$out"
    echo "$out"
done
