#!/bin/bash
# Prepare a background (not-wake-word) corpus from any wav/mp3 collection:
# convert to 16 kHz mono 16-bit and split into 1 s clips under
# <out>/sounds/background/.
# (Reference equivalent of tools/dataset/{libri_speech,aishell,pdsounds}/
# dataset_prepare.sh, generalised: those scripts only download a corpus and
# run the same convert+split pipeline.)
set -euo pipefail

if [ $# -lt 2 ]; then
    echo "usage: $0 <audio_src_dir> <output_dir> [sample_rate]"
    exit 2
fi
SRC=$1
OUT=$2
RATE=${3:-16000}
TOOLS_DIR="$(cd "$(dirname "$0")/../../audio_process" && pwd)"

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

# mp3 -> wav when ffmpeg is available and mp3s exist (recursive; a mixed
# wav+mp3 source keeps BOTH: converted mp3s land in $TMP/wav and the
# original wavs still flow through audio_convert from $SRC)
if [ -n "$(find "$SRC" -type f -name '*.mp3' -print -quit)" ] \
        && command -v ffmpeg >/dev/null; then
    bash "$TOOLS_DIR/mp3_convert.sh" "$SRC" "$TMP/wav" "$RATE"
    python3 "$TOOLS_DIR/audio_convert.py" --input_path "$TMP/wav" \
        --output_path "$TMP/converted" --sample_rate "$RATE"
fi

if [ -n "$(find "$SRC" -type f -name '*.wav' -print -quit)" ]; then
    python3 "$TOOLS_DIR/audio_convert.py" --input_path "$SRC" \
        --output_path "$TMP/converted" --sample_rate "$RATE"
fi
if [ ! -d "$TMP/converted" ]; then
    echo "no wav or mp3 files found under $SRC"
    exit 1
fi

python3 "$TOOLS_DIR/audio_split.py" --input_path "$TMP/converted" \
    --output_path "$OUT/sounds/background" --chunk_time 1.0 \
    --sample_rate "$RATE"
echo "background corpus ready under $OUT/sounds/background"
