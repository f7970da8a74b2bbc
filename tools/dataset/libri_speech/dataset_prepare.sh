#!/bin/bash
# Prepare the LibriSpeech English ASR corpus as a background (not-wake-word)
# source: download, extract, flac->wav, then convert+1s-split into
# <out>/sounds/background/ via ../background_corpus/dataset_prepare.sh.
#
# Reference equivalent: tools/dataset/libri_speech/dataset_prepare.sh
# (download + audio_convert); this version additionally 1 s-splits so the
# output directory is directly usable as a training-class dir.
#
# Project link: https://www.openslr.org/12
# Mirrors for the archives below:
#   US: https://us.openslr.org/resources/12/<archive>
#   EU: https://openslr.elda.org/resources/12/<archive>
#   CN: https://openslr.magicdatatech.com/resources/12/<archive>
set -euo pipefail

OUT=${1:-libri_speech_background}
WORK=${2:-$(pwd)/libri_speech_work}
# train-clean-100 is 6.3 GB; pass DEV_ONLY=1 for the 337 MB dev-clean set
ARCHIVES=("train-clean-100.tar.gz" "dev-clean.tar.gz")
[ "${DEV_ONLY:-0}" = "1" ] && ARCHIVES=("dev-clean.tar.gz")

command -v ffmpeg >/dev/null || {
    echo "ffmpeg is required for flac->wav conversion"; exit 1; }
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$WORK"
cd "$WORK"

for archive in "${ARCHIVES[@]}"; do
    if [ ! -f "$archive" ]; then
        echo "Downloading LibriSpeech $archive..."
        wget "https://www.openslr.org/resources/12/$archive"
    fi
    echo "Extracting $archive..."
    tar xzf "$archive"
done

echo "Converting flac -> 16 kHz mono 16-bit wav..."
mkdir -p wav_corpus
find LibriSpeech -type f -name '*.flac' | while IFS= read -r f; do
    out="wav_corpus/$(basename "${f%.flac}").wav"
    # -nostdin: ffmpeg otherwise drains the while-loop's stdin (the
    # remaining file list) looking for interactive commands
    ffmpeg -nostdin -loglevel error -y -i "$f" -ar 16000 -ac 1 \
        -sample_fmt s16 "$out"
done

echo "Splitting into 1 s background clips..."
bash "$SCRIPT_DIR/../background_corpus/dataset_prepare.sh" \
    "$WORK/wav_corpus" "$OUT"

echo "Cleaning up extracted trees (archives kept for re-runs)..."
rm -rf "$WORK/LibriSpeech" "$WORK/wav_corpus"
echo "Done: $OUT/sounds/background"
