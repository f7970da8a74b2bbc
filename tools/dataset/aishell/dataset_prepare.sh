#!/bin/bash
# Prepare the AISHELL-1 Mandarin ASR corpus as a background (not-wake-word)
# source: download, extract the nested per-speaker tarballs, then
# convert+1s-split into <out>/sounds/background/ via
# ../background_corpus/dataset_prepare.sh.
#
# Reference equivalent: tools/dataset/aishell/dataset_prepare.sh
# (download + audio_split at 1000 ms — AISHELL wavs are already 16 kHz /
# 16-bit mono, and the shared pipeline's convert pass keeps them intact).
#
# Project link: https://www.openslr.org/33
# Mirrors for the archive below (15 GB):
#   US: https://us.openslr.org/resources/33/data_aishell.tgz
#   EU: https://openslr.elda.org/resources/33/data_aishell.tgz
#   CN: https://openslr.magicdatatech.com/resources/33/data_aishell.tgz
set -euo pipefail

OUT=${1:-aishell_background}
WORK=${2:-$(pwd)/aishell_work}

SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$WORK"
cd "$WORK"

if [ ! -f data_aishell.tgz ]; then
    echo "Downloading AISHELL speech data (15 GB)..."
    wget https://www.openslr.org/resources/33/data_aishell.tgz
fi

echo "Extracting outer archive..."
tar xzf data_aishell.tgz

echo "Extracting nested per-speaker archives..."
mkdir -p aishell_wav
for t in data_aishell/wav/*.tar.gz; do
    tar xzf "$t" -C aishell_wav
done

echo "Splitting into 1 s background clips..."
bash "$SCRIPT_DIR/../background_corpus/dataset_prepare.sh" \
    "$WORK/aishell_wav" "$OUT"

echo "Cleaning up extracted trees (archive kept for re-runs)..."
rm -rf "$WORK/data_aishell" "$WORK/aishell_wav"
echo "Done: $OUT/sounds/background"
