#!/bin/bash
# Prepare the Public Domain Sounds Backup (non-speech noise) as a
# background source: download, extract the 7z archive, then mp3->wav
# convert+1s-split into <out>/sounds/background/ via
# ../background_corpus/dataset_prepare.sh (which routes mp3 input through
# audio_process/mp3_convert.sh automatically).
#
# Reference equivalent: tools/dataset/pdsounds/dataset_prepare.sh
# (download + audio_convert of the mp3 tree).
#
# Project link: http://pdsounds.tuxfamily.org/  (525 MB archive)
set -euo pipefail

OUT=${1:-pdsounds_background}
WORK=${2:-$(pwd)/pdsounds_work}

command -v 7zr >/dev/null || command -v 7z >/dev/null || {
    echo "p7zip is required (apt install p7zip / p7zip-full)"; exit 1; }
command -v ffmpeg >/dev/null || {
    echo "ffmpeg is required for mp3->wav conversion"; exit 1; }
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$WORK"
cd "$WORK"

if [ ! -f pdsounds_march2009.7z ]; then
    echo "Downloading Public Domain Sounds Backup data..."
    wget http://downloads.tuxfamily.org/pdsounds/pdsounds_march2009.7z
fi

echo "Extracting archive..."
if command -v 7zr >/dev/null; then
    7zr x -y pdsounds_march2009.7z -opdsounds
else
    7z x -y pdsounds_march2009.7z -opdsounds
fi

echo "Converting + splitting into 1 s background clips..."
bash "$SCRIPT_DIR/../background_corpus/dataset_prepare.sh" \
    "$WORK/pdsounds" "$OUT"

echo "Cleaning up extracted tree (archive kept for re-runs)..."
rm -rf "$WORK/pdsounds"
echo "Done: $OUT/sounds/background"
