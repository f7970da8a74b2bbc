#!/bin/bash
# Download Google Speech Commands v0.02 and arrange it into the framework's
# dataset layout (<out>/sounds/<class>/*.wav), splitting out train/val/test
# with the official validation_list.txt / testing_list.txt.
# (Reference equivalent: tools/dataset/speech_commands/dataset_prepare.sh.)
set -euo pipefail

if [ $# -lt 1 ]; then
    echo "usage: $0 <output_dir> [class: all|<word,word,...>]"
    exit 2
fi
OUT=$1
CLASSES=${2:-all}
URL="http://download.tensorflow.org/data/speech_commands_v0.02.tar.gz"
RAW="$OUT/raw"

mkdir -p "$RAW"
if [ ! -f "$RAW/.downloaded" ]; then
    echo "downloading Google Speech Commands v0.02..."
    curl -L "$URL" -o "$OUT/speech_commands_v0.02.tar.gz"
    tar -xzf "$OUT/speech_commands_v0.02.tar.gz" -C "$RAW"
    touch "$RAW/.downloaded"
fi

python3 - "$RAW" "$OUT" "$CLASSES" <<'EOF'
import os, shutil, sys
raw, out, classes = sys.argv[1], sys.argv[2], sys.argv[3]

val = set(open(os.path.join(raw, "validation_list.txt")).read().split())
test = set(open(os.path.join(raw, "testing_list.txt")).read().split())

words = sorted(
    d for d in os.listdir(raw)
    if os.path.isdir(os.path.join(raw, d)) and not d.startswith("_")
)
if classes != "all":
    keep = set(classes.split(","))
    words = [w for w in words if w in keep]

for split in ("train", "val", "test"):
    for word in words + ["background"]:
        os.makedirs(os.path.join(out, split, "sounds", word), exist_ok=True)

for word in words:
    for wav in os.listdir(os.path.join(raw, word)):
        rel = f"{word}/{wav}"
        split = "val" if rel in val else "test" if rel in test else "train"
        shutil.copy(os.path.join(raw, rel),
                    os.path.join(out, split, "sounds", word, wav))

# background noise: split the long _background_noise_ wavs into 1 s clips
noise_dir = os.path.join(raw, "_background_noise_")
if os.path.isdir(noise_dir):
    import wave
    import numpy as np
    for wav in os.listdir(noise_dir):
        if not wav.endswith(".wav"):
            continue
        with wave.open(os.path.join(noise_dir, wav), "rb") as wf:
            rate = wf.getframerate()
            data = np.frombuffer(wf.readframes(wf.getnframes()), "<i2")
        n = len(data) // rate
        for i in range(n):
            split = "val" if i % 10 == 8 else "test" if i % 10 == 9 else "train"
            dst = os.path.join(out, split, "sounds", "background",
                               f"{os.path.splitext(wav)[0]}_{i}.wav")
            with wave.open(dst, "wb") as wo:
                wo.setnchannels(1); wo.setsampwidth(2); wo.setframerate(rate)
                wo.writeframes(data[i * rate:(i + 1) * rate].tobytes())
print("dataset ready under", out, "(train/val/test)")
EOF
