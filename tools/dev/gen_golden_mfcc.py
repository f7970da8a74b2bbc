#!/usr/bin/env python3
"""Generate golden MFCC fixtures for frontend parity tests.

Compiles a tiny throwaway harness against the *reference* C++ DSP header
(/root/reference/inference/tflite/mfcc.h — the faithful port of the sonopy
algorithm used by the reference training pipeline) and runs it on
deterministic signals.  Only the resulting arrays are committed
(tests/fixtures/golden_mfcc.npz); no reference code enters this repo.

Run once in the dev environment:  python tools/dev/gen_golden_mfcc.py
"""
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF_HEADER_DIR = "/root/reference/inference/tflite"

HARNESS = r"""
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <cassert>
#include <algorithm>
#include "mfcc.h"

// stdin: n_samples sample_rate window hop n_fft n_mfcc n_filt, then samples
int main() {
    int n, sr, win, hop, nfft, nmfcc, nfilt;
    if (scanf("%d %d %d %d %d %d %d", &n, &sr, &win, &hop, &nfft, &nmfcc, &nfilt) != 7) return 1;
    std::vector<float> audio(n);
    for (int i = 0; i < n; i++) scanf("%f", &audio[i]);
    std::vector<std::vector<float>> feats;
    // low=0, high=sample_rate: sonopy frequency config (speech_commands.h:305-307)
    mfcc::mfcc<float>(feats, audio, sr, win, hop, nfft, nmfcc, nfilt, 0, sr,
                      false, false, false);
    printf("%zu %zu\n", feats.size(), feats.empty() ? 0 : feats[0].size());
    for (auto &row : feats) {
        for (float v : row) printf("%.10e ", v);
        printf("\n");
    }
    return 0;
}
"""


def run_reference_mfcc(audio, sr=16000, win=1024, hop=512, nfft=1024, nmfcc=20, nfilt=20, exe=None):
    inp = f"{len(audio)} {sr} {win} {hop} {nfft} {nmfcc} {nfilt}\n"
    inp += " ".join(f"{v:.10e}" for v in audio)
    out = subprocess.run([exe], input=inp, capture_output=True, text=True, check=True)
    lines = out.stdout.strip().split("\n")
    n_frames, width = map(int, lines[0].split())
    rows = [list(map(float, ln.split())) for ln in lines[1 : 1 + n_frames]]
    return np.array(rows, dtype=np.float64).reshape(n_frames, width)


def main():
    tmp = tempfile.mkdtemp()
    src = os.path.join(tmp, "harness.cpp")
    exe = os.path.join(tmp, "harness")
    with open(src, "w") as f:
        f.write(HARNESS)
    subprocess.run(
        ["g++", "-O2", "-std=c++17", f"-I{REF_HEADER_DIR}", src, "-o", exe],
        check=True,
    )

    rng = np.random.default_rng(42)
    fixtures = {}

    # 1 s of deterministic noise+tones at default params
    t = np.arange(16000) / 16000.0
    sig = (
        0.3 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 1337.0 * t)
        + 0.1 * rng.standard_normal(16000)
    ).astype(np.float32)
    fixtures["audio_default"] = sig
    fixtures["mfcc_default"] = run_reference_mfcc(sig, exe=exe)

    # short audio (left-pad semantics tested separately on padded input)
    short = sig[:7000]
    padded = np.concatenate([np.zeros(16000 - 7000, np.float32), short])
    fixtures["audio_padded"] = padded
    fixtures["mfcc_padded"] = run_reference_mfcc(padded, exe=exe)

    # alternate config: n_fft=512, 13 coeffs, 26 filters
    fixtures["mfcc_alt"] = run_reference_mfcc(
        sig, win=400, hop=160, nfft=512, nmfcc=13, nfilt=26, exe=exe
    )
    fixtures["alt_config"] = np.array([16000, 400, 160, 512, 13, 26])

    out_path = os.path.join(REPO, "tests", "fixtures", "golden_mfcc.npz")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez_compressed(out_path, **fixtures)
    print("wrote", out_path)
    for k, v in fixtures.items():
        print(" ", k, getattr(v, "shape", v))


if __name__ == "__main__":
    main()
