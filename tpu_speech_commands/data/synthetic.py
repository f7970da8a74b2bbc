"""Synthetic speech-commands-style dataset generation.

Builds a reference-layout dataset (``<root>/sounds/<class>/*.wav``) of
distinguishable synthetic signals — per-class tone chords over noise — for
integration tests, demos, and benchmarking without downloading Google
Speech Commands.  'background' is pure noise.
"""
from __future__ import annotations

import os
import zlib

import numpy as np

from ..params import pr
from .wav import save_audio

# two characteristic tones per command class
_CLASS_TONES = {
    "left": (400.0, 900.0),
    "right": (600.0, 1500.0),
    "up": (800.0, 2200.0),
    "down": (300.0, 1100.0),
    "yes": (500.0, 1800.0),
    "no": (700.0, 1300.0),
    "stop": (950.0, 2600.0),
    "go": (350.0, 1650.0),
}


def synth_command_audio(
    class_name: str, rng: np.random.Generator, n_samples: int | None = None,
    sample_rate: int | None = None,
) -> np.ndarray:
    """One synthetic utterance, float32 in [-1, 1]."""
    sr = sample_rate or pr.sample_rate
    n = n_samples or pr.max_samples
    t = np.arange(n) / sr
    noise = 0.02 * rng.standard_normal(n)
    if class_name == "background":
        return (noise + 0.01 * np.sin(2 * np.pi * rng.uniform(50, 4000) * t)).astype(
            np.float32
        )
    tones = _CLASS_TONES.get(class_name)
    if tones is None:
        # stable across processes (builtin hash() is salted per process,
        # which would break seed-reproducibility for custom class lists)
        digest = zlib.crc32(class_name.encode("utf-8"))
        base = 300.0 + 137.0 * (digest % 23)
        tones = (base, base * 2.7)
    jitter = rng.uniform(0.97, 1.03)
    env = np.hanning(n)  # utterance-shaped envelope
    sig = sum(
        rng.uniform(0.15, 0.3) * np.sin(2 * np.pi * f * jitter * t + rng.uniform(0, 6))
        for f in tones
    )
    return (env * sig + noise).astype(np.float32)


def make_synthetic_dataset(
    root: str,
    class_names: list[str],
    samples_per_class: int = 8,
    seed: int = 0,
    duration_jitter: bool = True,
) -> str:
    """Write a reference-layout wav dataset; returns root."""
    rng = np.random.default_rng(seed)
    for class_name in class_names:
        class_dir = os.path.join(root, "sounds", class_name)
        os.makedirs(class_dir, exist_ok=True)
        for i in range(samples_per_class):
            n = pr.max_samples
            if duration_jitter and i % 3 == 1:
                n = int(pr.max_samples * rng.uniform(0.6, 1.0))  # short clip
            audio = synth_command_audio(class_name, rng, n)
            save_audio(os.path.join(class_dir, f"{class_name}_{i}.wav"), audio)
    return root
