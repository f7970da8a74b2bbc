"""The shipped pretrained/ artifacts classify the checked-in examples.

The reference ships no weights (users must train before listen.py works);
this repo ships small direction models (tools/dev/make_pretrained.py) so
the demo path works out of the box.  Guards against checkpoint-format or
runtime regressions breaking the shipped blobs.
"""
import os

import numpy as np
import pytest

from tpu_speech_commands.data.wav import load_wav
from tpu_speech_commands.export.inference_loader import load_inference_model
from tpu_speech_commands.frontend import Frontend
from tpu_speech_commands.params import pr

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRETRAINED = os.path.join(REPO, "pretrained")
CLASSES = ["background", "left", "right", "up", "down"]

ARTIFACTS = [
    f"direction_{m}.{ext}"
    for m in ("simple_cnn", "simple_cnn_lite", "simple_gru", "simple_lstm")
    for ext in ("npz", "tscm")
]


@pytest.fixture(scope="module")
def example_features():
    frontend = Frontend(pr)
    wavs = sorted(
        f for f in os.listdir(os.path.join(REPO, "example")) if f.endswith(".wav")
    )
    feats, labels = [], []
    for name in wavs:
        audio = load_wav(os.path.join(REPO, "example", name))[: pr.max_samples]
        # left-zero-pad: the framework-wide contract (command at buffer tail)
        audio = np.pad(audio, (max(0, pr.max_samples - len(audio)), 0))
        feats.append(np.asarray(frontend(audio)))
        labels.append(CLASSES.index(name.rsplit("_", 1)[0]))
    return np.stack(feats), np.asarray(labels)


@pytest.mark.parametrize("artifact", ARTIFACTS)
def test_pretrained_classifies_examples(artifact, example_features):
    path = os.path.join(PRETRAINED, artifact)
    if not os.path.exists(path):
        pytest.skip(f"{artifact} not present")
    if artifact.endswith(".tscm") and not os.path.exists(
        os.path.join(REPO, "native", "build", "libtsc.so")
    ):
        pytest.skip("native runtime not built")
    feats, labels = example_features
    predict_fn, _ = load_inference_model(path)
    preds = np.argmax(np.asarray(predict_fn(feats)), axis=-1)
    assert (preds == labels).all(), [
        (CLASSES[p], CLASSES[t]) for p, t in zip(preds, labels)
    ]
