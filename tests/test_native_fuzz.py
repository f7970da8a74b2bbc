"""Byte-corruption fuzz: the hardened native loader must never crash.

Every mutated .tscm either loads (returns a model) or raises a clean
RuntimeError — no aborts, no silent zero-filled kernels (model.cc load
bounds/stream checks), no UB.  Mirrors the robustness intent of the
reference's corrupt-model handling in its TFLite/MNN loaders.
"""
import os
import struct

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def blob(tmp_path_factory):
    if not os.path.exists(os.path.join(REPO, "native", "build", "libtsc.so")):
        pytest.skip("native runtime not built")
    import jax

    from tpu_speech_commands.export.native_format import export_native
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.params import pr
    from tpu_speech_commands.training import create_train_state, save_checkpoint

    tmp = tmp_path_factory.mktemp("fuzz")
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    _, state = create_train_state("simple_gru", 3, tx, jax.random.PRNGKey(0))
    ckpt = str(tmp / "m.npz")
    save_checkpoint(ckpt, state, {"model_type": "simple_gru", "num_classes": 3,
                                  "classes": ["background", "a", "b"],
                                  "params": pr.to_dict()})
    path = str(tmp / "m.tscm")
    export_native(ckpt, path)
    return open(path, "rb").read()


def test_fuzz_truncations(blob, tmp_path):
    from tpu_speech_commands.native_binding import NativeModel

    rng = np.random.default_rng(0)
    cuts = sorted(set(int(c) for c in rng.integers(0, len(blob), 40)))
    for cut in cuts:
        p = tmp_path / f"t{cut}.tscm"
        p.write_bytes(blob[:cut])
        try:
            NativeModel(str(p))
        except RuntimeError:
            pass  # clean rejection is the expected outcome


def test_fuzz_byte_flips(blob, tmp_path):
    from tpu_speech_commands.native_binding import NativeModel

    rng = np.random.default_rng(1)
    for trial in range(40):
        data = bytearray(blob)
        for pos in rng.integers(0, len(data), 4):
            data[int(pos)] ^= int(rng.integers(1, 256))
        p = tmp_path / f"f{trial}.tscm"
        p.write_bytes(bytes(data))
        try:
            m = NativeModel(str(p))
            # a model that loads must also predict without crashing
            m.predict(np.zeros((30, 20), np.float32))
        except RuntimeError:
            pass


def test_fuzz_header_fields(tmp_path):
    """Hostile header values (huge meta_len/name_len/ndim/dims) must be
    rejected before they become multi-GB allocations."""
    if not os.path.exists(os.path.join(REPO, "native", "build", "libtsc.so")):
        pytest.skip("native runtime not built")  # else ImportError, not
        # the RuntimeError rejection this test asserts
    from tpu_speech_commands.native_binding import NativeModel

    cases = [
        b"TSCM" + struct.pack("<II", 1, 0xFFFFFFFF),  # absurd meta_len
        b"TSCM" + struct.pack("<II", 1, 2) + b"{}"
        + struct.pack("<I", 0xFFFFFFFF),  # absurd name_len
        b"TSCM" + struct.pack("<II", 1, 2) + b"{}"
        + struct.pack("<I", 1) + b"k" + struct.pack("<I", 200),  # ndim 200
        b"TSCM" + struct.pack("<II", 1, 2) + b"{}"
        + struct.pack("<I", 1) + b"k" + struct.pack("<I", 4)
        + struct.pack("<IIII", 0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF),  # overflow
    ]
    for i, data in enumerate(cases):
        p = tmp_path / f"h{i}.tscm"
        p.write_bytes(data)
        with pytest.raises(RuntimeError):
            NativeModel(str(p))


def test_predict_rejects_wrong_feature_count(blob, tmp_path):
    """A short/oversized feature vector must raise, not be read past its
    end by the RNN/CNN kernels (model.cc predict validates size first)."""
    from tpu_speech_commands.native_binding import NativeModel

    p = tmp_path / "ok.tscm"
    p.write_bytes(blob)
    m = NativeModel(str(p))
    with pytest.raises(RuntimeError):
        m.predict(np.zeros((7, 7), np.float32))
    with pytest.raises(RuntimeError):
        m.predict(np.zeros((31, 20), np.float32))
