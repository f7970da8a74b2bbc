"""Native deployment model format (.tscm).

The reference deploys via TFLite/MNN flat buffers consumed by its C++ apps
(inference/{tflite,MNN}); this framework ships its own dependency-free
native runtime (native/), consuming a simple binary format written here:

    magic 'TSCM' | u32 version | u32 meta_len | meta JSON (utf-8)
    repeat: u32 name_len | name | u32 ndim | u32 dims[ndim] | f32 data[]

meta JSON carries model_type, num_classes, class names and the audio
params — everything the on-device app needs besides the weights (the
params.json sidecar remains for reference-app compatibility).
"""
from __future__ import annotations

import json
import struct

import numpy as np

MAGIC = b"TSCM"
VERSION = 1


def write_native_model(output_file: str, flat_params: dict[str, np.ndarray],
                       meta: dict) -> str:
    with open(output_file, "wb") as f:
        meta_blob = json.dumps(meta).encode()
        f.write(MAGIC)
        f.write(struct.pack("<II", VERSION, len(meta_blob)))
        f.write(meta_blob)
        for name in sorted(flat_params):
            arr = np.ascontiguousarray(flat_params[name], dtype=np.float32)
            name_b = name.encode()
            f.write(struct.pack("<I", len(name_b)))
            f.write(name_b)
            f.write(struct.pack("<I", arr.ndim))
            f.write(struct.pack(f"<{arr.ndim}I", *arr.shape))
            f.write(arr.tobytes())
    return output_file


def read_native_model(path: str):
    """Python-side reader (used by tests to validate the format)."""
    with open(path, "rb") as f:
        assert f.read(4) == MAGIC, "bad magic"
        version, meta_len = struct.unpack("<II", f.read(8))
        assert version == VERSION
        meta = json.loads(f.read(meta_len))
        tensors = {}
        while True:
            head = f.read(4)
            if not head:
                break
            (name_len,) = struct.unpack("<I", head)
            name = f.read(name_len).decode()
            (ndim,) = struct.unpack("<I", f.read(4))
            shape = struct.unpack(f"<{ndim}I", f.read(4 * ndim))
            count = int(np.prod(shape)) if ndim else 1
            data = np.frombuffer(f.read(4 * count), dtype="<f4").reshape(shape)
            tensors[name] = data
    return tensors, meta


def export_native(checkpoint_path: str, output_file: str) -> str:
    """Native .npz checkpoint -> .tscm deployment blob."""
    from ..params import pr
    from ..training.checkpoints import load_checkpoint
    from ..utils import path_names
    import jax

    variables, meta = load_checkpoint(checkpoint_path)
    flat = {}
    for section in ("params", "batch_stats"):
        tree = variables.get(section)
        if tree is None:
            continue
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            flat[section + "/" + "/".join(path_names(path))] = np.asarray(leaf)
    meta = {**meta}
    meta.setdefault("params", pr.to_dict())
    return write_native_model(output_file, flat, meta)
