"""Multi-format inference model loader (reference: common/model_utils.py:104-165).

Dispatch on file suffix, returning ``(predict_fn, model_format)`` where
``predict_fn(features)`` maps a (B, n_features, feature_size[, 1]) float32
batch to (B, num_classes) softmax scores:

- ``.npz``          native checkpoint -> jitted JAX forward (TPU path)
- ``.tscm``         on-device deployment blob -> C++ runtime via ctypes
- ``.tflite``       TFLite flat buffer -> tf.lite.Interpreter
- ``.h5``/``.keras``  Keras model (reference-trained artifacts load directly)
- SavedModel dir    TF serving signature
- ``.onnx``         onnxruntime when installed, else the built-in numpy
                    executor (onnx_runtime_mini) for graphs this framework
                    emits
- ``.mnn``          gated: raised with an actionable message (the MNN
                    python runtime is optional and not shipped)

Each backend adapts input rank like the reference predictors
(eval.py:53-55): 3-D model inputs get the channel axis squeezed.
"""
from __future__ import annotations

import os

import numpy as np


def resolve_checkpoint_contract(predict_fn, model_format: str,
                                class_names=None, feature_type=None,
                                warn=print) -> str:
    """Shared entry-point contract (eval.py / listen.py / tools):

    - resolve feature_type from the checkpoint metadata when the flag is
      omitted — bark and mfcc features have IDENTICAL shapes, so a silent
      mismatch scores plausible-looking garbage; an explicit flag that
      contradicts the metadata warns loudly;
    - cross-check the classes file against the model head (a mismatched
      count corrupts confusion matrices silently — JAX scatter drops
      out-of-bounds updates — or indexes past the list in C++).

    Returns the resolved feature_type ('mfcc' fallback).  Only native
    checkpoints carry metadata; external formats pass through."""
    if model_format != "NATIVE":
        return feature_type or "mfcc"
    meta_ft = predict_fn.meta.get("feature_type")
    if feature_type is None:
        feature_type = meta_ft or "mfcc"
    elif meta_ft and feature_type != meta_ft:
        warn(
            f"WARNING: --feature_type {feature_type} overrides the "
            f"checkpoint's stored feature_type={meta_ft}; scores will "
            "be meaningless unless this is intentional."
        )
    if class_names is not None:
        n = predict_fn.num_classes
        if n is not None and n != len(class_names):
            raise ValueError(
                f"classes file has {len(class_names)} entries but the "
                f"model predicts {n} classes"
            )
        stored = predict_fn.classes
        if stored and list(stored) != list(class_names):
            warn(
                "WARNING: classes file differs from the checkpoint's "
                f"stored class list {list(stored)} — labels may be "
                "misattributed."
            )
    return feature_type or "mfcc"


def _adapt_rank(features: np.ndarray, want_rank: int) -> np.ndarray:
    features = np.asarray(features, np.float32)
    if features.ndim == want_rank + 1 and features.shape[-1] == 1:
        return features[..., 0]
    if features.ndim == want_rank - 1:
        return features[..., None]
    return features


def load_native(model_path: str):
    """Native .npz checkpoint -> jitted predict closure."""
    import jax
    import jax.numpy as jnp

    from ..models import init_model, score_fn
    from ..params import pr
    from ..training.checkpoints import load_checkpoint

    variables, meta = load_checkpoint(model_path)
    model_type = meta.get("model_type")
    num_classes = meta.get("num_classes")
    if model_type is None or num_classes is None:
        raise ValueError(
            f"{model_path} lacks model_type/num_classes metadata; re-save with "
            "training.save_checkpoint(meta={'model_type': ..., 'num_classes': ...})"
        )
    if meta.get("params"):
        pr.override(meta["params"])
    model, init_vars = init_model(
        model_type, num_classes, jax.random.PRNGKey(0), params=pr,
        num_layers=int(meta.get("num_layers", 1)),
    )
    # adopt checkpoint arrays (shapes validated against a fresh init)
    def adopt(new, old):
        new = np.asarray(new)
        if new.shape != np.asarray(old).shape:
            raise ValueError(
                f"checkpoint tensor shape {new.shape} != model "
                f"{np.asarray(old).shape}"
            )
        return jnp.asarray(new, jnp.asarray(old).dtype)

    variables = jax.tree_util.tree_map(adopt, variables, {
        k: init_vars[k] for k in variables
    })

    @jax.jit
    def forward(feats):
        logits = model.apply(variables, feats, train=False)
        return score_fn(logits)

    want_rank = 4 if model_type in ("simple_cnn", "simple_cnn_lite") else 3

    def predict(features):
        feats = _adapt_rank(np.asarray(features, np.float32), want_rank)
        return np.asarray(forward(jnp.asarray(feats)))

    predict.model_type = model_type
    predict.num_classes = num_classes
    predict.variables = variables
    predict.model = model
    predict.classes = meta.get("classes")
    predict.meta = meta
    return predict


def load_tflite(model_path: str):
    from tensorflow.lite.python import interpreter as interpreter_wrapper

    interp = interpreter_wrapper.Interpreter(model_path=model_path)
    input_details = interp.get_input_details()
    output_details = interp.get_output_details()
    in_rank = len(input_details[0]["shape"])

    allocated_shape = [None]

    def predict(features):
        feats = _adapt_rank(features, in_rank)
        outs = []
        for row in feats:  # TFLite interpreters are batch-1 by default
            shape = (1,) + row.shape
            if allocated_shape[0] != shape:  # streaming calls reuse tensors
                interp.resize_tensor_input(input_details[0]["index"], shape)
                interp.allocate_tensors()
                allocated_shape[0] = shape
            interp.set_tensor(input_details[0]["index"], row[None])
            interp.invoke()
            outs.append(interp.get_tensor(output_details[0]["index"])[0])
        return np.stack(outs)

    return predict


def load_keras(model_path: str):
    import tensorflow as tf

    model = tf.keras.models.load_model(model_path, compile=False)
    in_rank = len(model.inputs[0].shape)

    def predict(features):
        feats = _adapt_rank(features, in_rank)
        return np.asarray(model(feats))

    predict.keras_model = model
    return predict


def load_saved_model(model_path: str):
    import tensorflow as tf

    loaded = tf.saved_model.load(model_path)
    fn = loaded.signatures["serving_default"]
    in_name, spec = next(iter(fn.structured_input_signature[1].items()))
    in_rank = len(spec.shape)

    def predict(features):
        feats = _adapt_rank(features, in_rank)
        out = fn(**{in_name: tf.constant(feats)})
        return np.asarray(next(iter(out.values())))

    return predict


def load_frozen_pb(model_path: str):
    """Frozen GraphDef .pb (reference PB path, eval.py:40-60 equivalent;
    input/output tensors located by shape/type rather than hardcoded
    names)."""
    import tensorflow as tf

    graph_def = tf.compat.v1.GraphDef()
    with open(model_path, "rb") as f:
        graph_def.ParseFromString(f.read())

    def wrapped(*inputs):
        return tf.graph_util.import_graph_def(graph_def, name="")

    placeholders = [n for n in graph_def.node if n.op == "Placeholder"]
    # output = the last Identity/PartitionedCall NODE (by op, not name —
    # TF2 freezes emit 'Identity_1' / 'StatefulPartitionedCall' etc., and
    # a name match would fall through to graph_def.node[-1], which can be
    # a NoOp/const that prunes the wrong tensor)
    outputs = [n.name for n in graph_def.node
               if n.op in ("Identity", "PartitionedCall",
                           "StatefulPartitionedCall")]
    in_name = placeholders[0].name + ":0"
    out_name = (outputs[-1] if outputs else graph_def.node[-1].name) + ":0"
    fn = tf.compat.v1.wrap_function(wrapped, [])
    concrete = fn.prune(in_name, out_name)
    in_rank = len(concrete.inputs[0].shape)

    def predict(features):
        feats = _adapt_rank(features, in_rank)
        outs = [np.asarray(concrete(tf.constant(row[None])))[0] for row in feats]
        return np.stack(outs)

    return predict


def load_inference_model(model_path: str):
    """Returns (predict_fn, model_format)."""
    if model_path.endswith(".npz"):
        return load_native(model_path), "NATIVE"
    if model_path.endswith(".pb"):
        return load_frozen_pb(model_path), "PB"
    if model_path.endswith(".tflite"):
        return load_tflite(model_path), "TFLITE"
    if model_path.endswith((".h5", ".keras")):
        return load_keras(model_path), "H5"
    if os.path.isdir(model_path):
        return load_saved_model(model_path), "SAVED_MODEL"
    if model_path.endswith(".tscm"):
        # the on-device deployment blob, executed by the C++ runtime via
        # ctypes — lets eval.py/listen.py verify the exact artifact that
        # ships (requires native/build/libtsc.so; build with cmake+ninja)
        return _load_tscm(model_path), "TSCM"
    if model_path.endswith(".onnx"):
        try:
            import onnxruntime  # noqa: F401
        except ImportError:
            # built-in numpy executor (covers the graphs onnx_writer emits)
            return _load_onnx_mini(model_path), "ONNX"
        return _load_onnx(model_path), "ONNX"
    if model_path.endswith(".mnn"):
        raise ImportError(
            "MNN python runtime is not installed; use the native C++ apps under "
            "native/ or the .npz/.tflite paths"
        )
    raise ValueError(f"invalid model file: {model_path}")


def _load_tscm(model_path: str):
    from ..native_binding import NativeModel

    native = NativeModel(model_path)

    def predict(features):
        feats = _adapt_rank(features, 3)  # (B, n_features, width)
        return np.stack([native.predict(f) for f in feats])

    return predict


def _load_onnx_mini(model_path: str):
    from .onnx_runtime_mini import OnnxModel

    model = OnnxModel(model_path)
    input_name = model.inputs[0]
    # rank from the first Transpose/Slice consumer is ambiguous; infer from
    # the graph: CNN exports start with a Transpose to NCHW (rank 4)
    in_rank = 4 if model.nodes and model.nodes[0][0] == "Transpose" else 3

    def predict(features):
        feats = _adapt_rank(features, in_rank)
        return model.run({input_name: feats})["score_predict"]

    return predict


def _load_onnx(model_path: str):
    import onnxruntime

    session = onnxruntime.InferenceSession(
        model_path, providers=["CPUExecutionProvider"]
    )
    inp = session.get_inputs()[0]
    in_rank = len(inp.shape)

    def predict(features):
        feats = _adapt_rank(features, in_rank)
        if in_rank == 4 and inp.shape[1] in (1,):  # NCHW export
            feats = np.transpose(feats, (0, 3, 1, 2))
        return session.run(None, {inp.name: feats})[0]

    return predict
