"""Model export: native checkpoint -> TF SavedModel / TFLite / ONNX.

The reference exports Keras H5 to PB/ONNX/TFLite via
`tools/model_converter/*` (keras_to_tensorflow.py:77-147,
keras_to_onnx.py:30-51, custom_tflite_convert.py); here export flows from
the JAX model through jax2tf:

    .npz checkpoint -> jax2tf.convert -> tf.Module -> SavedModel
                                             |-> TFLiteConverter -> .tflite
                                             |-> tf2onnx (if installed) -> .onnx

Exports use the reference I/O contract: input `feature_input`
(B, n_features, feature_size[, 1]) and softmax output `score_predict`
(B, num_classes).  A params.json + classes.txt are emitted alongside for
the on-device apps (native/ and the reference C++ apps both read them).
"""
from __future__ import annotations

import json
import os



def _load_for_export(checkpoint_path: str):
    from .inference_loader import load_native

    predict = load_native(checkpoint_path)
    return predict


def export_saved_model(
    checkpoint_path: str,
    output_dir: str,
    batch_size: int | None = None,
    predict=None,
) -> str:
    """Native checkpoint -> TF SavedModel with a serving signature.

    `predict` lets callers that already loaded the checkpoint (export_tflite,
    export_frozen_pb run it through a temp SavedModel) skip a re-parse."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    from ..models import input_shape, score_fn
    from ..params import pr

    predict = predict or _load_for_export(checkpoint_path)
    model, variables, model_type = predict.model, predict.variables, predict.model_type

    def forward(x):
        logits = model.apply(variables, x, train=False)
        return score_fn(logits)

    shape = input_shape(model_type, params=pr)
    poly = None if batch_size else ["(b, ...)"]
    tf_fn = jax2tf.convert(forward, with_gradient=False, polymorphic_shapes=poly)
    module = tf.Module()
    module.f = tf.function(
        lambda feature_input: {"score_predict": tf_fn(feature_input)},
        input_signature=[
            tf.TensorSpec((batch_size,) + shape, tf.float32, name="feature_input")
        ],
    )
    os.makedirs(output_dir, exist_ok=True)
    tf.saved_model.save(
        module, output_dir, signatures={"serving_default": module.f}
    )
    _emit_sidecars(output_dir, predict)
    return output_dir


def export_tflite(
    checkpoint_path: str,
    output_file: str,
    quantize: bool = False,
    representative_data=None,
) -> str:
    """Native checkpoint -> .tflite flat buffer (fixed batch 1).

    RNN models export their `lax.scan` as TFLite control-flow ops
    (SELECT_TF_OPS fallback enabled for robustness).

    quantize=True applies dynamic-range 8-bit weight quantization (the
    reference's TOCO --quantize analogue, keras_to_tensorflow.py:128-137).
    Passing `representative_data` — an (N, n_features, feature_size)
    feature array — additionally calibrates activations for full
    post-training quantization (the reference's MNN KL-quantize analogue,
    inference/README.md:369-416); I/O stays float for drop-in use.
    """
    import tempfile

    import numpy as np
    import tensorflow as tf

    predict = _load_for_export(checkpoint_path)  # parse the checkpoint ONCE
    with tempfile.TemporaryDirectory() as tmp:
        saved = export_saved_model(checkpoint_path, tmp, batch_size=1,
                                   predict=predict)
        converter = tf.lite.TFLiteConverter.from_saved_model(saved)
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS,
            tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        if quantize or representative_data is not None:
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
        if representative_data is not None:
            is_cnn_model = predict.model_type in (
                "simple_cnn", "simple_cnn_lite",
            )
            samples = np.asarray(representative_data, np.float32)
            if is_cnn_model and samples.ndim == 3:
                samples = samples[..., None]
            elif not is_cnn_model and samples.ndim == 4:
                samples = samples[..., 0]

            def rep_gen():
                for row in samples:
                    yield [row[None, ...]]

            converter.representative_dataset = rep_gen
        blob = converter.convert()
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    with open(output_file, "wb") as f:
        f.write(blob)
    _emit_sidecars(os.path.dirname(os.path.abspath(output_file)), predict)
    return output_file


def export_frozen_pb(
    checkpoint_path: str,
    output_file: str,
    output_nodes_prefix: str | None = None,
    save_graph_def: bool = False,
) -> str:
    """Native checkpoint -> frozen TF GraphDef .pb (batch 1).

    Reference equivalent of keras_to_tensorflow.py:77-147
    (convert_variables_to_constants); here derived from the jax2tf
    SavedModel via convert_variables_to_constants_v2.

    `output_nodes_prefix` appends Identity nodes `<prefix>0..<prefix>N-1`
    aliasing the graph outputs (keras_to_tensorflow.py:99-111 semantics —
    the original nodes stay, so existing loaders keep working) and
    `save_graph_def` additionally writes an ascii `<stem>.pbtxt` next to
    the .pb (keras_to_tensorflow.py:122-126).  The TF1 TOCO `--quantize`
    TransformGraph path is deliberately not reproduced — the TFLite
    dynamic-range/full-int8 and native-int8 exporters supersede it.
    """
    import tempfile

    import tensorflow as tf
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2,
    )

    with tempfile.TemporaryDirectory() as tmp:
        saved = export_saved_model(checkpoint_path, tmp, batch_size=1)
        loaded = tf.saved_model.load(saved)
        fn = loaded.signatures["serving_default"]
        frozen = convert_variables_to_constants_v2(fn)
        graph_def = frozen.graph.as_graph_def()
        if output_nodes_prefix:
            for i, tensor in enumerate(frozen.outputs):
                node = graph_def.node.add()
                node.op = "Identity"
                node.name = f"{output_nodes_prefix}{i}"
                node.input.append(tensor.name.split(":")[0])
                node.attr["T"].type = tensor.dtype.as_datatype_enum
    out_dir = os.path.dirname(os.path.abspath(output_file))
    os.makedirs(out_dir, exist_ok=True)
    tf.io.write_graph(
        graph_def, out_dir, os.path.basename(output_file), as_text=False
    )
    if save_graph_def:
        stem = os.path.splitext(os.path.basename(output_file))[0]
        tf.io.write_graph(graph_def, out_dir, stem + ".pbtxt", as_text=True)
    return output_file


def export_onnx(checkpoint_path: str, output_file: str, opset: int = 13) -> str:
    """Native checkpoint -> .onnx (reference: keras_to_onnx.py:30-51).

    Uses the built-in direct ONNX emitter (onnx_writer.py — no tf2onnx /
    onnx dependency); `opset` is accepted for CLI compatibility but the
    emitted graphs only use core ops stable since opset 13."""
    from .onnx_writer import export_onnx_model

    del opset  # graphs are opset-13 core ops regardless
    return export_onnx_model(checkpoint_path, output_file)


def _emit_sidecars(output_dir: str, predict) -> None:
    """params.json + classes.txt next to the exported model (consumed by the
    native C++ apps, mirroring the reference deployment contract)."""
    from ..params import pr

    with open(os.path.join(output_dir, "params.json"), "w") as f:
        json.dump(pr.to_dict(), f, indent=2)
    classes = getattr(predict, "classes", None)
    if classes:
        with open(os.path.join(output_dir, "classes.txt"), "w") as f:
            f.write("\n".join(classes) + "\n")
