"""Batch serving: the fastest audio -> scores forward for a checkpoint.

This is the production counterpart of bench.py's measurement path — one
jit-able function from raw audio windows (float32, or int16 PCM for half
the HBM read traffic) straight to class scores, assembled from the
fastest eligible implementation of each stage:

- frontend: the fused Pallas Cooley-Tukey GEMM-DFT kernel when the config
  allows it (ops/pallas_frontend.py), else the XLA GEMM chain;
- classifier: for the CNN families, the whole-classifier Pallas megakernel
  (all conv blocks + dense head in one kernel, zero intermediate HBM
  traffic — ops/pallas_classifier.py); RNN families and ineligible
  configs use model.apply.

Falling back is always silent-correct: every path computes the same
scores (float32 parity ~1e-5; compute_dtype=bfloat16 mirrors the XLA
serving precision, top-1-identical in practice).

    from tpu_speech_commands.serving import make_batch_scorer
    scorer = make_batch_scorer("logs/000/trained_final.npz")
    scores = scorer(audio_batch)          # (B, max_samples) -> (B, C)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .models import features_to_input, score_fn
from .models.factory import is_cnn
from .ops.pallas_frontend import _ct_eligible


def make_batch_scorer(
    checkpoint_path: str,
    batch_tile: int = 16,
    compute_dtype=jnp.float32,
    use_pallas: bool | None = None,
    interpret: bool = False,
    jit: bool = True,
):
    """Load a native .npz checkpoint and build audio -> scores.

    The returned callable takes (B, max_samples) float32 audio (or raw
    int16 PCM) with B a multiple of batch_tile when a Pallas path is
    active, plus an optional scalar `gain`.  Attributes: `.classes`,
    `.num_classes`, `.model_type`, `.paths` (which implementation each
    stage took).
    """
    from .export.inference_loader import load_native
    from .frontend import Frontend
    from .params import pr

    predict = load_native(checkpoint_path)
    model, variables = predict.model, predict.variables
    model_type = predict.model_type
    feature_type = predict.meta.get("feature_type", "mfcc")

    if use_pallas is None:
        use_pallas = interpret or jax.default_backend() == "tpu"

    paths = {}
    if use_pallas and _ct_eligible(pr) and not pr.use_delta:
        from .ops import make_fused_frontend

        frontend = make_fused_frontend(
            pr, feature_type=feature_type, batch_tile=batch_tile,
            interpret=interpret,
        )
        paths["frontend"] = "pallas-ct"
    elif use_pallas and _ct_eligible(pr):
        from .frontend.dsp import add_deltas
        from .ops import make_fused_frontend

        fused = make_fused_frontend(
            pr, feature_type=feature_type, batch_tile=batch_tile,
            interpret=interpret,
        )

        def frontend(audio, gain=None):
            return add_deltas(fused(audio, gain))

        paths["frontend"] = "pallas-ct+deltas"
    else:
        fe = Frontend(pr, feature_type=feature_type)

        def frontend(audio, gain=None):
            if audio.dtype == jnp.int16:
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            if gain is not None:
                audio = audio * gain
            return fe(audio)

        paths["frontend"] = "xla"

    if use_pallas and is_cnn(model_type):
        from .ops.pallas_classifier import make_fused_cnn_classifier

        # pr.feature_size already includes the use_delta doubling; the
        # lowering's flatten check validates the dense shapes
        classifier = make_fused_cnn_classifier(
            variables, separable=(model_type == "simple_cnn_lite"),
            batch_tile=batch_tile, interpret=interpret,
            compute_dtype=compute_dtype,
        )
        paths["classifier"] = "pallas-megakernel"
    else:
        def classifier(feats):
            x = features_to_input(feats, model_type)
            return model.apply(variables, x, train=False)

        paths["classifier"] = "xla"

    def run(audio, gain=None):
        feats = frontend(audio, gain)
        return score_fn(classifier(feats))

    jitted = jax.jit(run) if jit and not interpret else run

    def scorer(audio, gain=None):
        return jitted(audio, gain)

    scorer.classes = predict.classes
    scorer.num_classes = predict.num_classes
    scorer.model_type = model_type
    scorer.paths = paths
    return scorer
