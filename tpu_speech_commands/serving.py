"""Batch serving: the fastest audio -> scores forward for a checkpoint.

This is the production counterpart of bench.py's measurement path — one
jit-able function from raw audio windows (float32, or int16 PCM for half
the HBM read traffic) straight to class scores, assembled from the
fastest eligible implementation of each stage:

- frontend: the fused Pallas Cooley-Tukey GEMM-DFT kernel when the config
  allows it (ops/pallas_frontend.py), else the XLA GEMM chain;
- classifier: for the CNN families, the whole-classifier Pallas megakernel
  (all conv blocks + dense head in one kernel, zero intermediate HBM
  traffic — ops/pallas_classifier.py); for simple_gru, the fused RNN
  kernel (hoisted input projections + VMEM-resident recurrence —
  ops/pallas_rnn.py); simple_lstm and ineligible configs use
  model.apply (measured fastest for the 4-gate LSTM).

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

import math

from .models import features_to_input, score_fn
from .models.factory import is_cnn
from .ops.pallas_frontend import _ct_eligible


def _lazy_tiled(build, default_tile: int, batch_axis: int = 0):
    """Defer a kernel's batch-tile choice to trace time.

    Uses the preferred tile when it divides the batch, else
    gcd(batch, tile) — a smaller tile is always VMEM-safe (worst case 1,
    which still computes correctly), unlike a whole-batch tile which can
    exceed scoped VMEM for large awkward batches.  Deliberately NOT
    cached: the builder usually runs inside a jit trace, so its jnp
    constants belong to that trace — reusing the closure in a later
    trace (a new batch shape) leaks tracers.  jit already caches the
    whole scorer per input shape, so each distinct shape pays the
    host-side lowering exactly once.

    batch_axis: where the batch dim lives on the input (1 for the
    time-major (T, B, F) feature handoff).
    """

    def call(x, *args, **kw):
        # gcd == default_tile whenever the tile divides the batch
        tile = math.gcd(x.shape[batch_axis], default_tile)
        return build(tile)(x, *args, **kw)

    return call


def make_batch_scorer(
    checkpoint_path: str,
    batch_tile: int = 16,
    classifier_tile: int | None = None,
    compute_dtype=jnp.float32,
    use_pallas: bool | None = None,
    interpret: bool = False,
    jit: bool = True,
    mesh=None,
):
    """Load a native .npz checkpoint and build audio -> scores.

    The returned callable takes (B, max_samples) float32 audio (or raw
    int16 PCM) for any B, plus an optional scalar `gain`.  Attributes:
    `.classes`, `.num_classes`, `.model_type`, `.paths` (which
    implementation each stage took).

    batch_tile is the frontend kernel's grid tile (16 is the measured
    optimum — ROADMAP.md).  classifier_tile is the classifier kernel's
    tile; the two kernels have independent grids, and the classifier
    wants a much larger tile (measured: 16 -> 3.27M w/s, 128 -> 3.98M
    for simple_cnn end to end; 256 exceeds the 16 MB VMEM scoped
    limit).  Defaults: 128 for both classifier kernels (for the RNN
    kernel 256 ties 128 on GRU and exceeds VMEM on LSTM).  A batch that
    is not a multiple of a tile runs at gcd(batch, tile) for that
    kernel — always VMEM-safe, slower for awkward batch sizes.

    mesh: an optional `jax.sharding.Mesh` with a 'data' axis.  The whole
    forward (frontend kernel + classifier) runs per batch shard under
    `shard_map` — collective-free data parallelism over ICI, the serving
    counterpart of the trainer's sharded step.  The batch must divide by
    the data-axis size; tiles apply per shard.
    """
    from .export.inference_loader import load_native
    from .frontend import Frontend
    from .params import pr

    predict = load_native(checkpoint_path)
    model, variables = predict.model, predict.variables
    model_type = predict.model_type
    feature_type = predict.meta.get("feature_type", "mfcc")
    # snapshot the params NOW: load_native just restored this
    # checkpoint's stored params into the global singleton, but the
    # _lazy_tiled builders run at CALL time — closing over the mutable
    # `pr` would let any later checkpoint load silently rewire this
    # scorer's DFT/mel matrices (garbage scores when shapes coincide)
    p = pr.replace()

    if use_pallas is None:
        use_pallas = interpret or jax.default_backend() == "tpu"

    paths = {}
    # NOTE: ops/training_frontend.select_training_frontend makes the
    # analogous choice for the TRAIN step (where only the frontend is
    # shard_map'd, tiles are fixed per batch, and fallbacks must print).
    # Serving differs on each of those axes (whole-forward shard_map,
    # trace-time gcd tiles, silent-correct fallbacks recorded in
    # `.paths`), so the policies are kept side by side on the shared
    # primitives (_ct_eligible / make_fused_frontend) — update both when
    # eligibility rules change.
    # classifier dispatch FIRST: the frontend's bf16 handoff below is
    # derived from the classifier path actually chosen, so the two can
    # never drift apart.
    # time-major (T, B, F) handoff: when BOTH stages are Pallas kernels
    # and no delta post-processing sits in between, the frontend emits
    # its internally frame-major result without the (T, TB, F) sublane
    # transpose and the classifier consumes it with a plain reshape —
    # both narrow-lane transposes vanish (measured ~+1% on the GRU
    # flagship and the CNN megakernel; ROADMAP.md).
    # decide the dispatch ONCE, then branch on the decision — time_major
    # is derived from the same value the branches switch on, so an edit
    # to the dispatch can't leave it pointing at a different classifier.
    if use_pallas and is_cnn(model_type):
        classifier_kind = "pallas-megakernel"
    elif use_pallas and model_type == "simple_gru":
        classifier_kind = "pallas-rnn"
    else:
        classifier_kind = "xla"
    # deltas are emitted INSIDE the frontend kernel (emit_deltas below),
    # so use_delta configs keep the time-major / bf16 handoff fast path
    time_major = bool(classifier_kind != "xla" and _ct_eligible(p))
    if classifier_kind == "pallas-megakernel":
        from .ops.pallas_classifier import make_fused_cnn_classifier

        # pr.feature_size already includes the use_delta doubling; the
        # lowering's flatten check validates the dense shapes
        classifier = _lazy_tiled(
            lambda t: make_fused_cnn_classifier(
                variables, separable=(model_type == "simple_cnn_lite"),
                n_features=p.n_features, feature_size=p.feature_size,
                batch_tile=t, interpret=interpret,
                compute_dtype=compute_dtype, time_major=time_major,
            ),
            classifier_tile or 128,
            batch_axis=1 if time_major else 0,
        )
        paths["classifier"] = classifier_kind
    elif classifier_kind == "pallas-rnn":
        # simple_lstm deliberately stays on the XLA scan: measured at
        # batch 8192 the 4-gate kernel runs 4.00M windows/s (4.11M with
        # a lane-packed recurrence) vs 4.23M for XLA — the extra serial
        # gate matmuls cost more than the scan's HBM round trips save.
        # The GRU kernel wins (4.43M vs 4.39M) and is the default.
        from .ops.pallas_rnn import make_fused_rnn_classifier

        classifier = _lazy_tiled(
            lambda t: make_fused_rnn_classifier(
                variables, cell_type="gru",
                n_features=p.n_features, feature_size=p.feature_size,
                batch_tile=t,
                interpret=interpret, compute_dtype=compute_dtype,
                time_major=time_major,
            ),
            classifier_tile or 128,
            batch_axis=1 if time_major else 0,
        )
        paths["classifier"] = classifier_kind
    else:
        def classifier(feats):
            x = features_to_input(feats, model_type)
            return model.apply(variables, x, train=False)

        paths["classifier"] = classifier_kind
    # bf16 feature handoff between the two kernels: halves the feature
    # tensor's HBM round trip, and loses nothing — a bf16 Pallas
    # classifier rounds its matmul inputs to bf16 anyway (scores are
    # bit-identical; tests/test_serving.py).  Only when the classifier IS
    # a Pallas kernel and no f32 delta post-processing sits in between.
    handoff_dtype = (
        compute_dtype
        if paths["classifier"].startswith("pallas")
        and compute_dtype != jnp.float32
        else jnp.float32
    )

    if use_pallas and _ct_eligible(p):
        from .ops import make_fused_frontend

        fused = _lazy_tiled(
            lambda t: make_fused_frontend(
                p, feature_type=feature_type, batch_tile=t,
                interpret=interpret, out_dtype=handoff_dtype,
                time_major=time_major, emit_deltas=p.use_delta,
            ),
            batch_tile,
        )
        frontend = fused
        paths["frontend"] = "pallas-ct" + "".join(
            tag for cond, tag in (
                (p.use_delta, "(deltas)"),
                (handoff_dtype != jnp.float32, "(bf16-handoff)"),
                (time_major, "(time-major)"),
            ) if cond
        )
    else:
        fe = Frontend(p, feature_type=feature_type)

        def frontend(audio, gain=None):
            if audio.dtype == jnp.int16:
                audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
            if gain is not None:
                audio = audio * gain
            return fe(audio)

        paths["frontend"] = "xla"

    def run(audio, gain=None):
        feats = frontend(audio, gain)
        return score_fn(classifier(feats))

    from .parallel.mesh import batch_shards

    n_data = batch_shards(mesh)
    if n_data > 1:
        from jax.sharding import PartitionSpec as P

        from .parallel.mesh import batch_spec, shard_map_no_check

        # replication check off: Pallas calls don't participate in
        # shard_map's inference; variables ride in as closure constants
        # (replicated on every device).  batch_spec covers both flat
        # ('data') and hybrid multi-slice ('replica','data') meshes.
        bspec = batch_spec(mesh)
        sharded = shard_map_no_check(
            lambda a, g: run(a, g),
            mesh=mesh,
            in_specs=(bspec, P()),
            out_specs=bspec,
        )

        def run_maybe_sharded(audio, gain=None):
            if audio.shape[0] % n_data:
                raise ValueError(
                    f"batch {audio.shape[0]} not divisible by the "
                    f"{n_data}-device data axis"
                )
            g = jnp.float32(1.0) if gain is None else jnp.asarray(
                gain, jnp.float32
            )
            return sharded(audio, g)

        paths["parallel"] = f"shard_map x{n_data}"
    else:
        run_maybe_sharded = run

    jitted = jax.jit(run_maybe_sharded) if jit and not interpret \
        else run_maybe_sharded

    def scorer(audio, gain=None):
        return jitted(audio, gain)

    scorer.classes = predict.classes
    scorer.num_classes = predict.num_classes
    scorer.model_type = model_type
    scorer.paths = paths
    return scorer
