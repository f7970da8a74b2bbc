"""Whole-classifier Pallas kernel for the RNN families (inference).

One kernel computes features -> logits for SimpleGRU / SimpleLSTM
(models/rnn.py, mirroring the reference's classifier/models/rnn.py:10-79):
the input projection for every timestep is ONE MXU matmul, the 30-step
recurrence runs unrolled in VMEM, and the dense head finishes in the same
kernel — the only HBM touches are the feature read and the logit write.

Why this beats the XLA `lax.scan` serving path (ROADMAP.md §3): the gap
between the GRU flagship's end-to-end rate and the frontend-only rate is
the scan's 30 sequential small-matmul dispatches and their inter-step
HBM round trips.  Hoisting the input projection *outside* the kernel was
measured WORSE in XLA (the materialised (B, T, 3u) projection is ~7x the
HBM scan-read traffic); inside the kernel the projection lives in VMEM,
so the hoist is free and the recurrence touches HBM zero times.

Layout notes:
- Features flip batch-major -> frame-major ((T*TB, D)) with the kernel's
  one sublane transpose, so each step's input-projection slice
  xw[t*TB:(t+1)*TB] is a static row slice on sublanes.
- Weights are repacked on the host into per-gate matrices (z/r/h for
  GRU, i/f/g/o for LSTM).  Keras packs gates side by side in a (D, 3u)
  kernel; slicing those out per step would cut the lane axis at 48/96 —
  per-gate (TB, u) tensors never slice lanes at all.
- Keras semantics preserved exactly as in models/rnn.py: GRU
  reset_after=True (recurrent bias inside the reset gate) with the
  reference's linear candidate activation; LSTM tanh + unit forget bias
  (already baked into the checkpoint's bias vector).

Training is untouched (dropout + gradients need the XLA graph); this is
the serving/eval forward.  Numerics: float32 matches model.apply to
~1e-6; compute_dtype=bfloat16 mirrors the XLA serving path's bf16
activations (matmuls accumulate f32, gate nonlinearities run f32).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gate_split(arr: np.ndarray, n_gates: int):
    """Split a Keras-packed (…, n_gates*u) array into per-gate pieces."""
    return np.split(np.asarray(arr, np.float32), n_gates, axis=-1)


def _layer_params(params: dict, cell_type: str):
    """Collect per-layer weight dicts in layer order."""
    prefix = f"{cell_type}_unit_"
    backbone = params["backbone"]
    layers = sorted(
        (k for k in backbone if k.startswith(prefix)),
        key=lambda k: int(k[len(prefix):]),
    )
    if not layers:
        raise ValueError(f"no {prefix}* layers in params")
    return [backbone[k] for k in layers]


def make_fused_rnn_classifier(
    variables,
    cell_type: str = "gru",
    n_features: int | None = None,
    feature_size: int | None = None,
    batch_tile: int = 128,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    time_major: bool = False,
):
    """Build the fused (B, T, D) features -> (B, C) logits forward.

    cell_type: 'gru' | 'lstm'.  Stacked models (num_layers > 1) keep each
    layer's full output sequence in VMEM for the next layer.

    time_major consumes (T, B, D) features (the fused frontend's
    time_major output): the kernel's (T, TB, D) block IS frame-major, so
    the batch-major path's sublane transpose disappears — a pure layout
    win on the Pallas->Pallas handoff.
    """
    if cell_type not in ("gru", "lstm"):
        raise ValueError(f"cell_type must be gru|lstm, got {cell_type!r}")
    if n_features is None or feature_size is None:
        from ..params import pr

        n_features = n_features or pr.n_features
        feature_size = feature_size or pr.feature_size

    params = variables["params"]
    n_gates = 3 if cell_type == "gru" else 4
    layers = []
    for lp in _layer_params(params, cell_type):
        w_gates = _gate_split(lp["kernel"], n_gates)
        u_gates = _gate_split(lp["recurrent_kernel"], n_gates)
        if cell_type == "gru":
            bi = _gate_split(lp["bias_input"], n_gates)
            br = _gate_split(lp["bias_recurrent"], n_gates)
        else:
            # LSTM folds its single bias into the input projection
            bi = _gate_split(lp["bias"], n_gates)
            br = [np.zeros_like(b) for b in bi]
        layers.append((w_gates, u_gates, bi, br))
    units = layers[0][1][0].shape[0]
    head_w = np.asarray(params["score_predict"]["kernel"], np.float32)
    head_b = np.asarray(params["score_predict"]["bias"], np.float32)[None]
    if head_w.shape[0] != units:
        raise ValueError(
            f"score_predict kernel {head_w.shape} vs units {units}"
        )
    num_classes = head_w.shape[1]
    T = n_features

    # flat operand list: per layer, per gate: W, U, bi_row, br_row; + head
    mat_arrays: list[np.ndarray] = []
    for w_gates, u_gates, bi, br in layers:
        for g in range(n_gates):
            mat_arrays += [w_gates[g], u_gates[g], bi[g][None], br[g][None]]
    mat_arrays += [head_w, head_b]
    # matmul operands (W/U/head kernel) travel in compute dtype; bias rows
    # stay f32 (they add into the f32 accumulators)
    mat_devs = []
    for i, m in enumerate(mat_arrays):
        is_bias = m.shape[0] == 1
        mat_devs.append(
            jnp.asarray(m, jnp.float32 if is_bias else compute_dtype)
        )

    def kernel(x_ref, *refs):
        mats = [r[:] for r in refs[:-1]]
        out_ref = refs[-1]
        # batch-major (TB, T, D) -> frame-major (T*TB, D); upcast BEFORE
        # the sublane transpose — packed-bf16 sublane shuffles lower badly.
        # time_major blocks are already (T, TB, D): reshape only.
        x32 = x_ref[:].astype(jnp.float32)
        if not time_major:
            x32 = jnp.swapaxes(x32, 0, 1)
        x2 = x32.reshape(T * batch_tile, feature_size)

        # f32 operands on the MXU default to one bf16 pass; the 30-step
        # recurrence amplifies that to ~3e-3 on softmax scores.  HIGHEST
        # matches the XLA path's Precision.HIGHEST (CLAUDE.md) at f32;
        # bf16 serving keeps the fast single-pass mode.
        prec = (jax.lax.Precision.HIGHEST
                if compute_dtype == jnp.float32 else None)

        def mm(x, w):
            return jnp.dot(x.astype(compute_dtype), w,
                           preferred_element_type=jnp.float32,
                           precision=prec)

        mi = 0
        seq = x2  # frame-major (T*TB, d_in) input to the current layer
        h_last = None
        for w_gates, u_gates, _, _ in layers:
            gate_mats = mats[mi : mi + 4 * n_gates]
            mi += 4 * n_gates
            # hoisted input projections: one matmul per gate over all T
            xw = [
                mm(seq, gate_mats[4 * g]) + gate_mats[4 * g + 2]
                for g in range(n_gates)
            ]
            h = jnp.zeros((batch_tile, units), jnp.float32)
            if cell_type == "lstm":
                c = jnp.zeros((batch_tile, units), jnp.float32)
            outs = []
            for t in range(T):
                lo = t * batch_tile
                xg = [x[lo : lo + batch_tile] for x in xw]
                hg = [
                    mm(h, gate_mats[4 * g + 1]) + gate_mats[4 * g + 3]
                    for g in range(n_gates)
                ]
                if cell_type == "gru":
                    z = jax.nn.sigmoid(xg[0] + hg[0])
                    r = jax.nn.sigmoid(xg[1] + hg[1])
                    cand = xg[2] + r * hg[2]  # reset_after, linear act
                    h = z * h + (1.0 - z) * cand
                else:
                    i_g = jax.nn.sigmoid(xg[0] + hg[0])
                    f_g = jax.nn.sigmoid(xg[1] + hg[1])
                    g_g = jnp.tanh(xg[2] + hg[2])
                    o_g = jax.nn.sigmoid(xg[3] + hg[3])
                    c = f_g * c + i_g * g_g
                    h = o_g * jnp.tanh(c)
                outs.append(h)
            h_last = h
            seq = jnp.concatenate(outs, axis=0)  # (T*TB, units) frame-major
        logits = mm(h_last, mats[mi]) + mats[mi + 1]
        out_ref[:] = logits

    # recurrent matmuls dominate the MXU count: n_gates per step per layer
    flops_tile = 0
    for w_gates, u_gates, _, _ in layers:
        d_in = w_gates[0].shape[0]
        flops_tile += 2 * T * batch_tile * d_in * units * n_gates  # hoisted
        flops_tile += 2 * T * batch_tile * units * units * n_gates  # steps
    flops_tile += 2 * batch_tile * units * num_classes

    def forward(x: jax.Array) -> jax.Array:
        if x.ndim == 4:
            x = x[..., 0]
        batch = x.shape[1] if time_major else x.shape[0]
        if batch % batch_tile != 0:
            raise ValueError(
                f"batch {batch} not a multiple of batch_tile {batch_tile}"
            )
        expect = ((n_features, batch, feature_size) if time_major
                  else (batch, n_features, feature_size))
        if x.shape != expect:
            raise ValueError(
                f"expected {expect} features "
                f"({'time' if time_major else 'batch'}-major), got {x.shape}"
            )
        grid = (batch // batch_tile,)
        x_spec = (
            pl.BlockSpec((n_features, batch_tile, feature_size),
                         lambda i: (0, i, 0), memory_space=pltpu.VMEM)
            if time_major else
            pl.BlockSpec((batch_tile, n_features, feature_size),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[x_spec] + [
                pl.BlockSpec(m.shape, (lambda i, n=m.ndim: (0,) * n),
                             memory_space=pltpu.VMEM)
                for m in mat_arrays
            ],
            out_specs=pl.BlockSpec(
                (batch_tile, num_classes), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, num_classes),
                                           jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=flops_tile * grid[0],
                bytes_accessed=x.size * x.dtype.itemsize
                + batch * num_classes * 4,
                transcendentals=batch * T * units * (2 * len(layers)),
            ),
            interpret=interpret,
        )(x if x.dtype == jnp.bfloat16 else x.astype(jnp.float32),
          *mat_devs)

    return forward
