"""Batched evaluation (reference: eval.py:173-256).

The reference evaluates sample-by-sample at batch 1 (`eval.py:218-246`);
here the whole eval set streams through a jitted, batch-sharded forward
pass, and accuracy plus the confusion matrix accumulate on device.
Artifacts match: accuracy print + normalised confusion-matrix PNG.
"""
from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Dataset
from ..models import is_cnn
from ..parallel import make_mesh, replicated

# device-staging cap for the one-dispatch whole-set scan; larger sets are
# evaluated in staged chunks of this many bytes (same bound as
# Trainer.scan_staging_limit_bytes)
SCAN_STAGING_LIMIT_BYTES = 2 << 30


def make_confusion_eval_step(model, num_classes: int):
    """(variables, x, y, mask) -> (correct_sum, count, confusion[C, C])."""

    def eval_step(variables, x, y, mask):
        logits = model.apply(variables, x, train=False)
        preds = jnp.argmax(logits, -1)
        correct = ((preds == y).astype(jnp.float32) * mask).sum()
        conf = jnp.zeros((num_classes, num_classes), jnp.float32)
        conf = conf.at[y, preds].add(mask)
        return correct, mask.sum(), conf

    return eval_step


def make_confusion_eval_scan(model, num_classes: int):
    """Whole-set variant: (variables, x[Nb,B,...], y[Nb,B], mask[Nb,B]) ->
    (correct_sum, count, confusion) in ONE dispatch.  On the tunneled axon
    platform a per-batch loop is round-trip-bound (~25 batches/s); the
    scan runs the entire eval set per call."""
    step = make_confusion_eval_step(model, num_classes)

    def eval_scan(variables, x, y, mask):
        def body(acc, batch):
            correct, count, conf = step(variables, *batch)
            return (acc[0] + correct, acc[1] + count, acc[2] + conf), None

        init = (jnp.float32(0.0), jnp.float32(0.0),
                jnp.zeros((num_classes, num_classes), jnp.float32))
        (correct, count, conf), _ = jax.lax.scan(body, init, (x, y, mask))
        return correct, count, conf

    return eval_scan


def evaluate_accuracy(
    model,
    variables,
    ds: Dataset,
    model_type: str,
    class_names: list[str],
    batch_size: int = 512,
    mesh=None,
    output_path: str = "result",
    save_plot: bool = True,
    verbose: bool = True,
):
    """Returns (accuracy, confusion_matrix); optionally renders
    result/confusion_matrix.png like the reference (eval.py:249-254)."""
    mesh = mesh if mesh is not None else make_mesh()
    num_classes = len(class_names)
    repl = replicated(mesh)
    variables = jax.device_put(variables, repl)

    t0 = time.time()
    # stage the whole set once, batch-reshape on the host, ONE device
    # dispatch for the full pass (per-batch dispatches are RTT-bound on
    # the tunneled platform); sets beyond the staging cap run as a few
    # chunked scan dispatches instead of one unbounded device_put
    n = len(ds)
    # batches shard over the mesh's data axis — round the batch up to a
    # divisible size instead of failing with an obscure sharding error
    n_data = int(mesh.shape.get("data", 1))
    b = -(-batch_size // n_data) * n_data
    n_pad = max(1, -(-n // b)) * b
    from ..export.inference_loader import _adapt_rank

    # add the CNN channel axis / squeeze a channelised (N, T, F, 1) into
    # an RNN — the ONE shared implementation of the model I/O contract
    x_np = _adapt_rank(ds.x, 4 if is_cnn(model_type) else 3)
    x_all = np.zeros((n_pad,) + x_np.shape[1:], np.float32)
    x_all[:n] = x_np
    y_all = np.zeros(n_pad, np.int32)
    y_all[:n] = np.asarray(ds.y, np.int32)
    m_all = np.zeros(n_pad, np.float32)
    m_all[:n] = 1.0
    n_b = n_pad // b
    bytes_per_batch = (x_all.nbytes + y_all.nbytes + m_all.nbytes) // n_b
    batches_per_chunk = max(1, SCAN_STAGING_LIMIT_BYTES // max(bytes_per_batch, 1))
    scan_data = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data")
    )
    put = partial(jax.device_put, device=scan_data)
    eval_scan = jax.jit(
        make_confusion_eval_scan(model, num_classes),
        in_shardings=(repl, scan_data, scan_data, scan_data),
        out_shardings=repl,
    )
    x_all = x_all.reshape((n_b, b) + x_all.shape[1:])
    y_all = y_all.reshape(n_b, b)
    m_all = m_all.reshape(n_b, b)
    total_correct = 0.0
    total_count = 0.0
    confusion = np.zeros((num_classes, num_classes), np.float64)
    for start in range(0, n_b, batches_per_chunk):
        # uniform chunk length keeps one compiled program for all full
        # chunks; only a shorter final chunk compiles a second shape
        end = min(start + batches_per_chunk, n_b)
        correct, count, conf = eval_scan(
            variables,
            put(x_all[start:end]),
            put(y_all[start:end]),
            put(m_all[start:end]),
        )
        total_correct += float(correct)
        total_count += float(count)
        confusion += np.asarray(conf, np.float64)
    dt = time.time() - t0

    accuracy = total_correct / max(total_count, 1.0)
    if verbose:
        print(f"Eval on {int(total_count)} samples: accuracy {accuracy:.4f} "
              f"({dt:.2f}s, {total_count/max(dt,1e-9):.0f} samples/s)")
    if save_plot:
        plot_confusion_matrix(confusion, class_names, output_path)
    return accuracy, confusion


def plot_confusion_matrix(
    confusion: np.ndarray, class_names: list[str], output_path: str = "result"
):
    """Row-normalised confusion-matrix heatmap PNG (eval.py:173-198)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    row_sums = confusion.sum(axis=1, keepdims=True)
    normalized = np.divide(
        confusion, row_sums, out=np.zeros_like(confusion), where=row_sums > 0
    )
    n = len(class_names)
    fig, ax = plt.subplots(figsize=(max(6, n * 0.5), max(5, n * 0.45)))
    im = ax.imshow(normalized, interpolation="nearest", cmap="Blues")
    ax.set_title("Confusion matrix (normalized)")
    fig.colorbar(im)
    ax.set_xticks(range(n), class_names, rotation=90, fontsize=7)
    ax.set_yticks(range(n), class_names, fontsize=7)
    ax.set_ylabel("True label")
    ax.set_xlabel("Predicted label")
    if n <= 20:
        for i in range(n):
            for j in range(n):
                ax.text(
                    j, i, f"{normalized[i, j]:.2f}",
                    ha="center", va="center", fontsize=6,
                    color="white" if normalized[i, j] > 0.5 else "black",
                )
    fig.tight_layout()
    os.makedirs(output_path, exist_ok=True)
    out = os.path.join(output_path, "confusion_matrix.png")
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out
