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

from ..data.dataset import Dataset, batch_iterator
from ..models import features_to_input
from ..parallel import batch_sharding, make_mesh, replicated


def make_confusion_eval_step(model, num_classes: int, has_batch_stats: bool):
    """(variables, x, y, mask) -> (correct_sum, count, confusion[C, C])."""

    def eval_step(variables, x, y, mask):
        logits = model.apply(variables, x, train=False)
        preds = jnp.argmax(logits, -1)
        correct = ((preds == y).astype(jnp.float32) * mask).sum()
        conf = jnp.zeros((num_classes, num_classes), jnp.float32)
        conf = conf.at[y, preds].add(mask)
        return correct, mask.sum(), conf

    return eval_step


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
    has_bs = "batch_stats" in variables
    data = batch_sharding(mesh)
    repl = replicated(mesh)
    step = jax.jit(
        make_confusion_eval_step(model, num_classes, has_bs),
        in_shardings=(repl, data, data, data),
        out_shardings=repl,
    )
    variables = jax.device_put(variables, repl)

    t0 = time.time()
    total_correct, total_count = 0.0, 0.0
    confusion = np.zeros((num_classes, num_classes), np.float64)
    put = partial(jax.device_put, device=data)
    for x, y, valid in batch_iterator(ds, batch_size, shuffle=False):
        xb = put(features_to_input(jnp.asarray(x), model_type))
        yb = put(jnp.asarray(y))
        mb = put((np.arange(len(y)) < valid).astype(np.float32))
        correct, count, conf = step(variables, xb, yb, mb)
        total_correct += float(correct)
        total_count += float(count)
        confusion += np.asarray(conf)
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
