"""Checkpointing with the reference's policy (train.py:31-37, callbacks.py:9-21).

- per-epoch checkpoints named
  ``ep{epoch:03d}-loss{loss:.3f}-accuracy{acc:.3f}-val_loss{vl:.3f}-val_accuracy{va:.3f}.npz``
  saved only on a new best val_accuracy (save_best_only)
- newest `max_keep` kept, older ``ep*.npz`` deleted
- final ``trained_final.npz``

Format: a flat ``.npz`` holding every param/batch-stat leaf under a
'/'-joined path key plus a ``__meta__`` JSON blob — trivially readable from
NumPy, the export tools, and the native C++ runtime (no framework dep).
"""
from __future__ import annotations

import json
import os
from glob import glob

import jax
import numpy as np

from ..utils import path_names


def _flatten(tree, prefix: str) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(path_names(path))
        flat[f"{prefix}/{key}"] = np.asarray(leaf)
    return flat


def flatten_variables(variables) -> dict[str, np.ndarray]:
    """Flatten a {'params': ..., 'batch_stats': ...} tree into the
    'section/a/b' flat dict used by checkpoints and the exporters (the
    layout the native runtime and ONNX writer consume)."""
    flat: dict[str, np.ndarray] = {}
    for section in ("params", "batch_stats"):
        tree = variables.get(section)
        if tree is not None:
            flat.update(_flatten(tree, section))
    return flat


def _unflatten(flat: dict[str, np.ndarray], prefix: str):
    tree: dict = {}
    pfx = prefix + "/"
    for key, value in flat.items():
        if not key.startswith(pfx):
            continue
        node = tree
        parts = key[len(pfx) :].split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree or None


def save_checkpoint(path: str, state, meta: dict | None = None) -> None:
    """Serialise params (+batch_stats) of a TrainState or variables dict."""
    if hasattr(state, "params"):
        params, batch_stats = state.params, getattr(state, "batch_stats", None)
    else:
        params = state.get("params")
        batch_stats = state.get("batch_stats")
    payload = _flatten(params, "params")
    if batch_stats is not None:
        payload.update(_flatten(batch_stats, "batch_stats"))
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    np.savez(path, **payload)


def load_checkpoint(path: str):
    """Returns (variables_dict, meta_dict)."""
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    meta = json.loads(bytes(flat.pop("__meta__", np.array([], np.uint8))) or b"{}")
    variables = {"params": _unflatten(flat, "params")}
    batch_stats = _unflatten(flat, "batch_stats")
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    return variables, meta


def restore_state(state, path: str):
    """Load checkpoint arrays into an existing TrainState (shape-checked)."""
    variables, _ = load_checkpoint(path)

    def check(new, old):
        new = np.asarray(new)
        if new.shape != old.shape:
            raise ValueError(
                f"checkpoint tensor shape {new.shape} != state {old.shape}"
            )
        return new.astype(old.dtype)

    params = jax.tree_util.tree_map(
        check, variables["params"], jax.tree_util.tree_map(np.asarray, state.params)
    )
    updates = {"params": params}
    if variables.get("batch_stats") is not None and state.batch_stats is not None:
        updates["batch_stats"] = jax.tree_util.tree_map(
            check,
            variables["batch_stats"],
            jax.tree_util.tree_map(np.asarray, state.batch_stats),
        )
    return state.replace(**updates)


class CheckpointManager:
    """Best-on-val-accuracy epoch checkpoints with keep-newest-N cleanup."""

    def __init__(self, log_dir: str, max_keep: int = 5, meta: dict | None = None):
        self.log_dir = log_dir
        self.max_keep = max_keep
        self.meta = meta or {}
        os.makedirs(log_dir, exist_ok=True)

    def save_epoch(self, state, em) -> str:
        name = (
            f"ep{em.epoch:03d}-loss{em.loss:.3f}-accuracy{em.accuracy:.3f}"
            f"-val_loss{em.val_loss:.3f}-val_accuracy{em.val_accuracy:.3f}.npz"
        )
        path = os.path.join(self.log_dir, name)
        save_checkpoint(path, state, {**self.meta, "epoch": em.epoch})
        self._clean()
        return path

    def save_final(self, state) -> str:
        path = os.path.join(self.log_dir, "trained_final.npz")
        save_checkpoint(path, state, self.meta)
        return path

    @staticmethod
    def _by_recency(paths):
        """Newest-last by modification time — lexicographic filename order
        would keep stale checkpoints after --resume restarts the epoch
        counter (ep001 sorts before a previous run's ep020) and mis-orders
        ep1000 vs ep999."""
        return sorted(paths, key=os.path.getmtime)

    def _clean(self):
        ckpts = self._by_recency(glob(os.path.join(self.log_dir, "ep*.npz")))
        # max_keep=0 means keep none — ckpts[:-0] is an empty slice, which
        # would silently keep everything instead
        stales = ckpts[: -self.max_keep] if self.max_keep > 0 else ckpts
        for stale in stales:
            os.remove(stale)

    def latest(self) -> str | None:
        ckpts = self._by_recency(glob(os.path.join(self.log_dir, "ep*.npz")))
        return ckpts[-1] if ckpts else None
