"""Sharded training driver (reference: train.py:23-95 + callback stack).

Replaces Keras `model.fit` with a jitted, mesh-sharded train step:
- batch axis sharded over the mesh 'data' axis (gradients all-reduced by
  XLA psum over ICI), optional tensor-parallel dense layers over 'model'
- donated train state (buffers update in place on device)
- padded final batches with a validity mask — one static shape, no
  recompiles

Callback-equivalents (train.py:30-43):
- best-checkpoint on val_accuracy + keep-newest-5 (CheckpointCleanCallBack)
- ReduceLROnPlateau(factor .5, patience 10, min_lr 1e-10) when no decay
  schedule is chosen
- EarlyStopping(patience 50) on val_accuracy
- TerminateOnNaN
- CSV + optional TensorBoard metric logging
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..data.dataset import Dataset, batch_iterator
from ..losses import make_loss_fn
from ..models import features_to_input, init_model
from ..parallel import batch_sharding, make_mesh, replicated, state_sharding
from ..utils import path_names
from .checkpoints import CheckpointManager


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(
    model_type: str,
    num_classes: int,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    params=None,
    dtype=jnp.float32,
) -> tuple[Any, TrainState]:
    model, variables = init_model(
        model_type, num_classes, rng, batch_size=2, dtype=dtype, params=params
    )
    return model, TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats"),
    )


def make_train_step(model, loss_fn: Callable, has_batch_stats: bool,
                    device_pipeline: Callable | None = None):
    """Jittable (state, x, y, mask, rng) -> (state, metrics).

    device_pipeline (optional): (key, x, train) -> model_input, applied
    inside the step — e.g. on-device augmentation + the fused frontend for
    the raw-audio training path (data/augment.py)."""

    def train_step(state: TrainState, x, y, mask, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if device_pipeline is not None:
            pipe_rng = jax.random.fold_in(step_rng, 1)
            x = device_pipeline(pipe_rng, x, True)

        def compute_loss(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                logits, new_vars = model.apply(
                    variables, x, train=True,
                    rngs={"dropout": step_rng}, mutable=["batch_stats"],
                )
            else:
                logits = model.apply(
                    variables, x, train=True, rngs={"dropout": step_rng}
                )
                new_vars = {}
            losses = loss_fn(y, logits)
            denom = jnp.maximum(mask.sum(), 1.0)
            loss = (losses * mask).sum() / denom
            acc = (
                ((jnp.argmax(logits, -1) == y).astype(jnp.float32) * mask).sum()
                / denom
            )
            return loss, (new_vars, acc)

        (loss, (new_vars, acc)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if has_batch_stats:
            state = state.replace(batch_stats=new_vars["batch_stats"])
        return state, {"loss": loss, "accuracy": acc}

    return train_step


def make_eval_step(model, loss_fn: Callable, has_batch_stats: bool,
                   device_pipeline: Callable | None = None):
    """Jittable (state, x, y, mask) -> summed metrics (host divides)."""

    def eval_step(state: TrainState, x, y, mask):
        if device_pipeline is not None:
            x = device_pipeline(None, x, False)
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, x, train=False)
        losses = loss_fn(y, logits)
        correct = (jnp.argmax(logits, -1) == y).astype(jnp.float32) * mask
        return {
            "loss_sum": (losses * mask).sum(),
            "correct": correct.sum(),
            "count": mask.sum(),
        }

    return eval_step


@dataclass
class TrainerConfig:
    batch_size: int = 512
    epochs: int = 100
    log_dir: str = os.path.join("logs", "000")
    early_stopping_patience: int = 50
    plateau_patience: int = 10
    plateau_factor: float = 0.5
    plateau_min_lr: float = 1e-10
    use_plateau: bool = True  # disabled when a decay schedule is active
    max_keep: int = 5
    seed: int = 0
    log_tensorboard: bool = True


@dataclass
class EpochMetrics:
    epoch: int
    loss: float
    accuracy: float
    val_loss: float
    val_accuracy: float
    seconds: float
    lr: float | None = None


class Trainer:
    """Mesh-sharded training loop with the reference's callback semantics."""

    def __init__(
        self,
        model,
        state: TrainState,
        model_type: str,
        num_classes: int,
        config: TrainerConfig,
        background_bias: float | None = None,
        mesh=None,
        checkpoint_meta: dict | None = None,
        average_type: str | None = None,
        device_pipeline: Callable | None = None,
    ):
        self.model = model
        self.model_type = model_type
        self.device_pipeline = device_pipeline
        self.config = config
        self.checkpoint_meta = checkpoint_meta or {
            "model_type": model_type, "num_classes": num_classes,
        }
        self.mesh = mesh if mesh is not None else make_mesh()
        self.has_batch_stats = state.batch_stats is not None
        loss_fn = make_loss_fn(num_classes, background_bias)

        repl = replicated(self.mesh)
        data = batch_sharding(self.mesh)
        st_shard = state_sharding(state, self.mesh)
        self.state = jax.device_put(state, st_shard)
        self._st_shard = st_shard

        # EMA/SWA parameter averaging (model_utils.py:61-100 equivalent;
        # 'lookahead' is handled inside the optimizer, see optim.py)
        self.averager = None
        if average_type and average_type.lower() in ("ema", "swa", "lookahead"):
            from .averaging import WeightAverager

            self.averager = WeightAverager(average_type, self.state.params)

        self._train_step = jax.jit(
            make_train_step(model, loss_fn, self.has_batch_stats,
                            device_pipeline),
            in_shardings=(st_shard, data, data, data, repl),
            out_shardings=(st_shard, repl),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_eval_step(model, loss_fn, self.has_batch_stats,
                           device_pipeline),
            in_shardings=(st_shard, data, data, data),
            out_shardings=repl,
        )
        self._data_sharding = data
        self.history: list[EpochMetrics] = []

    # -- data placement ------------------------------------------------------

    def _device_batch(self, x, y, valid):
        if self.device_pipeline is None:
            x = features_to_input(jnp.asarray(x), self.model_type)
        else:  # raw-audio path: the pipeline featurises inside the step
            x = jnp.asarray(x)
        y = jnp.asarray(y)
        # host-side mask (one device_put instead of three tiny dispatches)
        mask = (np.arange(len(y)) < valid).astype(np.float32)
        put = partial(jax.device_put, device=self._data_sharding)
        return put(x), put(y), put(mask)

    # -- epoch loops ---------------------------------------------------------

    def run_epoch(self, ds: Dataset, rng: jax.Array, epoch: int) -> dict:
        cfg = self.config
        totals = {"loss": 0.0, "accuracy": 0.0}
        n_batches = 0
        for x, y, valid in batch_iterator(
            ds, cfg.batch_size, shuffle=True, seed=cfg.seed + epoch
        ):
            xb, yb, mb = self._device_batch(x, y, valid)
            self.state, metrics = self._train_step(self.state, xb, yb, mb, rng)
            if self.averager is not None:
                synced = self.averager.observe(
                    int(self.state.step), self.state.params
                )
                if synced is not None:  # lookahead fast-weights reset
                    self.state = self.state.replace(
                        params=jax.device_put(synced, self._st_shard.params)
                    )
            totals["loss"] += float(metrics["loss"])
            totals["accuracy"] += float(metrics["accuracy"])
            n_batches += 1
        return {k: v / max(n_batches, 1) for k, v in totals.items()}

    def _eval_state(self):
        """State used for evaluation/checkpoints — averaged params when
        EMA/SWA is active (lookahead evaluates the live fast weights)."""
        if self.averager is None or self.averager.average_type == "lookahead":
            return self.state
        return jax.device_put(
            self.state.replace(params=self.averager.params), self._st_shard
        )

    def evaluate(self, ds: Dataset) -> dict:
        sums = {"loss_sum": 0.0, "correct": 0.0, "count": 0.0}
        eval_state = self._eval_state()
        for x, y, valid in batch_iterator(
            ds, self.config.batch_size, shuffle=False
        ):
            xb, yb, mb = self._device_batch(x, y, valid)
            out = self._eval_step(eval_state, xb, yb, mb)
            for k in sums:
                sums[k] += float(out[k])
        count = max(sums["count"], 1.0)
        return {
            "loss": sums["loss_sum"] / count,
            "accuracy": sums["correct"] / count,
        }

    # -- LR plateau (host-side; only for injectable constant-LR optimizers) --

    def _current_lr(self):
        hp = _find_hyperparams(self.state.opt_state)
        return float(hp["learning_rate"]) if hp is not None else None

    def _scale_lr(self, factor: float):
        def scale(path, leaf):
            names = path_names(path)
            if "hyperparams" in names and "learning_rate" in names:
                return jnp.maximum(leaf * factor, self.config.plateau_min_lr)
            return leaf

        new_opt_state = jax.tree_util.tree_map_with_path(scale, self.state.opt_state)
        self.state = self.state.replace(opt_state=new_opt_state)

    # -- fit -----------------------------------------------------------------

    def fit(self, train_ds: Dataset, val_ds: Dataset, verbose: bool = True):
        cfg = self.config
        os.makedirs(cfg.log_dir, exist_ok=True)
        ckpt = CheckpointManager(
            cfg.log_dir, max_keep=cfg.max_keep, meta=self.checkpoint_meta
        )
        logger = MetricsLogger(cfg.log_dir, tensorboard=cfg.log_tensorboard)
        rng = jax.random.PRNGKey(cfg.seed)

        best_val_acc = -np.inf
        epochs_since_best = 0
        plateau_wait = 0

        for epoch in range(1, cfg.epochs + 1):
            t0 = time.time()
            train_metrics = self.run_epoch(train_ds, rng, epoch)
            val_metrics = self.evaluate(val_ds)
            dt = time.time() - t0

            em = EpochMetrics(
                epoch=epoch,
                loss=train_metrics["loss"],
                accuracy=train_metrics["accuracy"],
                val_loss=val_metrics["loss"],
                val_accuracy=val_metrics["accuracy"],
                seconds=dt,
                lr=self._current_lr(),
            )
            self.history.append(em)
            logger.log(em)
            if verbose:
                print(
                    f"Epoch {epoch}/{cfg.epochs} - {dt:.1f}s - "
                    f"loss: {em.loss:.4f} - accuracy: {em.accuracy:.4f} - "
                    f"val_loss: {em.val_loss:.4f} - val_accuracy: {em.val_accuracy:.4f}"
                )

            # TerminateOnNaN (train.py:41)
            if not np.isfinite(em.loss):
                print("NaN loss encountered — terminating training.")
                break

            # best checkpoint + keep-5 cleanup (train.py:31-37, callbacks.py:9-21)
            if em.val_accuracy > best_val_acc:
                best_val_acc = em.val_accuracy
                epochs_since_best = 0
                plateau_wait = 0
                ckpt.save_epoch(self._eval_state(), em)
            else:
                epochs_since_best += 1
                plateau_wait += 1

            # ReduceLROnPlateau (train.py:38) — only without a decay schedule
            if cfg.use_plateau and plateau_wait >= cfg.plateau_patience:
                if self._current_lr() is not None:
                    self._scale_lr(cfg.plateau_factor)
                    if verbose:
                        print(f"Reducing learning rate to {self._current_lr():.3e}")
                plateau_wait = 0

            # EarlyStopping (train.py:39)
            if epochs_since_best >= cfg.early_stopping_patience:
                if verbose:
                    print(f"Early stopping at epoch {epoch}.")
                break

        ckpt.save_final(self._eval_state())
        logger.close()
        return self.history


def _find_hyperparams(opt_state):
    """Locate an inject_hyperparams dict holding 'learning_rate'."""
    found = []

    def visit(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            found.append(hp)
        if isinstance(node, (tuple, list)):
            for child in node:
                visit(child)

    visit(opt_state)
    return found[0] if found else None


class MetricsLogger:
    """CSV metrics log + optional TensorBoard scalars (train.py:30 equivalent)."""

    def __init__(self, log_dir: str, tensorboard: bool = True):
        self.csv_path = os.path.join(log_dir, "metrics.csv")
        self._csv = open(self.csv_path, "a")
        if os.path.getsize(self.csv_path) == 0:
            self._csv.write(
                "epoch,loss,accuracy,val_loss,val_accuracy,seconds,lr\n"
            )
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def log(self, em: EpochMetrics):
        self._csv.write(
            f"{em.epoch},{em.loss:.6f},{em.accuracy:.6f},"
            f"{em.val_loss:.6f},{em.val_accuracy:.6f},{em.seconds:.3f},"
            f"{'' if em.lr is None else em.lr}\n"
        )
        self._csv.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default(step=em.epoch):
                tf.summary.scalar("loss", em.loss)
                tf.summary.scalar("accuracy", em.accuracy)
                tf.summary.scalar("val_loss", em.val_loss)
                tf.summary.scalar("val_accuracy", em.val_accuracy)
                if em.lr is not None:
                    tf.summary.scalar("lr", em.lr)

    def close(self):
        self._csv.close()
        if self._tb is not None:
            self._tb.close()
