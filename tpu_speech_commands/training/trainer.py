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
from ..models import init_model
from ..models.factory import features_to_input, is_cnn
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
    # epochs per device dispatch on the fit-scan fast path: train + val +
    # callback logic for this many epochs run as ONE jitted call, so the
    # per-epoch tunnel round-trip and host metric fetch amortize away
    # (the 531k-vs-798k samples/s fit-loop gap, ROADMAP).  1 disables the
    # path (per-epoch dispatches, exact reference checkpoint cadence).
    epochs_per_dispatch: int = 10


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

        # EMA/SWA/lookahead parameter averaging — ALL implemented by
        # training/averaging.WeightAverager (model_utils.py:61-100
        # equivalent); the optimizer chain is untouched
        self.averager = None
        if average_type:
            # WeightAverager validates the type and raises on a typo —
            # a membership test here would silently drop the user's
            # averaging request instead
            from .averaging import WeightAverager

            self.averager = WeightAverager(average_type, self.state.params)

        # metric accumulation rides INSIDE the jitted step: on axon every
        # eager op dispatch is a tunnel round-trip, so the fit loop must
        # issue exactly one device call per batch
        base_train = make_train_step(model, loss_fn, self.has_batch_stats,
                                     device_pipeline)

        def train_step_acc(state, x, y, mask, rng, totals):
            state, metrics = base_train(state, x, y, mask, rng)
            return state, jax.tree_util.tree_map(jnp.add, totals, metrics)

        self._train_step_acc = jax.jit(
            train_step_acc,
            in_shardings=(st_shard, data, data, data, repl, repl),
            out_shardings=(st_shard, repl),
            donate_argnums=(0, 5),
        )
        base_eval = make_eval_step(model, loss_fn, self.has_batch_stats,
                                   device_pipeline)

        def eval_step_acc(state, x, y, mask, sums):
            out = base_eval(state, x, y, mask)
            return jax.tree_util.tree_map(jnp.add, sums, out)

        self._eval_step_acc = jax.jit(
            eval_step_acc,
            in_shardings=(st_shard, data, data, data, repl),
            out_shardings=repl,
            donate_argnums=(4,),
        )
        # Whole-epoch jitted scans: on the tunneled axon platform each jit
        # dispatch is round-trip-bound and dispatches do NOT pipeline, so a
        # per-batch loop caps at ~25 steps/s regardless of step cost.  With
        # the dataset device-resident, one dispatch runs the entire epoch
        # (shuffle -> scan(train step) -> summed metrics).
        def train_epoch_fn(state, x_all, y_all, m_all, rng, perm_key,
                           avg_state=None):
            n_rows = x_all.shape[0]
            n_b = n_rows // config.batch_size
            perm = jax.random.permutation(perm_key, n_rows)
            # ONE epoch-wide gather, then the scan streams contiguous
            # (B, ...) slices as xs — a per-step 3-array gather kept the
            # fit loop ~30% off the pure step rate (bench_train --fit)
            bshape = (n_b, config.batch_size)
            xs = (
                jnp.take(x_all, perm, axis=0).reshape(
                    bshape + x_all.shape[1:]
                ),
                jnp.take(y_all, perm, axis=0).reshape(bshape),
                jnp.take(m_all, perm, axis=0).reshape(bshape),
            )

            def body(carry, batch):
                st, totals, avg = carry
                xb, yb, mb = batch
                st, metrics = base_train(st, xb, yb, mb, rng)
                if avg is not None:  # EMA/SWA/lookahead ride the scan
                    avg, new_params = self.averager.scan_update(
                        st.step, st.params, avg
                    )
                    st = st.replace(params=new_params)
                totals = jax.tree_util.tree_map(jnp.add, totals, metrics)
                return (st, totals, avg), None

            zeros = {"loss": jnp.float32(0.0), "accuracy": jnp.float32(0.0)}
            (state, totals, avg_state), _ = jax.lax.scan(
                body, (state, zeros, avg_state), xs
            )
            return state, totals, avg_state

        def eval_epoch_fn(state, x_all, y_all, m_all):
            n_b = x_all.shape[0] // config.batch_size
            bshape = (n_b, config.batch_size)

            def body(sums, batch):
                xb, yb, mb = batch
                out = base_eval(state, xb, yb, mb)
                return jax.tree_util.tree_map(jnp.add, sums, out), None

            zeros = {"loss_sum": jnp.float32(0.0), "correct": jnp.float32(0.0),
                     "count": jnp.float32(0.0)}
            sums, _ = jax.lax.scan(
                body, zeros,
                (x_all.reshape(bshape + x_all.shape[1:]),
                 y_all.reshape(bshape), m_all.reshape(bshape)),
            )
            return sums

        def train_epoch_plain(state, x_all, y_all, m_all, rng, perm_key):
            state, totals, _ = train_epoch_fn(state, x_all, y_all, m_all,
                                              rng, perm_key, None)
            return state, totals

        self._train_epoch = jax.jit(
            train_epoch_plain,
            in_shardings=(st_shard, data, data, data, repl, repl),
            out_shardings=(st_shard, repl),
            donate_argnums=(0,),
        )
        if self.averager is not None:
            from .averaging import AveragerState

            avg_shard = AveragerState(avg_params=st_shard.params, count=repl)
            self._train_epoch_avg = jax.jit(
                train_epoch_fn,
                in_shardings=(st_shard, data, data, data, repl, repl,
                              avg_shard),
                out_shardings=(st_shard, repl, avg_shard),
                donate_argnums=(0, 6),
            )
        self._eval_epoch = jax.jit(
            eval_epoch_fn,
            in_shardings=(st_shard, data, data, data),
            out_shardings=repl,
        )
        # un-jitted epoch cores, reused by the multi-epoch fit-scan chunk
        # (_make_fit_chunk) so both fit paths run the identical epoch math
        self._train_epoch_core = train_epoch_fn
        self._eval_epoch_core = eval_epoch_fn
        self._fit_chunk_cache: dict[int, Any] = {}
        self._data_sharding = data
        self._repl_sharding = repl
        self._device_datasets: dict[int, tuple] = {}
        # mirrors state.step without per-step device syncs; seeded from the
        # true optimizer step so restored/fine-tuned states keep averaging
        # schedules (swa_start, lookahead sync_period) aligned with the
        # scan path, which reads st.step directly
        self._host_step = int(jax.device_get(self.state.step))
        self.history: list[EpochMetrics] = []

    # -- data placement ------------------------------------------------------

    def _device_batch(self, x, y, valid):
        # prepare entirely on the host (numpy) — an eager jnp reshape here
        # would be a separate device dispatch (tunnel round-trip) per batch
        x = np.asarray(x)
        if self.device_pipeline is None:  # raw-audio pipeline feeds audio
            x = features_to_input(x, self.model_type)
        mask = (np.arange(len(y)) < valid).astype(np.float32)
        put = partial(jax.device_put, device=self._data_sharding)
        return put(x), put(np.asarray(y)), put(mask)

    # max bytes staged on device for the whole-epoch scan path; larger
    # datasets use the per-batch loop instead (weight averaging rides the
    # scan too, via averager.scan_update inside the epoch body)
    scan_staging_limit_bytes: int = 2 << 30

    def _use_scan(self, ds: Dataset) -> bool:
        # gate on what _stage_dataset actually places on device (float32
        # x + int32 y + float32 mask), not the host dtype — int16 raw
        # audio would otherwise pass the cap at half its staged footprint
        staged = ds.x.size * 4 + len(ds) * 8
        return staged <= self.scan_staging_limit_bytes

    @staticmethod
    def _stage_fingerprint(ds: Dataset) -> bytes:
        """Cheap content fingerprint of a staged dataset: shapes plus a
        hash over boundary slices (first/last x rows, head/tail of y).
        Samples O(row) bytes, not the whole array — enough to catch the
        common in-place mutations (augmenting x in place, relabeling y)
        without an O(N) pass per epoch."""
        import hashlib

        h = hashlib.blake2b(digest_size=16)
        h.update(repr((ds.x.shape, str(ds.x.dtype), ds.y.shape)).encode())
        if len(ds.x):
            h.update(np.ascontiguousarray(ds.x[0]).tobytes())
            h.update(np.ascontiguousarray(ds.x[-1]).tobytes())
            h.update(np.ascontiguousarray(ds.y[:64]).tobytes())
            h.update(np.ascontiguousarray(ds.y[-64:]).tobytes())
        return h.digest()

    def _stage_dataset(self, ds: Dataset):
        """Pad ds to a batch multiple and place it on device ONCE (cached);
        returns (x_all, y_all, mask_all, n_batches).  The cache holds
        references to ds.x AND ds.y and validates both identities — an
        id() key alone could collide when a freed Dataset's id is reused,
        and a relabeled dataset wrapping the same x must restage.  Arrays
        mutated IN PLACE are detected by a boundary-slice fingerprint and
        raise — build a new Dataset (or new arrays) instead of mutating
        staged ones."""
        key = id(ds)
        cached = self._device_datasets.get(key)
        if cached is not None and cached[0] is ds.x and cached[1] is ds.y:
            if self._stage_fingerprint(ds) != cached[3]:
                raise ValueError(
                    "staged dataset was mutated in place after staging; "
                    "the device copy would silently serve stale data — "
                    "build a new Dataset (new arrays) instead of mutating "
                    "one the trainer has staged"
                )
            # LRU refresh: the eviction below drops the OLDEST entry, and
            # without move-on-hit a fit rotating >4 datasets would evict
            # and restage the training set itself every epoch
            self._device_datasets[key] = self._device_datasets.pop(key)
            return cached[2]
        b = self.config.batch_size
        n = len(ds)
        n_pad = max(1, -(-n // b)) * b
        x = np.asarray(ds.x, np.float32)
        if self.device_pipeline is None:  # raw-audio pipeline feeds audio
            x = features_to_input(x, self.model_type)
        x_all = np.zeros((n_pad,) + x.shape[1:], np.float32)
        x_all[:n] = x
        y_all = np.zeros(n_pad, np.int32)
        y_all[:n] = np.asarray(ds.y, np.int32)
        if n_pad > n and n > 0:
            # pad with REPEATED real rows, not zeros: pad rows are masked
            # out of loss/metrics but still enter BatchNorm batch stats
            # (model.apply sees the whole batch) — zero rows would skew
            # the running stats the eval pass uses.  The reference's
            # Keras fit runs a ragged final batch with no pads at all.
            rep = np.arange(n_pad - n) % n
            x_all[n:] = x_all[rep]
            y_all[n:] = y_all[rep]
        m_all = np.zeros(n_pad, np.float32)
        m_all[:n] = 1.0
        put = partial(jax.device_put, device=self._data_sharding)
        staged = (put(x_all), put(y_all), put(m_all), n_pad // b)
        self._device_datasets[key] = (ds.x, ds.y, staged,
                                      self._stage_fingerprint(ds))
        # bound the cache: a fit uses train+val; evaluating many held-out
        # datasets must not pin a staging-cap's worth of HBM per dataset
        while len(self._device_datasets) > 4:
            oldest = next(iter(self._device_datasets))
            del self._device_datasets[oldest]
        return staged

    # -- epoch loops ---------------------------------------------------------

    def run_epoch(self, ds: Dataset, rng: jax.Array, epoch: int) -> dict:
        """One pass over ds.  The loop never synchronises with the device:
        per-step metrics accumulate in a device-resident sum (async adds)
        and are fetched ONCE at epoch end — a float() per step would block
        on every train step (and cost a tunnel round-trip each)."""
        cfg = self.config
        if self._use_scan(ds):
            x_all, y_all, m_all, n_b = self._stage_dataset(ds)
            perm_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch)
            if self.averager is not None:
                self.state, totals, self.averager.state = (
                    self._train_epoch_avg(
                        self.state, x_all, y_all, m_all, rng, perm_key,
                        self.averager.state,
                    )
                )
            else:
                self.state, totals = self._train_epoch(
                    self.state, x_all, y_all, m_all, rng, perm_key
                )
            self._host_step += n_b
            host = jax.device_get(totals)
            return {k: float(v) / n_b for k, v in host.items()}

        totals = jax.device_put(
            {"loss": jnp.float32(0.0), "accuracy": jnp.float32(0.0)},
            self._repl_sharding,
        )
        n_batches = 0
        for x, y, valid in batch_iterator(
            ds, cfg.batch_size, shuffle=True, seed=cfg.seed + epoch
        ):
            xb, yb, mb = self._device_batch(x, y, valid)
            self.state, totals = self._train_step_acc(
                self.state, xb, yb, mb, rng, totals
            )
            self._host_step += 1
            if self.averager is not None:
                synced = self.averager.observe(
                    self._host_step, self.state.params
                )
                if synced is not None:  # lookahead fast-weights reset
                    self.state = self.state.replace(
                        params=jax.device_put(synced, self._st_shard.params)
                    )
            n_batches += 1
        if n_batches == 0:
            return {"loss": 0.0, "accuracy": 0.0}
        host = jax.device_get(totals)  # single sync per epoch
        return {k: float(v) / n_batches for k, v in host.items()}

    def _eval_state(self):
        """State used for evaluation/checkpoints — averaged params when
        EMA/SWA is active (lookahead evaluates the live fast weights)."""
        if self.averager is None or self.averager.average_type == "lookahead":
            return self.state
        return jax.device_put(
            self.state.replace(params=self.averager.params), self._st_shard
        )

    def evaluate(self, ds: Dataset) -> dict:
        if self._use_scan(ds):
            x_all, y_all, m_all, _ = self._stage_dataset(ds)
            host = jax.device_get(
                self._eval_epoch(self._eval_state(), x_all, y_all, m_all)
            )
            count = max(float(host["count"]), 1.0)
            return {
                "loss": float(host["loss_sum"]) / count,
                "accuracy": float(host["correct"]) / count,
            }

        sums = jax.device_put(
            {"loss_sum": jnp.float32(0.0), "correct": jnp.float32(0.0),
             "count": jnp.float32(0.0)}, self._repl_sharding,
        )
        eval_state = self._eval_state()
        n_batches = 0
        for x, y, valid in batch_iterator(
            ds, self.config.batch_size, shuffle=False
        ):
            xb, yb, mb = self._device_batch(x, y, valid)
            sums = self._eval_step_acc(eval_state, xb, yb, mb, sums)
            n_batches += 1
        if n_batches == 0:
            return {"loss": 0.0, "accuracy": 0.0}
        host = jax.device_get(sums)  # single sync per eval pass
        count = max(float(host["count"]), 1.0)
        return {
            "loss": float(host["loss_sum"]) / count,
            "accuracy": float(host["correct"]) / count,
        }

    # -- multi-epoch fit scan ------------------------------------------------
    #
    # The per-epoch fit loop costs one dispatch + one blocking metric
    # fetch per train epoch and another per val pass; through the axon
    # tunnel that is ~3 round-trips of device idle per epoch, which is
    # the measured 531k-vs-798k samples/s fit-loop gap (ROADMAP).  The
    # TPU-native fix is to move the WHOLE fit inner loop device-side:
    # one jitted call runs `epochs_per_dispatch` epochs of train scan +
    # val pass + the reference's callback decisions (best-checkpoint
    # tracking, ReduceLROnPlateau, EarlyStopping, TerminateOnNaN) with
    # identical semantics, returning a (K, 8) metrics table the host
    # logs afterwards.  Checkpoint files for improving epochs are
    # written once per chunk (the best epoch in the chunk, with the
    # exact params/batch_stats of that epoch, kept device-side in the
    # callback carry) instead of once per improving epoch — the only
    # observable difference from the per-epoch path, which remains
    # available via epochs_per_dispatch=1.

    def _cb_sharding(self):
        repl = self._repl_sharding
        return {
            "best_val": repl, "best_epoch": repl, "best_metrics": repl,
            "best_params": self._st_shard.params,
            "best_batch_stats": (self._st_shard.batch_stats
                                 if self.has_batch_stats else None),
            "since_best": repl, "plateau_wait": repl,
            "nan_seen": repl, "early_stopped": repl,
            "stopped": repl, "stop_epoch": repl,
        }

    def _init_cb(self):
        """Device-side callback state (one dispatch)."""
        zeros = partial(jax.tree_util.tree_map,
                        lambda a: jnp.zeros_like(a))

        def build(params, batch_stats):
            return {
                "best_val": jnp.float32(-jnp.inf),
                "best_epoch": jnp.int32(-1),
                "best_metrics": jnp.zeros(4, jnp.float32),
                "best_params": zeros(params),
                "best_batch_stats": (zeros(batch_stats)
                                     if self.has_batch_stats else None),
                "since_best": jnp.int32(0),
                "plateau_wait": jnp.int32(0),
                "nan_seen": jnp.asarray(False),
                "early_stopped": jnp.asarray(False),
                "stopped": jnp.asarray(False),
                "stop_epoch": jnp.int32(-1),
            }

        return jax.jit(build, out_shardings=self._cb_sharding())(
            self.state.params, self.state.batch_stats
        )

    def _fit_chunk_fn(self, k_epochs: int):
        """Jitted K-epoch fit chunk, cached per K (<=2 distinct K per fit)."""
        fn = self._fit_chunk_cache.get(k_epochs)
        if fn is not None:
            return fn
        cfg = self.config
        train_epoch = self._train_epoch_core
        eval_epoch = self._eval_epoch_core
        averager = self.averager
        lr_injectable = _find_hyperparams(self.state.opt_state) is not None
        eval_on_avg = (averager is not None
                       and averager.average_type != "lookahead")

        def chunk(state, avg, cb, xt, yt, mt, xv, yv, mv, rng, epoch_idx):
            n_b = jnp.float32(xt.shape[0] // cfg.batch_size)

            def live(operand):
                state, avg, cb, epoch_i = operand
                perm_key = jax.random.fold_in(
                    jax.random.PRNGKey(cfg.seed), epoch_i
                )
                state, totals, avg = train_epoch(
                    state, xt, yt, mt, rng, perm_key, avg
                )
                eval_state = (state.replace(params=avg.avg_params)
                              if eval_on_avg else state)
                sums = eval_epoch(eval_state, xv, yv, mv)
                loss = totals["loss"] / n_b
                acc = totals["accuracy"] / n_b
                count = jnp.maximum(sums["count"], 1.0)
                val_loss = sums["loss_sum"] / count
                val_acc = sums["correct"] / count

                # TerminateOnNaN fires before any callback reacts (the
                # per-epoch loop breaks before best/plateau/early-stop)
                nan = jnp.logical_not(jnp.isfinite(loss))
                improved = jnp.logical_and(val_acc > cb["best_val"],
                                           jnp.logical_not(nan))

                def sel(new, old):
                    return jax.tree_util.tree_map(
                        lambda a, b: jnp.where(improved, a, b), new, old
                    )

                cb = dict(cb)
                cb["best_val"] = jnp.where(improved, val_acc,
                                           cb["best_val"])
                cb["best_epoch"] = jnp.where(improved, epoch_i,
                                             cb["best_epoch"])
                cb["best_metrics"] = sel(
                    jnp.stack([loss, acc, val_loss, val_acc]),
                    cb["best_metrics"],
                )
                cb["best_params"] = sel(eval_state.params,
                                        cb["best_params"])
                if cb["best_batch_stats"] is not None:
                    cb["best_batch_stats"] = sel(eval_state.batch_stats,
                                                 cb["best_batch_stats"])
                not_nan = jnp.logical_not(nan)
                since = jnp.where(
                    nan, cb["since_best"],
                    jnp.where(improved, 0, cb["since_best"] + 1),
                )
                wait = jnp.where(
                    nan, cb["plateau_wait"],
                    jnp.where(improved, 0, cb["plateau_wait"] + 1),
                )
                # the logged lr is captured BEFORE any plateau scaling —
                # the per-epoch path builds EpochMetrics before the
                # plateau check, so a firing epoch logs the pre-scale lr
                if lr_injectable:
                    lr = jnp.asarray(
                        _find_hyperparams(state.opt_state)["learning_rate"],
                        jnp.float32,
                    ).reshape(())
                else:
                    lr = jnp.float32(jnp.nan)
                fire = jnp.logical_and(
                    jnp.asarray(cfg.use_plateau),
                    jnp.logical_and(wait >= cfg.plateau_patience, not_nan),
                )
                if cfg.use_plateau and lr_injectable:
                    def scale(path, leaf):
                        names = path_names(path)
                        if "hyperparams" in names and \
                                "learning_rate" in names:
                            return jnp.where(
                                fire,
                                jnp.maximum(leaf * cfg.plateau_factor,
                                            cfg.plateau_min_lr),
                                leaf,
                            )
                        return leaf

                    state = state.replace(
                        opt_state=jax.tree_util.tree_map_with_path(
                            scale, state.opt_state
                        )
                    )
                wait = jnp.where(fire, 0, wait)
                early = jnp.logical_and(
                    since >= cfg.early_stopping_patience, not_nan
                )
                stopped = jnp.logical_or(nan, early)
                cb["since_best"], cb["plateau_wait"] = since, wait
                cb["nan_seen"] = jnp.logical_or(cb["nan_seen"], nan)
                cb["early_stopped"] = jnp.logical_or(cb["early_stopped"],
                                                     early)
                cb["stopped"] = stopped
                cb["stop_epoch"] = jnp.where(
                    jnp.logical_and(stopped, cb["stop_epoch"] < 0),
                    epoch_i, cb["stop_epoch"],
                )
                row = jnp.stack([
                    loss, acc, val_loss, val_acc, lr,
                    improved.astype(jnp.float32),
                    fire.astype(jnp.float32), jnp.float32(1.0),
                ])
                return (state, avg, cb), row

            def skip(operand):
                state, avg, cb, _ = operand
                return (state, avg, cb), jnp.zeros(8, jnp.float32)

            def body(carry, epoch_i):
                state, avg, cb = carry
                running = jnp.logical_not(cb["stopped"])
                (state, avg, cb), row = jax.lax.cond(
                    running, live, skip, (state, avg, cb, epoch_i)
                )
                return (state, avg, cb), row

            (state, avg, cb), rows = jax.lax.scan(
                body, (state, avg, cb), epoch_idx
            )
            return state, avg, cb, rows

        st, repl, data = (self._st_shard, self._repl_sharding,
                          self._data_sharding)
        if averager is not None:
            from .averaging import AveragerState

            avg_shard = AveragerState(avg_params=st.params, count=repl)
        else:
            avg_shard = repl  # empty pytree: no leaves to shard
        cb_shard = self._cb_sharding()
        fn = jax.jit(
            chunk,
            in_shardings=(st, avg_shard, cb_shard, data, data, data,
                          data, data, data, repl, repl),
            out_shardings=(st, avg_shard, cb_shard, repl),
            donate_argnums=(0, 1, 2),
        )
        self._fit_chunk_cache[k_epochs] = fn
        return fn

    def _fit_scan_loop(self, train_ds, val_ds, ckpt, logger, rng,
                       verbose) -> bool:
        """Chunked device-side fit; returns nan_terminated."""
        cfg = self.config
        xt, yt, mt, n_b = self._stage_dataset(train_ds)
        xv, yv, mv, _ = self._stage_dataset(val_ds)
        cb = self._init_cb()
        epoch = 1
        while epoch <= cfg.epochs:
            k = min(cfg.epochs_per_dispatch, cfg.epochs - epoch + 1)
            fn = self._fit_chunk_fn(k)
            idx = jax.device_put(
                np.arange(epoch, epoch + k, dtype=np.int32),
                self._repl_sharding,
            )
            avg_in = self.averager.state if self.averager else None
            t0 = time.time()
            self.state, avg_out, cb, rows = fn(
                self.state, avg_in, cb, xt, yt, mt, xv, yv, mv, rng, idx
            )
            if self.averager is not None:
                self.averager.state = avg_out
            host = np.asarray(jax.device_get(rows))  # one sync per chunk
            dt = time.time() - t0
            ran = int(host[:, 7].sum())
            self._host_step += ran * n_b
            # NOTE: the first chunk's dt includes the K-epoch jit compile,
            # smeared evenly over its epochs — logged/CSV 'seconds' for
            # epochs 1..K are inflated by compile time (benchmarks drop
            # the first chunk; bench_train.bench_fit does)
            per_epoch_s = dt / max(ran, 1)
            # scalar callback outcomes (fetched before cb is donated into
            # the next chunk)
            cb_host = jax.device_get({
                key: cb[key] for key in (
                    "best_epoch", "best_metrics", "nan_seen",
                    "early_stopped", "stop_epoch",
                )
            })
            for i in range(ran):
                e = epoch + i
                lr = float(host[i, 4])
                em = EpochMetrics(
                    epoch=e, loss=float(host[i, 0]),
                    accuracy=float(host[i, 1]),
                    val_loss=float(host[i, 2]),
                    val_accuracy=float(host[i, 3]),
                    seconds=per_epoch_s,
                    lr=None if np.isnan(lr) else lr,
                )
                self.history.append(em)
                logger.log(em)
                if verbose:
                    print(
                        f"Epoch {e}/{cfg.epochs} - {em.seconds:.1f}s - "
                        f"loss: {em.loss:.4f} - "
                        f"accuracy: {em.accuracy:.4f} - "
                        f"val_loss: {em.val_loss:.4f} - "
                        f"val_accuracy: {em.val_accuracy:.4f}"
                    )
                if host[i, 6] and not np.isnan(lr) and verbose:
                    new_lr = max(lr * cfg.plateau_factor,
                                 cfg.plateau_min_lr)
                    print(f"Reducing learning rate to {new_lr:.3e}")
            best_ep = int(cb_host["best_epoch"])
            if best_ep >= epoch:  # improved inside this chunk
                bm = np.asarray(cb_host["best_metrics"], np.float64)
                em_best = EpochMetrics(
                    epoch=best_ep, loss=float(bm[0]),
                    accuracy=float(bm[1]), val_loss=float(bm[2]),
                    val_accuracy=float(bm[3]), seconds=per_epoch_s,
                )
                best_state = self.state.replace(
                    params=cb["best_params"],
                    batch_stats=cb["best_batch_stats"],
                )
                ckpt.save_epoch(best_state, em_best)
            if bool(cb_host["nan_seen"]):
                print("NaN loss encountered — terminating training.")
                return True
            if bool(cb_host["early_stopped"]):
                if verbose:
                    print(
                        f"Early stopping at epoch "
                        f"{int(cb_host['stop_epoch'])}."
                    )
                return False
            epoch += k
        return False

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
        nan_terminated = False

        if (cfg.epochs_per_dispatch > 1 and self._use_scan(train_ds)
                and self._use_scan(val_ds)):
            # device-side fit: K epochs (train + val + callbacks) per
            # dispatch — see the _fit_scan_loop block comment
            nan_terminated = self._fit_scan_loop(
                train_ds, val_ds, ckpt, logger, rng, verbose
            )
            return self._fit_finish(ckpt, logger, nan_terminated)

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
                nan_terminated = True
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

        return self._fit_finish(ckpt, logger, nan_terminated)

    def _fit_finish(self, ckpt, logger, nan_terminated: bool):
        if nan_terminated:
            # the final weights are NaN — writing them would clobber a
            # usable trained_final.npz from an earlier run in this log_dir
            # with garbage that loads without complaint
            print("Not writing trained_final.npz (NaN weights); use the "
                  "last best checkpoint (ep*.npz) instead.")
        else:
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
