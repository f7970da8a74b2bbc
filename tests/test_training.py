"""End-to-end training-slice tests: data pipeline -> trainer -> eval -> ckpt."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_speech_commands.data.dataset import Dataset, batch_iterator, get_dataset
from tpu_speech_commands.data.synthetic import make_synthetic_dataset
from tpu_speech_commands.evaluation import evaluate_accuracy
from tpu_speech_commands.losses import background_bias_weights
from tpu_speech_commands.optim import get_optimizer
from tpu_speech_commands.parallel import make_mesh
from tpu_speech_commands.training import (
    Trainer,
    TrainerConfig,
    create_train_state,
    load_checkpoint,
    restore_state,
    save_checkpoint,
)

CLASSES = ["background", "left", "right"]


def toy_dataset(n_per_class=24, seed=0):
    """Linearly separable synthetic features (N, 30, 20)."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for label in range(len(CLASSES)):
        base = np.zeros((30, 20), np.float32)
        base[:, label * 5 : label * 5 + 5] = 2.0
        x = base + 0.3 * rng.standard_normal((n_per_class, 30, 20)).astype(np.float32)
        xs.append(x)
        ys.append(np.full(n_per_class, label, np.int32))
    return Dataset(np.concatenate(xs), np.concatenate(ys))


def test_batch_iterator_pads_final_batch():
    ds = toy_dataset(n_per_class=10)  # 30 samples
    batches = list(batch_iterator(ds, 16, shuffle=False))
    assert len(batches) == 2
    x, y, valid = batches[-1]
    assert x.shape[0] == 16 and valid == 14


@pytest.mark.parametrize("model_type", ["simple_cnn_lite", "simple_gru"])
def test_training_learns_toy_problem(model_type, tmp_path):
    train_ds = toy_dataset(seed=0)
    val_ds = toy_dataset(n_per_class=8, seed=1)
    tx = get_optimizer("adam", 3e-3, decay_type=None, injectable=True)
    model, state = create_train_state(
        model_type, len(CLASSES), tx, jax.random.PRNGKey(0)
    )
    cfg = TrainerConfig(
        # 12 epochs: BN running stats (momentum .99) need ~30 steps before
        # val accuracy reflects the (perfectly) learned train mapping
        batch_size=16, epochs=12, log_dir=str(tmp_path / "logs"),
        log_tensorboard=False,
    )
    trainer = Trainer(model, state, model_type, len(CLASSES), cfg)
    history = trainer.fit(train_ds, val_ds, verbose=False)
    assert history[-1].loss < history[0].loss
    assert history[-1].val_accuracy > 0.8
    # checkpoint artifacts: best epoch ckpts + final
    files = os.listdir(cfg.log_dir)
    assert "trained_final.npz" in files
    assert any(f.startswith("ep") and f.endswith(".npz") for f in files)
    assert "metrics.csv" in files


def test_background_bias_loss_weighting():
    w = background_bias_weights(0.99, 5)
    np.testing.assert_allclose(w[0], 0.99)
    np.testing.assert_allclose(w[1:], (1 - 0.99) / 4)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    tx = get_optimizer("sgd", 1e-2, decay_type=None)
    model, state = create_train_state("simple_cnn", 3, tx, jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state, {"model_type": "simple_cnn"})
    variables, meta = load_checkpoint(path)
    assert meta["model_type"] == "simple_cnn"
    # value-identical restore
    model2, state2 = create_train_state("simple_cnn", 3, tx, jax.random.PRNGKey(1))
    state2 = restore_state(state2, path)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(state2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_lr_plateau_reduces_lr(tmp_path):
    ds = toy_dataset(n_per_class=6)
    tx = get_optimizer("sgd", 1e-2, decay_type=None, injectable=True)
    model, state = create_train_state("simple_cnn_lite", 3, tx, jax.random.PRNGKey(0))
    cfg = TrainerConfig(
        batch_size=8, epochs=3, log_dir=str(tmp_path / "logs"),
        plateau_patience=1, log_tensorboard=False,
    )
    trainer = Trainer(model, state, "simple_cnn_lite", 3, cfg)
    lr0 = trainer._current_lr()
    assert lr0 == pytest.approx(1e-2)
    trainer._scale_lr(0.5)
    assert trainer._current_lr() == pytest.approx(5e-3)


def test_lr_plateau_reduction_affects_updates():
    """The scaled hyperparam must change the EFFECTIVE update, not just
    the logged value — inject_hyperparams over a schedule would silently
    re-evaluate the original LR every step (the bug this guards)."""
    import jax.numpy as jnp

    tx = get_optimizer("sgd", 0.1, decay_type=None, injectable=True)
    params = {"w": jnp.ones(3)}
    st = tx.init(params)
    st.hyperparams["learning_rate"] = jnp.asarray(0.05)
    grads = {"w": jnp.ones(3)}
    updates, st2 = tx.update(grads, st, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.05, rtol=1e-6)
    assert float(st2.hyperparams["learning_rate"]) == pytest.approx(0.05)


def test_training_on_8_device_mesh(tmp_path):
    assert len(jax.devices()) == 8
    mesh = make_mesh()  # all 8 devices on the data axis
    train_ds = toy_dataset(seed=0)
    val_ds = toy_dataset(n_per_class=8, seed=1)
    tx = get_optimizer("adam", 3e-3, decay_type=None)
    model, state = create_train_state("simple_cnn_lite", 3, tx, jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=16, epochs=2, log_dir=str(tmp_path / "logs"),
                        log_tensorboard=False)
    trainer = Trainer(model, state, "simple_cnn_lite", 3, cfg, mesh=mesh)
    history = trainer.fit(train_ds, val_ds, verbose=False)
    assert np.isfinite(history[-1].loss)


def test_wav_dataset_pipeline_end_to_end(tmp_path):
    from tpu_speech_commands.frontend import Frontend

    root = make_synthetic_dataset(str(tmp_path / "data"), CLASSES, samples_per_class=4)
    train_ds = get_dataset(root, CLASSES, frontend=Frontend(), batch_size=8,
                           use_cache=True)
    assert len(train_ds) == 12
    assert train_ds.x.shape[1:] == (30, 20)
    # cache dir was materialised in reference layout and reloads identically
    cached = get_dataset(root, CLASSES, use_cache=True)
    assert len(cached) == 12
    assert sorted(np.unique(cached.y)) == [0, 1, 2]
    np.testing.assert_allclose(
        np.sort(train_ds.x.sum((1, 2))), np.sort(cached.x.sum((1, 2))), rtol=1e-5
    )


def test_eval_confusion_matrix(tmp_path):
    ds = toy_dataset(n_per_class=8)
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state("simple_cnn", 3, tx, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    acc, conf = evaluate_accuracy(
        model, variables, ds, "simple_cnn", CLASSES,
        batch_size=8, output_path=str(tmp_path), verbose=False,
    )
    assert conf.shape == (3, 3)
    assert conf.sum() == len(ds)
    assert os.path.exists(tmp_path / "confusion_matrix.png")


def test_guard_rails():
    """Construction-time rejections: injectable+schedule (plateau scale
    would be silently reverted), bad background_bias, zero-device mesh,
    max_keep=0 deletes everything."""
    from tpu_speech_commands.losses import background_bias_weights
    from tpu_speech_commands.parallel import make_mesh

    with pytest.raises(ValueError, match="injectable"):
        get_optimizer("adam", 1e-3, decay_type="cosine", injectable=True)
    # capitalised no-decay spellings are accepted (config files pass
    # 'None'/'NONE'), not mistaken for a schedule
    get_optimizer("adam", 1e-3, decay_type="None", injectable=True)
    get_optimizer("adam", 1e-3, decay_type="NONE", injectable=True)
    with pytest.raises(ValueError, match="background_bias"):
        background_bias_weights(1.0, 5)
    with pytest.raises(ValueError, match="2 classes"):
        background_bias_weights(0.5, 1)
    with pytest.raises(ValueError, match="devices"):
        make_mesh(n_model=64)  # > the 8-device test mesh: n_data floors to 0


def test_checkpoint_max_keep_zero(tmp_path):
    """max_keep=0 must keep NO epoch checkpoints (ckpts[:-0] kept all)."""
    from types import SimpleNamespace

    from tpu_speech_commands.training.checkpoints import CheckpointManager

    tx = get_optimizer("adam", 1e-3, decay_type=None)
    _, state = create_train_state("simple_gru", 3, tx, jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path), max_keep=0)
    for ep in range(3):
        em = SimpleNamespace(epoch=ep, loss=1.0, accuracy=0.5,
                             val_loss=1.0, val_accuracy=0.5 + ep * 0.1)
        mgr.save_epoch(state, em)
    import glob as _glob

    assert _glob.glob(str(tmp_path / "ep*.npz")) == []


def test_eval_squeezes_channelized_features_for_rnn(tmp_path):
    """(N, T, F, 1) channelised features (the update_vectors contract)
    into an RNN eval must squeeze the axis like inference_loader, not
    shape-error."""
    from tpu_speech_commands.data.dataset import Dataset

    ds3 = toy_dataset(n_per_class=4)
    ds4 = Dataset(ds3.x[..., None], ds3.y)
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state("simple_gru", 3, tx, jax.random.PRNGKey(0))
    variables = {"params": state.params}  # RNNs carry no batch stats
    kw = dict(batch_size=8, save_plot=False, verbose=False)
    acc4, conf4 = evaluate_accuracy(
        model, variables, ds4, "simple_gru", CLASSES, **kw
    )
    acc3, conf3 = evaluate_accuracy(
        model, variables, ds3, "simple_gru", CLASSES, **kw
    )
    assert acc3 == acc4
    np.testing.assert_array_equal(conf3, conf4)


def test_eval_chunked_staging_matches_single_dispatch(tmp_path, monkeypatch):
    """Eval sets beyond the staging cap run as several scan dispatches;
    accuracy and confusion must be identical to the one-dispatch path."""
    from tpu_speech_commands.evaluation import evaluate as ev

    ds = toy_dataset(n_per_class=16)
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state("simple_cnn", 3, tx, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    kw = dict(batch_size=8, save_plot=False, verbose=False)
    acc1, conf1 = evaluate_accuracy(
        model, variables, ds, "simple_cnn", CLASSES, **kw
    )
    # force ~1 batch per chunk -> 6 chunked dispatches over 48 samples
    monkeypatch.setattr(ev, "SCAN_STAGING_LIMIT_BYTES", 1)
    acc2, conf2 = evaluate_accuracy(
        model, variables, ds, "simple_cnn", CLASSES, **kw
    )
    assert acc1 == acc2
    np.testing.assert_array_equal(conf1, conf2)


def test_nan_termination_preserves_final_checkpoint(tmp_path, capsys):
    """A NaN-terminated fit must NOT write trained_final.npz: the NaN
    weights would silently clobber a usable final checkpoint in the same
    log_dir (they load without complaint and score garbage)."""
    train_ds = toy_dataset(seed=0)
    val_ds = toy_dataset(n_per_class=8, seed=1)
    log_dir = tmp_path / "logs"
    # an infinite LR drives the params (and every later loss) to NaN
    tx = get_optimizer("adam", float("inf"), decay_type=None)
    model, state = create_train_state("simple_cnn_lite", len(CLASSES), tx,
                                      jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=16, epochs=4, log_dir=str(log_dir),
                        log_tensorboard=False, seed=11)
    trainer = Trainer(model, state, "simple_cnn_lite", len(CLASSES), cfg)
    trainer.fit(train_ds, val_ds, verbose=False)
    out = capsys.readouterr().out
    assert "NaN loss encountered" in out
    assert not (log_dir / "trained_final.npz").exists()


def test_unknown_average_type_raises():
    """A typo'd average_type must raise, not silently train unaveraged."""
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state("simple_cnn_lite", len(CLASSES), tx,
                                      jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="average_type"):
        Trainer(model, state, "simple_cnn_lite", len(CLASSES),
                TrainerConfig(batch_size=16, epochs=1, log_tensorboard=False),
                average_type="moving_average")


def test_staged_dataset_inplace_mutation_raises(tmp_path):
    """Mutating a dataset's arrays in place after the trainer staged them
    on device must raise instead of silently serving the stale copy."""
    train_ds = toy_dataset(seed=0)
    tx = get_optimizer("adam", 3e-3, decay_type=None)
    model, state = create_train_state("simple_cnn_lite", len(CLASSES), tx,
                                      jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=16, epochs=1,
                        log_dir=str(tmp_path / "logs"),
                        log_tensorboard=False, seed=3)
    trainer = Trainer(model, state, "simple_cnn_lite", len(CLASSES), cfg)
    trainer._stage_dataset(train_ds)
    train_ds.x[0] += 100.0  # in-place mutation: device copy is now stale
    with pytest.raises(ValueError, match="mutated in place"):
        trainer._stage_dataset(train_ds)
    # a NEW dataset wrapping fresh arrays restages cleanly
    fresh = Dataset(train_ds.x.copy(), train_ds.y.copy())
    trainer._stage_dataset(fresh)


def test_fit_is_deterministic_for_fixed_seed(tmp_path):
    """Two fits with identical seeds/data produce identical histories and
    final params (device-side shuffle + dropout are PRNG-keyed)."""
    def run(tag):
        train_ds = toy_dataset(seed=0)
        val_ds = toy_dataset(n_per_class=8, seed=1)
        tx = get_optimizer("adam", 3e-3, decay_type=None)
        model, state = create_train_state("simple_cnn_lite", len(CLASSES), tx,
                                          jax.random.PRNGKey(0))
        cfg = TrainerConfig(batch_size=16, epochs=3,
                            log_dir=str(tmp_path / tag),
                            log_tensorboard=False, seed=11)
        trainer = Trainer(model, state, "simple_cnn_lite", len(CLASSES), cfg)
        history = trainer.fit(train_ds, val_ds, verbose=False)
        flat = np.concatenate([
            np.ravel(np.asarray(p))
            for p in jax.tree_util.tree_leaves(trainer.state.params)
        ])
        return history, flat

    h1, p1 = run("a")
    h2, p2 = run("b")
    assert [(e.loss, e.val_accuracy) for e in h1] == \
           [(e.loss, e.val_accuracy) for e in h2]
    np.testing.assert_array_equal(p1, p2)
