"""Multi-epoch fit scan (Trainer.epochs_per_dispatch>1) vs the per-epoch
fit path: identical epoch math, callback decisions and final state.

The chunked path runs K epochs of train scan + val pass + callback logic
(best-checkpoint tracking, ReduceLROnPlateau, EarlyStopping,
TerminateOnNaN — train.py:30-43 equivalents) inside ONE jitted dispatch;
these tests pin that it is a pure latency optimisation: every metric row
and the final params must match the reference-cadence per-epoch loop.
"""
import os

import numpy as np
import pytest

import jax

from tpu_speech_commands.data.dataset import Dataset
from tpu_speech_commands.optim import get_optimizer
from tpu_speech_commands.training import Trainer, TrainerConfig, create_train_state

N_CLASSES = 5


def _datasets(n_train=96, n_val=32, seed=0):
    rng = np.random.default_rng(seed)
    # learnable structure: class-dependent mean shift
    y_tr = rng.integers(0, N_CLASSES, n_train).astype(np.int32)
    y_va = rng.integers(0, N_CLASSES, n_val).astype(np.int32)
    x_tr = rng.standard_normal((n_train, 30, 20)).astype(np.float32)
    x_va = rng.standard_normal((n_val, 30, 20)).astype(np.float32)
    x_tr += y_tr[:, None, None] * 0.5
    x_va += y_va[:, None, None] * 0.5
    return Dataset(x_tr, y_tr), Dataset(x_va, y_va)


def _run_fit(tmp_path, tag, epochs_per_dispatch, epochs=7, lr=1e-2,
             optimizer="adam", decay_type="cosine", average_type=None,
             early_stopping_patience=50, plateau_patience=10,
             model_type="simple_cnn", seed_data=0, injectable=False):
    tx = get_optimizer(optimizer, lr, decay_type=decay_type,
                       decay_steps=100, injectable=injectable)
    model, state = create_train_state(model_type, N_CLASSES, tx,
                                      jax.random.PRNGKey(0))
    cfg = TrainerConfig(
        batch_size=16, epochs=epochs,
        log_dir=str(tmp_path / tag), log_tensorboard=False,
        epochs_per_dispatch=epochs_per_dispatch,
        early_stopping_patience=early_stopping_patience,
        plateau_patience=plateau_patience,
    )
    trainer = Trainer(model, state, model_type, N_CLASSES, cfg,
                      average_type=average_type)
    tr, va = _datasets(seed=seed_data)
    assert trainer._use_scan(tr) and trainer._use_scan(va)
    history = trainer.fit(tr, va, verbose=False)
    params = np.concatenate([
        np.ravel(np.asarray(p))
        for p in jax.tree_util.tree_leaves(
            jax.device_get(trainer.state.params))
    ])
    return history, params, trainer, cfg.log_dir


def _assert_history_equal(h1, h2):
    assert len(h1) == len(h2)
    for a, b in zip(h1, h2):
        assert a.epoch == b.epoch
        np.testing.assert_allclose(
            [a.loss, a.accuracy, a.val_loss, a.val_accuracy],
            [b.loss, b.accuracy, b.val_loss, b.val_accuracy],
            rtol=2e-5, atol=1e-6,
        )
        if a.lr is None or b.lr is None:
            assert a.lr == b.lr
        else:
            np.testing.assert_allclose(a.lr, b.lr, rtol=1e-6)


def test_fit_scan_matches_per_epoch():
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as d:
        tmp = Path(d)
        h_scan, p_scan, _, logdir = _run_fit(tmp, "scan", 3)
        h_ref, p_ref, _, _ = _run_fit(tmp, "ref", 1)
    _assert_history_equal(h_scan, h_ref)
    np.testing.assert_allclose(p_scan, p_ref, rtol=1e-5, atol=1e-6)


def test_fit_scan_writes_final_and_best_checkpoints(tmp_path):
    h, _, _, logdir = _run_fit(tmp_path, "ck", 4, epochs=6)
    assert len(h) == 6
    files = os.listdir(logdir)
    assert "trained_final.npz" in files
    eps = [f for f in files if f.startswith("ep")]
    assert eps, files
    # the best checkpoint is loadable through the standard loader
    from tpu_speech_commands.training import load_checkpoint

    variables, meta = load_checkpoint(os.path.join(logdir, sorted(eps)[-1]))
    assert meta["model_type"] == "simple_cnn"
    assert variables.get("batch_stats") is not None


def test_fit_scan_plateau_lr_matches(tmp_path):
    # injectable constant-LR optimizer + stuck validation: plateau fires;
    # both paths must scale the LR at the same epochs
    kw = dict(epochs=8, optimizer="sgd", decay_type=None, lr=1e-6,
              plateau_patience=2, injectable=True)
    h_scan, p_scan, _, _ = _run_fit(tmp_path, "pscan", 4, **kw)
    h_ref, p_ref, _, _ = _run_fit(tmp_path, "pref", 1, **kw)
    _assert_history_equal(h_scan, h_ref)
    np.testing.assert_allclose(p_scan, p_ref, rtol=1e-5, atol=1e-6)
    lrs = [m.lr for m in h_scan]
    assert any(l is not None and l < 1e-6 * 0.9 for l in lrs), lrs


def test_fit_scan_early_stopping_matches(tmp_path):
    kw = dict(epochs=12, lr=1e-6, early_stopping_patience=3)
    h_scan, p_scan, _, _ = _run_fit(tmp_path, "escan", 5, **kw)
    h_ref, p_ref, _, _ = _run_fit(tmp_path, "eref", 1, **kw)
    assert len(h_scan) < 12  # actually stopped early
    _assert_history_equal(h_scan, h_ref)
    np.testing.assert_allclose(p_scan, p_ref, rtol=1e-5, atol=1e-6)


def test_fit_scan_nan_terminates(tmp_path):
    kw = dict(epochs=9, optimizer="sgd", decay_type=None, lr=1e28)
    h_scan, _, _, d_scan = _run_fit(tmp_path, "nscan", 4, **kw)
    h_ref, _, _, d_ref = _run_fit(tmp_path, "nref", 1, **kw)
    assert len(h_scan) == len(h_ref) < 9
    assert not np.isfinite(h_scan[-1].loss)
    # NaN weights must not be written as trained_final
    assert "trained_final.npz" not in os.listdir(d_scan)
    assert "trained_final.npz" not in os.listdir(d_ref)


@pytest.mark.parametrize("average_type", ["ema", "swa", "lookahead"])
def test_fit_scan_with_averaging_matches(tmp_path, average_type):
    kw = dict(epochs=5, average_type=average_type)
    h_scan, p_scan, t_scan, _ = _run_fit(tmp_path, f"a{average_type}", 3,
                                         **kw)
    h_ref, p_ref, t_ref, _ = _run_fit(tmp_path, f"r{average_type}", 1,
                                      **kw)
    _assert_history_equal(h_scan, h_ref)
    np.testing.assert_allclose(p_scan, p_ref, rtol=1e-5, atol=1e-6)
    a_scan = np.concatenate([
        np.ravel(np.asarray(p)) for p in jax.tree_util.tree_leaves(
            jax.device_get(t_scan.averager.state.avg_params))
    ])
    a_ref = np.concatenate([
        np.ravel(np.asarray(p)) for p in jax.tree_util.tree_leaves(
            jax.device_get(t_ref.averager.state.avg_params))
    ])
    np.testing.assert_allclose(a_scan, a_ref, rtol=1e-5, atol=1e-6)


def test_fit_scan_on_hybrid_mesh(tmp_path):
    """The chunked fit composes with the multi-slice hybrid mesh."""
    from tpu_speech_commands.parallel import make_hybrid_mesh

    tx = get_optimizer("adam", 1e-3, decay_type="cosine", decay_steps=100)
    model, state = create_train_state("simple_cnn", N_CLASSES, tx,
                                      jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=16, epochs=3,
                        log_dir=str(tmp_path / "hyb"),
                        log_tensorboard=False, epochs_per_dispatch=3)
    trainer = Trainer(model, state, "simple_cnn", N_CLASSES, cfg,
                      mesh=make_hybrid_mesh(n_replica=2, n_data=2,
                                            n_model=2))
    tr, va = _datasets()
    history = trainer.fit(tr, va, verbose=False)
    assert len(history) == 3
    assert all(np.isfinite(m.loss) for m in history)
