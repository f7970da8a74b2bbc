"""Weight-averaging (EMA/SWA/lookahead) tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_speech_commands.training.averaging import WeightAverager


def params_of(value):
    return {"w": jnp.full((3,), float(value))}


def test_ema_moves_toward_params():
    avg = WeightAverager("ema", params_of(0.0), ema_decay=0.9)
    for step in range(1, 11):
        avg.observe(step, params_of(1.0))
    w = np.asarray(avg.params["w"])
    np.testing.assert_allclose(w, 1.0 - 0.9 ** 10, rtol=1e-5)


def test_swa_equal_weight_snapshots():
    avg = WeightAverager("swa", params_of(0.0), swa_start=0, swa_period=2)
    # snapshots at steps 0 (init handled below), 2, 4 with values 2.0, 4.0
    values = {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}
    for step in range(5):
        avg.observe(step, params_of(values[step]))
    # snapshots folded: steps 0, 2, 4 -> running mean over init + those
    w = float(np.asarray(avg.params["w"])[0])
    # init avg=0(count0); step0: (0*0+0)/1=0; step2: (0*1+2)/2=1; step4: (1*2+4)/3=2
    assert w == pytest.approx(2.0)


def test_lookahead_sync_returns_params():
    avg = WeightAverager("lookahead", params_of(0.0), sync_period=3,
                         slow_step_size=0.5)
    assert avg.observe(1, params_of(10.0)) is None
    assert avg.observe(2, params_of(10.0)) is None
    synced = avg.observe(3, params_of(10.0))
    assert synced is not None
    np.testing.assert_allclose(np.asarray(synced["w"]), 5.0)  # 0 + .5*(10-0)


def test_trainer_with_ema_runs(tmp_path):
    from tests.test_training import CLASSES, toy_dataset
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.training import Trainer, TrainerConfig, create_train_state

    tx = get_optimizer("adam", 3e-3, decay_type=None)
    model, state = create_train_state("simple_cnn_lite", len(CLASSES), tx,
                                      jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=16, epochs=3, log_dir=str(tmp_path),
                        log_tensorboard=False)
    trainer = Trainer(model, state, "simple_cnn_lite", len(CLASSES), cfg,
                      average_type="ema")
    history = trainer.fit(toy_dataset(), toy_dataset(8, seed=1), verbose=False)
    assert np.isfinite(history[-1].val_loss)
    assert trainer.averager is not None
    # averaged params differ from live params after training
    live = np.concatenate([np.ravel(x) for x in
                           jax.tree_util.tree_leaves(trainer.state.params)])
    avg = np.concatenate([np.ravel(x) for x in
                          jax.tree_util.tree_leaves(trainer.averager.params)])
    assert not np.allclose(live, avg)


@pytest.mark.parametrize("avg_type,kwargs", [
    ("ema", {"ema_decay": 0.9}),
    ("swa", {"swa_start": 0, "swa_period": 3}),
    ("lookahead", {"sync_period": 4, "slow_step_size": 0.5}),
])
def test_scan_update_matches_observe(avg_type, kwargs):
    """The in-scan averaging update (scan_update) must be step-for-step
    identical to the host-loop observe() twin, including the lookahead
    fast-weight resets feeding back into the parameter trajectory."""
    rng = np.random.default_rng(0)
    seq = [
        {"w": jnp.asarray(rng.standard_normal(5).astype(np.float32))}
        for _ in range(25)
    ]
    zero5 = {"w": jnp.zeros(5, jnp.float32)}
    host = WeightAverager(avg_type, zero5, **kwargs)
    dev = WeightAverager(avg_type, zero5, **kwargs)
    dev_state = dev.state

    host_params = [jax.tree_util.tree_map(jnp.asarray, p) for p in seq]
    dev_params = [jax.tree_util.tree_map(jnp.asarray, p) for p in seq]
    for step in range(1, 26):
        # host twin: observe() after the optimizer step; on lookahead sync
        # the returned params replace the live ones (trainer semantics)
        synced = host.observe(step, host_params[step - 1])
        if synced is not None:
            host_params[step - 1] = synced
        # device twin
        dev_state, new_p = dev.scan_update(
            jnp.asarray(step), dev_params[step - 1], dev_state
        )
        dev_params[step - 1] = new_p

        np.testing.assert_allclose(
            np.asarray(host.params["w"]),
            np.asarray(dev_state.avg_params["w"]),
            rtol=1e-6, atol=1e-7,
            err_msg=f"{avg_type} step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(host_params[step - 1]["w"]),
            np.asarray(dev_params[step - 1]["w"]),
            rtol=1e-6, atol=1e-7,
            err_msg=f"{avg_type} params step {step}",
        )
    assert int(host.state.count) == int(dev_state.count)


@pytest.mark.parametrize("avg_type", ["ema", "swa", "lookahead"])
def test_trainer_scan_path_with_averaging(avg_type, tmp_path):
    """Averaging no longer forces the per-batch loop: the whole-epoch scan
    carries the averager state and training still learns."""
    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.training import Trainer, TrainerConfig, create_train_state

    rng = np.random.default_rng(1)
    n, n_cls = 96, 3
    centers = rng.standard_normal((n_cls, 30, 20)) * 2
    x = np.concatenate([
        centers[c] + 0.3 * rng.standard_normal((n // n_cls, 30, 20))
        for c in range(n_cls)
    ]).astype(np.float32)
    y = np.repeat(np.arange(n_cls), n // n_cls).astype(np.int32)
    ds = Dataset(x, y)

    tx = get_optimizer("adam", 3e-3, decay_type=None)
    model, state = create_train_state("simple_cnn_lite", n_cls, tx,
                                      jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=32, epochs=8,
                        log_dir=str(tmp_path / "logs"),
                        log_tensorboard=False)
    trainer = Trainer(model, state, "simple_cnn_lite", n_cls, cfg,
                      average_type=avg_type)
    assert trainer._use_scan(ds)
    history = trainer.fit(ds, ds, verbose=False)
    assert history[-1].loss < history[0].loss
    assert int(trainer.averager.state.count) > 0
