"""Tensor-parallel mesh tests: the full train step on a 4x2 ('data','model')
mesh must be numerically identical to the single-device run, and the
megatron-pair TP rules (parallel/mesh.py param_spec) must actually shard
the dense layers — not silently fall back to replication."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpu_speech_commands.losses import make_loss_fn
from tpu_speech_commands.optim import get_optimizer
from tpu_speech_commands.parallel import (
    batch_sharding,
    make_mesh,
    replicated,
    state_sharding,
)
from tpu_speech_commands.parallel.mesh import MODEL_AXIS, param_spec
from tpu_speech_commands.training import create_train_state
from tpu_speech_commands.training.trainer import make_eval_step, make_train_step


def _run_train_step(n_data, n_model, model_type="simple_cnn"):
    tx = get_optimizer("sgd", 1e-2, decay_type=None)
    rng = np.random.default_rng(3)
    shape = (16, 30, 20, 1) if model_type.startswith("simple_cnn") else (16, 30, 20)
    x = rng.standard_normal(shape).astype(np.float32)
    y = rng.integers(0, 5, 16).astype(np.int32)
    mask = np.ones(16, np.float32)

    model, state = create_train_state(model_type, 5, tx, jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    data = batch_sharding(mesh)
    repl = replicated(mesh)
    st_shard = state_sharding(state, mesh)
    step = jax.jit(
        make_train_step(model, make_loss_fn(5), model_type.startswith("simple_cnn")),
        in_shardings=(st_shard, data, data, data, repl),
        out_shardings=(st_shard, repl),
    )
    state = jax.device_put(state, st_shard)
    new_state, metrics = step(
        state,
        jax.device_put(jnp.asarray(x), data),
        jax.device_put(jnp.asarray(y), data),
        jax.device_put(jnp.asarray(mask), data),
        jax.random.PRNGKey(7),
    )
    flat = np.concatenate(
        [np.ravel(np.asarray(p)) for p in jax.tree_util.tree_leaves(new_state.params)]
    )
    return float(metrics["loss"]), flat, new_state


def test_param_spec_shards_dense_pair():
    assert param_spec(("params", "feature_dense", "kernel"), None) == P(None, MODEL_AXIS)
    assert param_spec(("params", "feature_dense", "bias"), None) == P(MODEL_AXIS)
    assert param_spec(("params", "score_predict", "kernel"), None) == P(MODEL_AXIS, None)
    assert param_spec(("params", "block1", "conv", "kernel"), None) == P()


def test_tp_mesh_actually_shards_dense_layers():
    """The placed state on a 4x2 mesh must have the feature_dense kernel
    column-sharded over 'model' (guards against the dims-don't-divide
    replication fallback silently engaging)."""
    assert len(jax.devices()) == 8
    _, _, new_state = _run_train_step(4, 2)
    kernel = new_state.params["feature_dense"]["kernel"]
    spec = kernel.sharding.spec
    assert spec == P(None, MODEL_AXIS), spec
    head = new_state.params["score_predict"]["kernel"]
    assert head.sharding.spec == P(MODEL_AXIS, None), head.sharding.spec


def test_train_step_matches_1x1_vs_4x2():
    loss_1, params_1, _ = _run_train_step(1, 1)
    loss_tp, params_tp, _ = _run_train_step(4, 2)
    assert abs(loss_1 - loss_tp) < 1e-5, (loss_1, loss_tp)
    np.testing.assert_allclose(params_1, params_tp, rtol=1e-5, atol=1e-6)


def test_train_step_matches_1x1_vs_2x4():
    """model axis > 2 exercises uneven-divisibility fallbacks differently."""
    loss_1, params_1, _ = _run_train_step(1, 1)
    loss_tp, params_tp, _ = _run_train_step(2, 4)
    assert abs(loss_1 - loss_tp) < 1e-5, (loss_1, loss_tp)
    np.testing.assert_allclose(params_1, params_tp, rtol=1e-5, atol=1e-6)


def test_eval_step_matches_1x1_vs_4x2():
    tx = get_optimizer("sgd", 1e-2, decay_type=None)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((16, 30, 20, 1)).astype(np.float32)
    y = rng.integers(0, 5, 16).astype(np.int32)
    mask = np.ones(16, np.float32)

    metrics_by_mesh = {}
    for n_data, n_model in ((1, 1), (4, 2)):
        model, state = create_train_state("simple_cnn", 5, tx, jax.random.PRNGKey(0))
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        data = batch_sharding(mesh)
        repl = replicated(mesh)
        st_shard = state_sharding(state, mesh)
        step = jax.jit(
            make_eval_step(model, make_loss_fn(5), True),
            in_shardings=(st_shard, data, data, data),
            out_shardings=repl,
        )
        state = jax.device_put(state, st_shard)
        metrics = step(
            state,
            jax.device_put(jnp.asarray(x), data),
            jax.device_put(jnp.asarray(y), data),
            jax.device_put(jnp.asarray(mask), data),
        )
        metrics_by_mesh[(n_data, n_model)] = {
            k: float(v) for k, v in metrics.items()
        }
    a, b = metrics_by_mesh[(1, 1)], metrics_by_mesh[(4, 2)]
    assert abs(a["loss_sum"] - b["loss_sum"]) < 1e-4, (a, b)
    assert a["correct"] == b["correct"], (a, b)
    assert a["count"] == b["count"], (a, b)


def test_trainer_epoch_scan_matches_across_meshes(tmp_path):
    """The whole-epoch jitted scan (device-side shuffle + train steps +
    metric sums) must be numerically identical on a 1x1 and a 4x2
    ('data','model') mesh."""
    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.training import Trainer, TrainerConfig

    rng = np.random.default_rng(9)
    x = rng.standard_normal((64, 30, 20)).astype(np.float32)
    y = rng.integers(0, 5, 64).astype(np.int32)
    ds = Dataset(x, y)

    results = {}
    for n_data, n_model in ((1, 1), (4, 2)):
        tx = get_optimizer("sgd", 1e-2, decay_type=None)
        model, state = create_train_state("simple_cnn", 5, tx,
                                          jax.random.PRNGKey(0))
        cfg = TrainerConfig(batch_size=16, epochs=1,
                            log_dir=str(tmp_path / f"l{n_data}x{n_model}"),
                            log_tensorboard=False, seed=3)
        trainer = Trainer(model, state, "simple_cnn", 5, cfg,
                          mesh=make_mesh(n_data=n_data, n_model=n_model))
        assert trainer._use_scan(ds)
        metrics = trainer.run_epoch(ds, jax.random.PRNGKey(1), epoch=1)
        flat = np.concatenate([
            np.ravel(np.asarray(p))
            for p in jax.tree_util.tree_leaves(trainer.state.params)
        ])
        results[(n_data, n_model)] = (metrics, flat)

    m1, p1 = results[(1, 1)]
    m2, p2 = results[(4, 2)]
    assert abs(m1["loss"] - m2["loss"]) < 1e-5, (m1, m2)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)
