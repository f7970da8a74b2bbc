"""Multi-slice (DCN) hybrid mesh tests — SURVEY §2.9's ICI/DCN mapping.

The reference scales by running bigger boxes (no multi-node story:
/root/reference/train.py is single-process Keras); the TPU-native design
instead declares a ('replica', 'data', 'model') mesh where 'replica' is
the cross-slice DCN axis.  These tests pin:
- hybrid mesh construction + the batch_* helpers on flat and hybrid meshes
- numerics: a train step on a 2x2x2 hybrid mesh (DCN replicas x ICI data
  x ICI tensor parallel) matches the flat 8-device mesh bit-for-bit in
  metrics and updated params
- the Trainer + whole-epoch scan path end-to-end on a hybrid mesh
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpu_speech_commands.losses import make_loss_fn
from tpu_speech_commands.optim import get_optimizer
from tpu_speech_commands.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    REPLICA_AXIS,
    batch_axes,
    batch_shards,
    batch_sharding,
    batch_spec,
    make_hybrid_mesh,
    make_mesh,
    replicated,
    state_sharding,
)
from tpu_speech_commands.training import create_train_state
from tpu_speech_commands.training.trainer import make_train_step


def test_hybrid_mesh_construction():
    mesh = make_hybrid_mesh(n_replica=2, n_data=2, n_model=2)
    assert mesh.axis_names == (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS)
    assert dict(mesh.shape) == {"replica": 2, "data": 2, "model": 2}

    # n_data inferred from the device count
    mesh2 = make_hybrid_mesh(n_replica=2)
    assert dict(mesh2.shape) == {"replica": 2, "data": 4, "model": 1}

    with pytest.raises(ValueError):
        make_hybrid_mesh(n_replica=4, n_data=4, n_model=1)  # 16 > 8 devices


def test_hybrid_mesh_multislice_requires_exact_cover():
    """On real multi-slice device sets an under-provisioned shape must
    raise a clear error (not pass the full list into
    create_hybrid_device_mesh, and not silently take a prefix — the
    slice-boundary assignment would be wrong either way)."""

    class _FakeDev:
        def __init__(self, i):
            self.id = i
            self.slice_index = i // 4

    devs = [_FakeDev(i) for i in range(8)]  # 2 slices x 4
    with pytest.raises(ValueError, match="slice-aware"):
        make_hybrid_mesh(n_replica=2, n_data=1, n_model=2, devices=devs)


def test_batch_helpers_flat_and_hybrid():
    flat = make_mesh(n_data=8)
    hybrid = make_hybrid_mesh(n_replica=2, n_data=4)

    assert batch_axes(flat) == (DATA_AXIS,)
    assert batch_axes(hybrid) == (REPLICA_AXIS, DATA_AXIS)
    assert batch_shards(None) == 1
    assert batch_shards(flat) == 8
    assert batch_shards(hybrid) == 8
    assert batch_spec(flat) == P(DATA_AXIS)
    assert batch_spec(hybrid) == P((REPLICA_AXIS, DATA_AXIS))

    # batch_sharding splits the leading axis over replica x data: with 8
    # batch shards every device holds a distinct 2-row slice
    sh = batch_sharding(hybrid)
    arr = jax.device_put(jnp.arange(16.0).reshape(16, 1), sh)
    assert len({d.index[0] for d in arr.addressable_shards}) == 8


def _run_train_step(mesh, with_tp):
    tx = get_optimizer("sgd", 1e-2, decay_type=None)
    model, state = create_train_state("simple_cnn", 5, tx,
                                      jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 30, 20, 1)).astype(np.float32)
    y = rng.integers(0, 5, 16).astype(np.int32)
    mask = np.ones(16, np.float32)

    data = batch_sharding(mesh)
    repl = replicated(mesh)
    st = state_sharding(state, mesh, with_model_parallel=with_tp)
    step = jax.jit(
        make_train_step(model, make_loss_fn(5), True),
        in_shardings=(st, data, data, data, repl),
        out_shardings=(st, repl),
    )
    state = jax.device_put(state, st)
    new_state, metrics = step(
        state,
        jax.device_put(jnp.asarray(x), data),
        jax.device_put(jnp.asarray(y), data),
        jax.device_put(jnp.asarray(mask), data),
        jax.random.PRNGKey(7),
    )
    flat_params = np.concatenate([
        np.ravel(np.asarray(p))
        for p in jax.tree_util.tree_leaves(new_state.params)
    ])
    return {k: float(v) for k, v in metrics.items()}, flat_params


def test_hybrid_train_step_matches_flat_mesh():
    """2-slice x 2-data x 2-model == flat 8-data: same loss, same params.

    Splitting the batch axis over ('replica','data') instead of a flat
    'data' axis is a pure layout decision: the 2x4 no-TP hybrid must be
    BIT-EXACT against the flat mesh (asserted with exact equality).
    Adding tensor parallelism on 'model' repartitions the matmuls, which
    legitimately changes the within-matmul reduction order — that
    comparison is float-ulp-level, asserted at 1e-6.
    """
    assert len(jax.devices()) == 8
    m_flat, p_flat = _run_train_step(make_mesh(n_data=8), with_tp=False)
    m_hyb, p_hyb = _run_train_step(
        make_hybrid_mesh(n_replica=2, n_data=2, n_model=2), with_tp=True)
    m_hyb2, p_hyb2 = _run_train_step(
        make_hybrid_mesh(n_replica=2, n_data=4), with_tp=False)

    # batch-axis resharding only: bit-for-bit
    assert m_flat["loss"] == m_hyb2["loss"]
    np.testing.assert_array_equal(p_flat, p_hyb2)

    # + tensor parallelism: ulp-level (matmul partitioning changes
    # reduction order)
    assert abs(m_flat["loss"] - m_hyb["loss"]) < 1e-6
    np.testing.assert_allclose(p_flat, p_hyb, rtol=1e-6, atol=1e-7)


def test_trainer_epoch_on_hybrid_mesh():
    """Full Trainer (whole-epoch jitted scan) over a 2x2x2 hybrid mesh."""
    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.training import Trainer, TrainerConfig

    mesh = make_hybrid_mesh(n_replica=2, n_data=2, n_model=2)
    tx = get_optimizer("adam", 1e-3, decay_type=None)
    model, state = create_train_state("simple_cnn", 5, tx,
                                      jax.random.PRNGKey(0))
    cfg = TrainerConfig(batch_size=16, epochs=1, log_tensorboard=False)
    trainer = Trainer(model, state, "simple_cnn", 5, cfg, mesh=mesh)

    rng = np.random.default_rng(2)
    ds = Dataset(
        rng.standard_normal((64, 30, 20)).astype(np.float32),
        rng.integers(0, 5, 64).astype(np.int32),
    )
    assert trainer._use_scan(ds)
    metrics = trainer.run_epoch(ds, jax.random.PRNGKey(3), epoch=1)
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["accuracy"] <= 1.0


def test_fused_frontend_shard_map_on_hybrid_mesh():
    """The Pallas frontend shard_map wrap splits over ('replica','data')."""
    from tpu_speech_commands.ops import select_training_frontend
    from tpu_speech_commands.params import pr

    mesh = make_hybrid_mesh(n_replica=2, n_data=4)
    fe, kind = select_training_frontend(
        pr, "mfcc", 16, mesh=mesh, batch_tile=2, interpret=True)
    assert kind == "pallas+shard_map"

    rng = np.random.default_rng(3)
    audio = jnp.asarray(
        rng.standard_normal((16, pr.max_samples)).astype(np.float32))
    out_sharded = np.asarray(fe(jax.device_put(audio, batch_sharding(mesh))))

    flat = make_mesh(n_data=8)
    fe_flat, _ = select_training_frontend(
        pr, "mfcc", 16, mesh=flat, batch_tile=2, interpret=True)
    out_flat = np.asarray(fe_flat(jax.device_put(audio, batch_sharding(flat))))
    np.testing.assert_allclose(out_sharded, out_flat, rtol=1e-5, atol=1e-5)
