"""Sharding-equality tests (SURVEY §4f): single-device vs 8-device mesh
results must match — sharding is a layout decision, never a numerics one."""
import numpy as np

import jax
import jax.numpy as jnp

from tpu_speech_commands.frontend import Frontend
from tpu_speech_commands.losses import make_loss_fn
from tpu_speech_commands.models import features_to_input, init_model
from tpu_speech_commands.optim import get_optimizer
from tpu_speech_commands.parallel import batch_sharding, make_mesh, replicated
from tpu_speech_commands.training import create_train_state
from tpu_speech_commands.training.trainer import make_eval_step, make_train_step


def test_forward_matches_across_mesh_sizes():
    assert len(jax.devices()) == 8
    frontend = Frontend()
    model, variables = init_model("simple_cnn", 5, jax.random.PRNGKey(0))

    def forward(variables, audio):
        feats = frontend(audio)
        x = features_to_input(feats, "simple_cnn")
        return model.apply(variables, x, train=False)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((16, 16000)).astype(np.float32))

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_data=n_dev)
        data = batch_sharding(mesh)
        repl = replicated(mesh)
        fn = jax.jit(forward, in_shardings=(repl, data), out_shardings=repl)
        out = fn(jax.device_put(variables, repl), jax.device_put(audio, data))
        results[n_dev] = np.asarray(out)

    np.testing.assert_allclose(results[1], results[8], rtol=1e-5, atol=1e-6)


def test_train_step_metrics_match_across_mesh_sizes():
    tx = get_optimizer("sgd", 1e-2, decay_type=None)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 30, 20, 1)).astype(np.float32)
    y = rng.integers(0, 5, 16).astype(np.int32)
    mask = np.ones(16, np.float32)

    metrics_by_mesh = {}
    params_by_mesh = {}
    for n_dev in (1, 8):
        model, state = create_train_state("simple_cnn", 5, tx,
                                          jax.random.PRNGKey(0))
        mesh = make_mesh(n_data=n_dev)
        data = batch_sharding(mesh)
        repl = replicated(mesh)
        step = jax.jit(
            make_train_step(model, make_loss_fn(5), True),
            in_shardings=(repl, data, data, data, repl),
            out_shardings=(repl, repl),
        )
        state = jax.device_put(state, repl)
        new_state, metrics = step(
            state,
            jax.device_put(jnp.asarray(x), data),
            jax.device_put(jnp.asarray(y), data),
            jax.device_put(jnp.asarray(mask), data),
            jax.random.PRNGKey(7),
        )
        metrics_by_mesh[n_dev] = {k: float(v) for k, v in metrics.items()}
        params_by_mesh[n_dev] = np.concatenate([
            np.ravel(np.asarray(p))
            for p in jax.tree_util.tree_leaves(new_state.params)
        ])

    assert metrics_by_mesh[1]["loss"] == np.float32(metrics_by_mesh[8]["loss"]) or \
        abs(metrics_by_mesh[1]["loss"] - metrics_by_mesh[8]["loss"]) < 1e-5
    np.testing.assert_allclose(
        params_by_mesh[1], params_by_mesh[8], rtol=1e-5, atol=1e-6
    )
