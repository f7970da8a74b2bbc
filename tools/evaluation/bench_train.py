#!/usr/bin/env python3
"""Training-step throughput benchmark: samples/sec/chip for the full
jitted train step (fwd+bwd+optimizer), per model family."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def bench_model(model_type: str, batch_size: int, iters: int = 50) -> float:
    import jax
    import jax.numpy as jnp

    from tpu_speech_commands.losses import make_loss_fn
    from tpu_speech_commands.models import input_shape
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.training import create_train_state
    from tpu_speech_commands.training.trainer import make_train_step

    tx = get_optimizer("adam", 1e-3, decay_type="cosine", decay_steps=1000)
    model, state = create_train_state(model_type, 36, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, make_loss_fn(36), state.batch_stats is not None)

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch_size,) + input_shape(model_type)).astype(
            np.float32
        )
    )
    y = jnp.asarray(rng.integers(0, 36, batch_size).astype(np.int32))
    mask = jnp.ones(batch_size, jnp.float32)
    key = jax.random.PRNGKey(1)

    # `iters` chained steps inside ONE jit (lax.scan): a single dispatch,
    # state dependencies force every step to really execute; the returned
    # final loss is fetched to host as a hard sync.
    @jax.jit
    def many_steps(state):
        def body(state, _):
            state, metrics = step(state, x, y, mask, key)
            return state, metrics["loss"]

        state, losses = jax.lax.scan(body, state, None, length=iters)
        return state, losses[-1]

    state, loss = many_steps(state)  # warmup/compile
    assert np.isfinite(float(loss))
    t0 = time.perf_counter()
    state, loss = many_steps(state)
    _ = float(loss)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--models", default="simple_cnn,simple_cnn_lite,"
                                            "simple_gru,simple_lstm")
    args = parser.parse_args()

    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    for model_type in args.models.split(","):
        sps = bench_model(model_type, args.batch_size, args.iters)
        print(f"{model_type}: {sps:,.0f} samples/sec/chip "
              f"(batch {args.batch_size}, fwd+bwd+adam)")


if __name__ == "__main__":
    main()
