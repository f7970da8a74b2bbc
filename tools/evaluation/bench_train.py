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
    step = jax.jit(
        make_train_step(model, make_loss_fn(36), state.batch_stats is not None),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch_size,) + input_shape(model_type)).astype(
            np.float32
        )
    )
    y = jnp.asarray(rng.integers(0, 36, batch_size).astype(np.int32))
    mask = jnp.ones(batch_size, jnp.float32)
    key = jax.random.PRNGKey(1)

    for _ in range(5):
        state, metrics = step(state, x, y, mask, key)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, x, y, mask, key)
    jax.block_until_ready(metrics)
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
