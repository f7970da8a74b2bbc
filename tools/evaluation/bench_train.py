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


def bench_fit(model_type: str, batch_size: int, n_samples: int,
              epochs: int, epochs_per_dispatch: int) -> float:
    """Wall-clock samples/sec of the FULL Trainer.fit loop (train epochs
    + val passes + callbacks + logging), compile excluded by dropping the
    first dispatch chunk.  This is the number the 531k-vs-798k fit-loop
    gap was measured on (ROADMAP): with epochs_per_dispatch>1 the
    per-epoch tunnel round-trips amortize and it should sit within ~10%
    of the pure step rate."""
    import tempfile

    import jax
    import numpy as np

    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.training import (
        Trainer, TrainerConfig, create_train_state,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((n_samples, 30, 20)).astype(np.float32)
    y = rng.integers(0, 36, n_samples).astype(np.int32)
    xv = rng.standard_normal((max(batch_size, 512), 30, 20)).astype(
        np.float32)
    yv = rng.integers(0, 36, len(xv)).astype(np.int32)

    tx = get_optimizer("adam", 1e-3, decay_type="cosine", decay_steps=10**6)
    model, state = create_train_state(model_type, 36, tx,
                                      jax.random.PRNGKey(0))
    with tempfile.TemporaryDirectory() as log_dir:
        cfg = TrainerConfig(
            batch_size=batch_size, epochs=epochs, log_dir=log_dir,
            log_tensorboard=False,
            epochs_per_dispatch=epochs_per_dispatch,
        )
        trainer = Trainer(model, state, model_type, 36, cfg)
        history = trainer.fit(Dataset(x, y), Dataset(xv, yv),
                              verbose=False)
    # drop the first dispatch chunk (jit compile rides on it)
    k = max(1, min(epochs_per_dispatch, epochs - 1))
    steady = history[k:]
    secs = sum(m.seconds for m in steady)
    return len(steady) * (n_samples // batch_size) * batch_size / secs


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--models", default="simple_cnn,simple_cnn_lite,"
                                            "simple_gru,simple_lstm")
    parser.add_argument("--fit", action="store_true",
                        help="also measure the full fit-loop wall clock")
    parser.add_argument("--fit_samples", type=int, default=13312)
    parser.add_argument("--fit_epochs", type=int, default=30)
    parser.add_argument("--fit_batch", type=int, default=512)
    parser.add_argument("--epochs_per_dispatch", type=int, default=10)
    args = parser.parse_args()

    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    for model_type in args.models.split(","):
        sps = bench_model(model_type, args.batch_size, args.iters)
        print(f"{model_type}: {sps:,.0f} samples/sec/chip "
              f"(batch {args.batch_size}, fwd+bwd+adam)")
        if args.fit:
            step = bench_model(model_type, args.fit_batch, args.iters)
            fit = bench_fit(model_type, args.fit_batch, args.fit_samples,
                            args.fit_epochs, args.epochs_per_dispatch)
            print(f"{model_type}: fit loop {fit:,.0f} vs pure step "
                  f"{step:,.0f} samples/sec (batch {args.fit_batch}, "
                  f"ratio {fit/step:.2f})")


if __name__ == "__main__":
    main()
