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


def bench_fit_decompose(model_type: str, batch_size: int, n_samples: int,
                        epochs: int, epochs_per_dispatch: int):
    """Decompose the fit-loop residual vs the scanned-step bound
    (VERDICT r4 item 4) by measuring K-epochs-per-dispatch chunks with
    pieces removed, all built from the SAME jitted train/eval steps the
    Trainer uses:

        full       train + val + device-side callback selects (the
                   production _fit_chunk_fn, measured via Trainer.fit)
        train+val  same minus the callback logic
        train      minus the val pass
        noshuffle  minus the epoch-wide shuffle gather (identity order)
        bound      the constant-input scanned step (bench_model) scaled
                   to the same samples — its inputs are loop-invariant
                   (hoisted reshape, no HBM restream), so it OVERSTATES
                   an honest bound

    Prints absolute samples/s and the per-component cost in ms/epoch.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.training import (
        Trainer, TrainerConfig, create_train_state,
    )

    rng_np = np.random.default_rng(0)
    x = rng_np.standard_normal((n_samples, 30, 20)).astype(np.float32)
    y = rng_np.integers(0, 36, n_samples).astype(np.int32)
    xv = rng_np.standard_normal((max(batch_size, 512), 30, 20)).astype(
        np.float32)
    yv = rng_np.integers(0, 36, len(xv)).astype(np.int32)

    def fresh_trainer(log_dir):
        tx = get_optimizer("adam", 1e-3, decay_type="cosine",
                           decay_steps=10 ** 6)
        model, state = create_train_state(model_type, 36, tx,
                                          jax.random.PRNGKey(0))
        cfg = TrainerConfig(
            batch_size=batch_size, epochs=epochs, log_dir=log_dir,
            log_tensorboard=False,
            epochs_per_dispatch=epochs_per_dispatch,
        )
        return Trainer(model, state, model_type, 36, cfg)

    results = {}

    # -- full fit (production path, compile chunk dropped) --
    with tempfile.TemporaryDirectory() as log_dir:
        trainer = fresh_trainer(log_dir)
        history = trainer.fit(Dataset(x, y), Dataset(xv, yv), verbose=False)
        k = max(1, min(epochs_per_dispatch, epochs - 1))
        steady = history[k:]
        secs = sum(m.seconds for m in steady)
        results["full"] = len(steady) * (n_samples // batch_size) \
            * batch_size / secs

    # -- ablation chunks from the same cores --
    with tempfile.TemporaryDirectory() as log_dir:
        trainer = fresh_trainer(log_dir)
        cfg = trainer.config
        train_epoch = trainer._train_epoch_core
        eval_epoch = trainer._eval_epoch_core
        # the identical step construction the Trainer uses internally
        from tpu_speech_commands.losses import make_loss_fn
        from tpu_speech_commands.training.trainer import make_train_step

        base_step = make_train_step(trainer.model, make_loss_fn(36),
                                    trainer.has_batch_stats)
        xt, yt, mt, n_b = trainer._stage_dataset(Dataset(x, y))
        xv_d, yv_d, mv_d, _ = trainer._stage_dataset(Dataset(xv, yv))
        st_shard, repl, data = (trainer._st_shard, trainer._repl_sharding,
                                trainer._data_sharding)

        def make_chunk(with_val, with_shuffle):
            def chunk(state, xt, yt, mt, xv, yv, mv, rng, epoch_idx):
                n_bf = jnp.float32(xt.shape[0] // cfg.batch_size)

                def body(state, epoch_i):
                    perm_key = jax.random.fold_in(
                        jax.random.PRNGKey(cfg.seed), epoch_i)
                    if with_shuffle:
                        state, totals, _ = train_epoch(
                            state, xt, yt, mt, rng, perm_key, None)
                    else:
                        # identity order: reshape-only batch stream, the
                        # same scan body without the 3-array gather
                        bshape = (xt.shape[0] // cfg.batch_size,
                                  cfg.batch_size)
                        xs = (xt.reshape(bshape + xt.shape[1:]),
                              yt.reshape(bshape), mt.reshape(bshape))

                        def sbody(st, batch):
                            xb, yb, mb = batch
                            st, metrics = base_step(st, xb, yb, mb, rng)
                            return st, metrics["loss"]

                        state, losses = jax.lax.scan(sbody, state, xs)
                        totals = {"loss": losses.sum(),
                                  "accuracy": jnp.float32(0.0)}
                    loss = totals["loss"] / n_bf
                    if with_val:
                        sums = eval_epoch(state, xv, yv, mv)
                        # tiny-scaled, NOT 0.0* (XLA would fold that to 0
                        # and dead-code-eliminate the whole val pass)
                        loss = loss + jnp.float32(1e-12) * (
                            sums["loss_sum"] + sums["correct"])
                    return state, loss

                state, losses = jax.lax.scan(body, state, epoch_idx)
                return state, losses[-1]

            return jax.jit(
                chunk,
                in_shardings=(st_shard, data, data, data, data, data,
                              data, repl, repl),
                out_shardings=(st_shard, repl),
                donate_argnums=(0,),
            )

        host_state = jax.device_get(trainer.state)

        def run_variant(label, with_val, with_shuffle):
            fn = make_chunk(with_val, with_shuffle)
            k = epochs_per_dispatch
            idx0 = jax.device_put(
                np.arange(1, 1 + k, dtype=np.int32), repl)
            # fresh copy per variant: the chunk donates the state buffers
            state = jax.device_put(host_state, st_shard)
            state, loss = fn(state, xt, yt, mt, xv_d, yv_d, mv_d,
                             jax.random.PRNGKey(1), idx0)
            assert np.isfinite(float(loss))  # compile + hard sync
            n_chunks = max(1, (epochs - k) // k)
            t0 = time.perf_counter()
            for c in range(n_chunks):
                idx = jax.device_put(
                    np.arange(1 + (c + 1) * k, 1 + (c + 2) * k,
                              dtype=np.int32), repl)
                state, loss = fn(state, xt, yt, mt, xv_d, yv_d, mv_d,
                                 jax.random.PRNGKey(1), idx)
            _ = float(loss)
            dt = time.perf_counter() - t0
            n_epochs = n_chunks * k
            results[label] = n_epochs * n_b * batch_size / dt

        run_variant("train+val", True, True)
        run_variant("train", False, True)
        run_variant("noshuffle", False, False)

    results["bound"] = bench_model(model_type, batch_size,
                                   iters=epochs_per_dispatch
                                   * (n_samples // batch_size))

    def ms_per_epoch(sps):
        return 1000.0 * n_samples / sps

    print(f"\n{model_type}: fit-loop decomposition "
          f"(batch {batch_size}, {n_samples} samples, "
          f"{epochs_per_dispatch} epochs/dispatch)")
    for label in ("full", "train+val", "train", "noshuffle", "bound"):
        print(f"  {label:10s}: {results[label]:>12,.0f} samples/s   "
              f"{ms_per_epoch(results[label]):7.2f} ms/epoch")
    parts = {
        "callbacks+history": ms_per_epoch(results["full"])
        - ms_per_epoch(results["train+val"]),
        "val pass": ms_per_epoch(results["train+val"])
        - ms_per_epoch(results["train"]),
        "shuffle gather": ms_per_epoch(results["train"])
        - ms_per_epoch(results["noshuffle"]),
        "input restream vs hoisted bound": ms_per_epoch(results["noshuffle"])
        - ms_per_epoch(results["bound"]),
    }
    for k2, v in parts.items():
        print(f"  {k2:32s}: {v:+7.2f} ms/epoch")
    honest = results["train+val"]
    print(f"  full fit = {results['full']/honest:.3f}x of the "
          "train+val chunk (the honest bound incl. val)")
    return results


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--models", default="simple_cnn,simple_cnn_lite,"
                                            "simple_gru,simple_lstm")
    parser.add_argument("--fit", action="store_true",
                        help="also measure the full fit-loop wall clock")
    parser.add_argument("--fit_decompose", action="store_true",
                        help="decompose the fit-loop residual: full / "
                             "no-callbacks / no-val / no-shuffle-gather "
                             "/ constant-input bound (VERDICT r4 item 4)")
    parser.add_argument("--fit_samples", type=int, default=13312)
    parser.add_argument("--fit_epochs", type=int, default=30)
    parser.add_argument("--fit_batch", type=int, default=512)
    parser.add_argument("--epochs_per_dispatch", type=int, default=10)
    args = parser.parse_args()

    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    if args.fit_decompose:
        for model_type in args.models.split(","):
            bench_fit_decompose(model_type, args.fit_batch,
                                args.fit_samples, args.fit_epochs,
                                args.epochs_per_dispatch)
        return
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
