#!/usr/bin/env python3
"""Multi-chip throughput harness: fused frontend + model over a data-sharded
mesh, reported as windows/sec/chip.

On the single-chip axon environment this degenerates to bench.py; on a real
slice it shards the window batch over the 'data' axis (XLA keeps the whole
step collective-free — pure data parallel inference).  Functional behaviour
(sharded == single-device results) is covered by
tests/test_sharding_equality.py on the virtual CPU mesh.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--devices", type=int, default=None,
                        help="devices on the data axis (default: all)")
    parser.add_argument("--replicas", type=int, default=None,
                        help="multi-slice: build a hybrid "
                             "('replica','data','model') mesh with this "
                             "many DCN replicas (each of --devices data "
                             "devices); the batch shards over both axes")
    parser.add_argument("--batch_per_device", type=int, default=2048)
    parser.add_argument("--k_inner", type=int, default=8)
    parser.add_argument("--model_type", default="simple_cnn")
    parser.add_argument("--use_pallas", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="--no-use_pallas benches the XLA frontend")
    args = parser.parse_args()

    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; forward it to
    # the config knob so `JAX_PLATFORMS=cpu` cannot silently target the
    # single-tenant TPU (same dance as tools/audio_process/_common.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from tpu_speech_commands.frontend import Frontend
    from tpu_speech_commands.models import features_to_input, init_model, score_fn
    from tpu_speech_commands.ops import make_fused_frontend
    from tpu_speech_commands.parallel import (
        batch_spec, batch_shards, make_hybrid_mesh, make_mesh, replicated,
    )
    from tpu_speech_commands.params import pr
    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    if args.replicas:
        mesh = make_hybrid_mesh(n_replica=args.replicas, n_data=args.devices)
    else:
        mesh = make_mesh(n_data=args.devices) if args.devices else make_mesh()
    n_dev = batch_shards(mesh)
    batch = args.batch_per_device * n_dev

    # Pallas kernels need per-shard batch alignment; the XLA frontend shards
    # transparently.  Use pallas on TPU, XLA elsewhere.
    on_tpu = jax.default_backend() == "tpu"
    if args.use_pallas and on_tpu:
        frontend = make_fused_frontend(pr, batch_tile=16)
    else:
        fe = Frontend(pr)

        def frontend(audio, gain=None):
            if gain is not None:
                audio = audio * jnp.asarray(gain, jnp.float32)
            return fe(audio)

    if args.use_pallas and on_tpu and n_dev > 1:
        # a Pallas custom call is not auto-partitionable: shard_map runs
        # the kernel per-device on its batch shard (collective-free)
        from jax.sharding import PartitionSpec as _P

        from tpu_speech_commands.parallel import shard_map_no_check

        bspec = batch_spec(mesh)  # ('data',) or ('replica','data')
        frontend = shard_map_no_check(
            frontend, mesh=mesh, in_specs=(bspec, _P()),
            out_specs=bspec,
        )
    model, variables = init_model(args.model_type, 5, jax.random.PRNGKey(0))

    def forward(variables, audio, gain):
        feats = frontend(audio, gain)
        x = features_to_input(feats, args.model_type)
        return score_fn(model.apply(variables, x, train=False))

    def forward_many(variables, audio):
        # bench.py methodology: k_inner iterations over the SAME fixed
        # batch, each kept live by an iteration-dependent gain scalar —
        # scanning over a (k_inner, B, S) stack instead dynamic-slices a
        # fresh input copy every iteration (~160 GB/s input cap,
        # CLAUDE.md), understating fast frontends
        def body(carry, i):
            gain = 1.0 + 1e-9 * i.astype(jnp.float32)
            return carry + forward(variables, audio, gain).sum(), None

        c, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            jnp.arange(args.k_inner, dtype=jnp.int32),
        )
        return c

    repl = replicated(mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, batch_spec(mesh))
    fn = jax.jit(forward_many, in_shardings=(repl, batch_sharding),
                 out_shardings=repl)

    rng = np.random.default_rng(0)
    # device_put the HOST array with the target sharding directly: an
    # intermediate jnp.asarray would materialise the whole batch on
    # device 0 before resharding (n_dev x per-chip HBM)
    audio = jax.device_put(
        rng.standard_normal((batch, pr.max_samples)).astype(np.float32),
        batch_sharding,
    )
    variables = jax.device_put(variables, repl)

    c = fn(variables, audio)
    assert np.isfinite(float(c))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        c = fn(variables, audio)
        _ = float(c)
        best = max(best, args.k_inner * batch / (time.perf_counter() - t0))
    print(f"mesh {dict(mesh.shape)}: {best:,.0f} windows/s total, "
          f"{best / n_dev:,.0f} windows/s/chip")


if __name__ == "__main__":
    main()
