#!/usr/bin/env python3
"""Train a speech-commands classifier on TPU.

CLI-compatible with the reference trainer (`train.py:100-134` in
david8862/tf-keras-speech-commands), plus TPU-specific flags
(--num_devices, --dtype, --feature_type).
"""
import argparse
import os

import jax
import numpy as np

from tpu_speech_commands.utils.compilation_cache import enable_compilation_cache
from tpu_speech_commands.data.dataset import get_dataset
from tpu_speech_commands.frontend import Frontend
from tpu_speech_commands.models import MODEL_TYPES
from tpu_speech_commands.optim import get_optimizer
from tpu_speech_commands.params import inject_params, pr, save_params
from tpu_speech_commands.parallel import make_mesh
from tpu_speech_commands.training import (
    Trainer,
    TrainerConfig,
    restore_state,
)
from tpu_speech_commands.utils import ensure_background_first, get_classes


def main(args):
    enable_compilation_cache()
    log_dir = args.log_dir
    class_names = get_classes(args.classes_path)
    ensure_background_first(class_names)
    num_classes = len(class_names)

    if args.params_path:
        inject_params(args.params_path)

    frontend = Frontend(pr, feature_type=args.feature_type)
    mesh = make_mesh(n_data=args.num_devices) if args.num_devices else make_mesh()

    device_pipeline = None
    if args.augment:
        # raw-audio path: augmentation + frontend run on device inside the
        # train step; the background class doubles as the noise bank
        from tpu_speech_commands.data.augment import make_audio_pipeline
        from tpu_speech_commands.data.dataset import get_audio_dataset

        if args.val_data_path:
            train_ds = get_audio_dataset(args.train_data_path, class_names)
            val_ds = get_audio_dataset(args.val_data_path, class_names)
        else:
            assert args.val_split > 0, "no val data split."
            train_ds, val_ds = get_audio_dataset(
                args.train_data_path, class_names, val_split=args.val_split
            )
        noise_bank = train_ds.x[train_ds.y == 0]
        if len(noise_bank) == 0:
            noise_bank = np.zeros((1, pr.max_samples), np.float32)
        # the fused Pallas CT frontend replaces the XLA GEMM chain inside
        # the train step whenever usable (no VJP needed: gradients flow
        # only into the model, the frontend is constant w.r.t. params);
        # on a multi-device mesh the kernel runs per batch shard via
        # shard_map — select_training_frontend owns the choice and prints
        # a visible notice on any fallback
        from tpu_speech_commands.ops import select_training_frontend

        pipeline_frontend, _ = select_training_frontend(
            pr, args.feature_type, args.batch_size, mesh=mesh,
        )
        device_pipeline = make_audio_pipeline(
            pipeline_frontend, args.model_type, noise_bank
        )
    elif args.val_data_path:
        train_ds = get_dataset(args.train_data_path, class_names, frontend=frontend)
        val_ds = get_dataset(args.val_data_path, class_names, frontend=frontend)
    else:
        assert args.val_split > 0, "no val data split."
        train_ds, val_ds = get_dataset(
            args.train_data_path, class_names, val_split=args.val_split,
            frontend=frontend,
        )

    # ceil: the trainer's staged scan pads the final batch and runs it
    # (ceil(n/b) steps/epoch), so floor would end LR decay before training
    steps_per_epoch = max(1, -(-len(train_ds) // args.batch_size))
    decay_steps = steps_per_epoch * args.epochs
    tx = get_optimizer(
        args.optimizer,
        args.learning_rate,
        average_type=args.average_type,
        decay_type=args.decay_type,
        decay_steps=decay_steps,
        injectable=args.decay_type is None,
    )

    if args.background_bias:
        assert 0 < args.background_bias < 1, "background bias should between 0 and 1"

    import jax.numpy as jnp

    from tpu_speech_commands.models import init_model
    from tpu_speech_commands.training.trainer import TrainState

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    model, variables = init_model(
        args.model_type, num_classes, jax.random.PRNGKey(args.seed),
        dtype=dtype, num_layers=args.num_layers,
        bn_momentum=args.bn_momentum,
    )
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats"),
    )
    if args.weights_path:
        state = restore_state(state, args.weights_path)
        print(f"Load weights {args.weights_path}.")
    elif args.resume:
        # resume from the newest epoch checkpoint in log_dir (failure
        # recovery; the reference only supports manual --weights_path).
        # Newest by MTIME, not filename: after a prior resume restarts
        # the epoch counter, ep001 (newer weights) sorts before ep020.
        from tpu_speech_commands.training.checkpoints import CheckpointManager

        newest = CheckpointManager(log_dir).latest()
        if newest:
            state = restore_state(state, newest)
            print(f"Resumed from {newest}.")
        else:
            print("No checkpoint to resume from; starting fresh.")

    config = TrainerConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        log_dir=log_dir,
        use_plateau=args.decay_type is None,
        seed=args.seed,
        epochs_per_dispatch=args.epochs_per_dispatch,
    )
    # self-describing checkpoints for the inference loader
    trainer_meta = {
        "model_type": args.model_type,
        "num_classes": num_classes,
        "classes": class_names,
        "params": pr.to_dict(),
        "feature_type": args.feature_type,
    }
    if args.num_layers != 1:
        trainer_meta["num_layers"] = args.num_layers
    trainer = Trainer(
        model, state, args.model_type, num_classes, config,
        background_bias=args.background_bias, mesh=mesh,
        checkpoint_meta=trainer_meta, average_type=args.average_type,
        device_pipeline=device_pipeline,
    )

    print(
        f"Train on {len(train_ds)} samples, val on {len(val_ds)} samples, "
        f"with batch size {args.batch_size} on mesh {dict(mesh.shape)}."
    )
    os.makedirs(log_dir, exist_ok=True)
    save_params(os.path.join(log_dir, "params.json"))
    with open(os.path.join(log_dir, "classes.txt"), "w") as f:
        f.write("\n".join(class_names) + "\n")

    history = trainer.fit(train_ds, val_ds)
    best = max((h.val_accuracy for h in history), default=0.0)
    print(f"Best val_accuracy: {best:.4f}")


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_type", type=str, default="simple_cnn",
                        choices=list(MODEL_TYPES),
                        help="classifier model type, default=%(default)s")
    parser.add_argument("--weights_path", type=str, default=None,
                        help="pretrained checkpoint (.npz) for fine tune")
    parser.add_argument("--train_data_path", type=str, required=True)
    parser.add_argument("--val_data_path", type=str, default=None)
    parser.add_argument("--val_split", type=float, default=0.15)
    parser.add_argument("--classes_path", type=str, required=True)
    parser.add_argument("--params_path", type=str, default=None)
    parser.add_argument("--background_bias", type=float, default=None)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--optimizer", type=str, default="adam",
                        choices=["adam", "rmsprop", "sgd"])
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--decay_type", type=str, default=None,
                        choices=[None, "cosine", "exponential", "polynomial",
                                 "piecewise_constant"])
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--average_type", type=str, default=None,
                        choices=[None, "ema", "swa", "lookahead"],
                        help="weight averaging (model_utils.py:61-100 equiv)")
    # TPU-native extensions
    parser.add_argument("--feature_type", type=str, default="mfcc",
                        choices=["mfcc", "bark"])
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="activation compute dtype (params stay fp32)")
    parser.add_argument("--augment", action="store_true",
                        help="on-device augmentation: train on raw audio with "
                             "random gain/shift/noise-SNR inside the step")
    parser.add_argument("--num_layers", type=int, default=1,
                        help="stacked RNN layers (RNN model types only; "
                             "reference rnn.py num_layers)")
    parser.add_argument("--bn_momentum", type=float, default=0.99,
                        help="BatchNorm running-stats momentum (Keras default "
                             "0.99; lower converges eval stats faster on "
                             "short runs)")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="devices on the data axis (default: all)")
    parser.add_argument("--log_dir", type=str, default=os.path.join("logs", "000"))
    parser.add_argument("--resume", action="store_true",
                        help="resume weights from the newest checkpoint in log_dir")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--epochs_per_dispatch", type=int, default=10,
        help="epochs run per device dispatch on the fit-scan fast path "
             "(train + val + callbacks device-side; amortizes the "
             "per-epoch host round-trip). 1 restores per-epoch "
             "dispatches with a checkpoint file at every improving "
             "epoch. default=%(default)s")
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
