#!/usr/bin/env python3
"""Accuracy-parity head-to-head: tf.keras reference architecture vs this
framework, trained on IDENTICAL data with the reference recipe.

The reference trains with `model.fit` (batch 512, adam @ 1e-3, val_split
0.15 — /root/reference/train.py:74-95, README.md:104).  This harness:

1. builds a 36-class synthetic wav dataset (GSC class list) and extracts
   MFCC features ONCE — both frameworks consume the same arrays and the
   same train/val split;
2. trains the tf.keras build of the reference architecture
   (export/keras_interop.build_keras_model — same topology as
   classifier/models/cnn.py) with the reference recipe;
3. trains this framework's model with the same recipe;
4. cross-loads the Keras-trained H5 into the JAX model and re-evaluates —
   weight-level interop must reproduce the Keras accuracy.

Prints a markdown table row for PARITY.md.  tf.keras always runs on CPU;
the JAX side uses the default platform (the TPU when tunneled — it is
single-tenant, so don't run this alongside another TPU job).  Pass
--jax_platform cpu for a fully device-independent comparison; note this
box's JAX CPU is effectively single-core (CLAUDE.md), so CPU runs are
slow.

    python tools/evaluation/accuracy_parity.py --epochs 40
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_type", dest="model_types", nargs="+",
                        default=["simple_cnn"],
                        help="one or more families to compare")
    parser.add_argument("--epochs", type=int, default=40)
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--samples_per_class", type=int, default=60,
                        help="371 gives a ~2k-sample val set at the 36-class "
                             "list (the statistical-power configuration)")
    parser.add_argument("--val_split", type=float, default=0.15)
    parser.add_argument("--seed", dest="seeds", type=int, nargs="+",
                        default=[42],
                        help="one run per seed; multiple seeds report "
                             "mean±std per family (seed drives the "
                             "train/val split, init and fit shuffling)")
    parser.add_argument("--work_dir", default="/tmp/accuracy_parity")
    parser.add_argument("--distribution", default="easy",
                        choices=["easy", "hard"],
                        help="synthetic corpus distribution: 'hard' adds "
                             "variable SNR, weaker off-center utterances "
                             "and background bursts (a second distribution "
                             "so the parity claim does not rest on one "
                             "corpus)")
    parser.add_argument("--stage", default="all",
                        choices=["all", "keras", "jax"],
                        help="split the study: 'keras' trains+saves only "
                             "the tf.keras side (CPU, long on this box; "
                             "never initializes a JAX device, so the "
                             "single-tenant TPU stays free) and records "
                             "results to a JSON; 'jax' reads that JSON, "
                             "runs the JAX side (seconds on TPU with the "
                             "fit scan) + cross-loads, and prints the "
                             "table")
    parser.add_argument("--jax_platform", default=None,
                        choices=[None, "cpu", "tpu"],
                        help="force the JAX side onto a platform (default: "
                             "whatever jax picks — the TPU when tunneled); "
                             "Keras/TF always runs on CPU here")
    args = parser.parse_args()

    import jax

    if args.stage == "keras" and args.jax_platform is None:
        # the keras stage must not claim the single-tenant TPU (feature
        # extraction is the only jax use; it runs fine on CPU and the
        # per-wav .npy cache makes repeats free)
        args.jax_platform = "cpu"
    if args.jax_platform:
        # env var too: enable_compilation_cache re-applies JAX_PLATFORMS
        os.environ["JAX_PLATFORMS"] = args.jax_platform
        jax.config.update("jax_platforms", args.jax_platform)
    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import numpy as np

    from tpu_speech_commands.data.dataset import get_dataset
    from tpu_speech_commands.data.synthetic import make_synthetic_dataset
    from tpu_speech_commands.utils.common import get_classes

    classes = get_classes(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..",
        "configs", "speech_commands_classes.txt",
    ))
    # the corpus is generated once with a fixed seed; per-run seeds vary
    # the split/init/shuffling, not the data
    tag = "" if args.distribution == "easy" else f"_{args.distribution}"
    ds_root = os.path.join(args.work_dir,
                           f"ds36_{args.samples_per_class}{tag}")
    if not os.path.isdir(os.path.join(ds_root, "sounds")):
        print(f"Building {len(classes)}-class synthetic dataset "
              f"({args.samples_per_class}/class, {args.distribution}) ...")
        make_synthetic_dataset(ds_root, classes,
                               samples_per_class=args.samples_per_class,
                               seed=7, hard=args.distribution == "hard")
        # Extract + write the per-sample feature cache, then fall through
        # to the cache READ below and discard this result: the
        # fresh-extraction sample order (sound-file order) is a different
        # permutation than the uuid-sorted cache order every later process
        # sees, so the per-seed train/val splits — and the stage
        # fingerprint — must always be computed on the stable cache order.
        get_dataset(ds_root, classes)

    full = get_dataset(ds_root, classes)
    x, y = np.asarray(full.x, np.float32), np.asarray(full.y, np.int64)

    import json

    stage_json = os.path.join(
        args.work_dir,
        f"keras_stage_{args.distribution}_{args.samples_per_class}spc_"
        f"{args.epochs}ep.json",
    )
    # Fingerprint of everything that makes two stage runs comparable: a
    # stale stage file from a different corpus/recipe must refuse loudly
    # instead of silently mixing runs (VERDICT r4 item 8).
    stage_config = {
        "schema": 1,
        "distribution": args.distribution,
        "samples_per_class": args.samples_per_class,
        "epochs": args.epochs,
        "batch_size": args.batch_size,
        "learning_rate": args.learning_rate,
        "val_split": args.val_split,
        "n_classes": len(classes),
        "n_samples": int(len(x)),
        "corpus_fingerprint": [float(x.sum()), float(abs(x).sum()),
                               list(x.shape)],
    }
    keras_stage = {}
    if os.path.isfile(stage_json):
        with open(stage_json) as f:
            keras_stage = json.load(f)
        found = keras_stage.get("__config__")
        if found != stage_config:
            raise SystemExit(
                f"stage file {stage_json} was produced with a different "
                f"configuration.\n  recorded: {found}\n  current:  "
                f"{stage_config}\nDelete the stage file (or match the "
                "flags it was recorded with) before mixing runs."
            )
    elif args.stage == "jax":
        raise SystemExit(
            f"--stage jax needs the keras stage file {stage_json}; run "
            "--stage keras first with the same flags."
        )
    keras_stage["__config__"] = stage_config

    def stage_entry(model_type, seed):
        try:
            return keras_stage[model_type][str(seed)]
        except KeyError:
            raise SystemExit(
                f"stage file {stage_json} has no entry for model "
                f"'{model_type}' seed {seed}: the keras stage was run "
                "with different --model_type/--seed values. Re-run "
                "--stage keras with the missing combination (it resumes; "
                "existing entries are kept)."
            ) from None

    results = {m: {"keras": [], "jax": [], "cross": []}
               for m in args.model_types}
    for seed in args.seeds:
        # fresh shuffled split per seed, shared by both frameworks
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(x))
        n_val = int(len(x) * args.val_split)
        val_idx, train_idx = order[:n_val], order[n_val:]
        x_train, y_train = x[train_idx], y[train_idx]
        x_val, y_val = x[val_idx], y[val_idx]
        print(f"\n-- seed {seed}: train {len(x_train)} / val {len(x_val)} "
              f"samples, {len(classes)} classes --")
        for model_type in args.model_types:
            print(f"[seed {seed}] {model_type}:", flush=True)
            if args.stage == "jax":
                entry = stage_entry(model_type, seed)
                keras_acc, h5_path = entry["acc"], entry["h5"]
                print(f"  keras final val_accuracy: {keras_acc:.4f} "
                      "(from keras stage)")
            elif (str(seed) in keras_stage.get(model_type, {})
                  and os.path.isfile(
                      keras_stage[model_type][str(seed)]["h5"])):
                entry = keras_stage[model_type][str(seed)]
                keras_acc, h5_path = entry["acc"], entry["h5"]
                print(f"  keras final val_accuracy: {keras_acc:.4f} "
                      "(resumed from stage file)")
            else:
                keras_acc, h5_path = train_keras(
                    args, model_type, seed, classes, x_train, y_train,
                    x_val, y_val,
                )
                keras_stage.setdefault(model_type, {})[str(seed)] = {
                    "acc": keras_acc, "h5": h5_path,
                }
                with open(stage_json, "w") as f:  # checkpoint progress
                    json.dump(keras_stage, f)
            if args.stage == "keras":
                results[model_type]["keras"].append(keras_acc)
                continue
            jax_acc = train_jax(args, model_type, seed, classes,
                                x_train, y_train, x_val, y_val)
            cross_acc = cross_load_eval(model_type, classes, h5_path,
                                        x_val, y_val)
            results[model_type]["keras"].append(keras_acc)
            results[model_type]["jax"].append(jax_acc)
            results[model_type]["cross"].append(cross_acc)
    if args.stage == "keras":
        print(f"\nkeras stage complete -> {stage_json}")
        return

    def fmt(vals):
        vals = np.asarray(vals)
        if len(vals) == 1:
            return f"**{vals[0]:.4f}**"
        return f"**{vals.mean():.4f} ± {vals.std(ddof=1):.4f}**"

    n_val = int(len(x) * args.val_split)
    print("\n== accuracy parity (final val top-1; "
          f"{len(args.seeds)} seed(s), val n={n_val}) ==")
    for model_type, r in results.items():
        delta = np.abs(np.asarray(r["keras"]) - np.asarray(r["jax"]))
        print(f"| {model_type} ({len(classes)}-class synthetic, "
              f"batch {args.batch_size}, adam {args.learning_rate}, "
              f"{args.epochs} epochs) "
              f"| Keras (reference arch): {fmt(r['keras'])} "
              f"| this framework: {fmt(r['jax'])} "
              f"| Keras H5 cross-loaded into JAX: {fmt(r['cross'])} "
              f"| mean |Keras−JAX|: {delta.mean():.4f} |")


def train_keras(args, model_type, seed, classes, x_train, y_train,
                x_val, y_val):
    import tensorflow as tf

    from tpu_speech_commands.export.keras_interop import build_keras_model

    tf.keras.utils.set_random_seed(seed)
    model = build_keras_model(model_type, len(classes),
                              n_features=x_train.shape[1],
                              feature_size=x_train.shape[2])
    model.compile(
        optimizer=tf.keras.optimizers.Adam(learning_rate=args.learning_rate),
        loss=tf.keras.losses.SparseCategoricalCrossentropy(),
        metrics=["accuracy"],
    )
    xt = x_train[..., None] if model.input_shape[-1] == 1 else x_train
    xv = x_val[..., None] if model.input_shape[-1] == 1 else x_val
    hist = model.fit(
        xt, y_train, batch_size=args.batch_size, epochs=args.epochs,
        validation_data=(xv, y_val), shuffle=True, verbose=0,
    )
    acc = float(hist.history["val_accuracy"][-1])
    # distribution/epochs in the name: the easy and hard studies must not
    # overwrite each other's weights (the cross-load column reads these)
    h5_path = os.path.join(
        args.work_dir,
        f"keras_{model_type}_{args.distribution}_{args.epochs}ep_s{seed}.h5",
    )
    model.save(h5_path)
    print(f"  keras final val_accuracy: {acc:.4f}")
    return acc, h5_path


def train_jax(args, model_type, seed, classes, x_train, y_train,
              x_val, y_val):
    import jax
    import numpy as np

    from tpu_speech_commands.data.dataset import Dataset
    from tpu_speech_commands.optim import get_optimizer
    from tpu_speech_commands.training import (
        Trainer, TrainerConfig, create_train_state,
    )

    tx = get_optimizer("adam", args.learning_rate, decay_type=None,
                       injectable=True)
    model, state = create_train_state(model_type, len(classes), tx,
                                      jax.random.PRNGKey(seed))
    cfg = TrainerConfig(
        batch_size=args.batch_size, epochs=args.epochs,
        log_dir=os.path.join(args.work_dir, "jax_logs"),
        log_tensorboard=False, seed=seed,
        # keep the comparison a pure fit-loop contest, as model.fit has no
        # plateau/early-stop here (train.py only adds them via callbacks)
        use_plateau=False, early_stopping_patience=10 ** 9,
    )
    trainer = Trainer(model, state, model_type, len(classes), cfg)
    history = trainer.fit(
        Dataset(x_train, np.asarray(y_train, np.int32)),
        Dataset(x_val, np.asarray(y_val, np.int32)),
        verbose=False,
    )
    acc = history[-1].val_accuracy
    print(f"  jax   final val_accuracy: {acc:.4f}")
    return acc


def cross_load_eval(model_type, classes, h5_path, x_val, y_val):
    import jax.numpy as jnp
    import numpy as np

    from tpu_speech_commands.export.keras_interop import load_keras_h5_weights
    from tpu_speech_commands.models import (
        features_to_input, get_model, score_fn,
    )

    variables = load_keras_h5_weights(h5_path, model_type, len(classes))
    model = get_model(model_type, len(classes))
    x = features_to_input(jnp.asarray(x_val), model_type)
    scores = np.asarray(score_fn(model.apply(variables, x, train=False)))
    acc = float((scores.argmax(-1) == y_val).mean())
    print(f"  keras H5 -> JAX cross-load val_accuracy: {acc:.4f}")
    return acc


if __name__ == "__main__":
    main()
