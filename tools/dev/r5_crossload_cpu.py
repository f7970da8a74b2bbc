#!/usr/bin/env python3
"""Cross-load-only leg of the accuracy-parity study, runnable without the
TPU: evaluate every Keras-stage H5 (both distributions, all seeds) through
this framework's models on JAX CPU and report mean±std vs the recorded
Keras accuracies.

This pins the weight-level-interop column of PARITY.md's parity table
(`Keras H5 cross-loaded into JAX`) at 100 epochs x 5 seeds even when the
TPU tunnel is down (the jax-trained column needs device time; this one is
a single forward pass per model).  Reads the stage JSONs written by
`tools/evaluation/accuracy_parity.py --stage keras` and reuses its exact
val-split convention (seeded permutation on the stable cache order).

    python tools/dev/r5_crossload_cpu.py [--work_dir /tmp/accuracy_parity]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work_dir", default="/tmp/accuracy_parity")
    ap.add_argument("--distribution", nargs="+", default=["easy", "hard"])
    ap.add_argument("--samples_per_class", type=int, default=371)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--val_split", type=float, default=0.15)
    ap.add_argument("--out", default="/tmp/accuracy_parity/crossload_cpu.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np

    from tpu_speech_commands.data.dataset import get_dataset
    from tpu_speech_commands.utils.common import get_classes

    classes = get_classes(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..",
        "configs", "speech_commands_classes.txt",
    ))
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "evaluation"))
    from accuracy_parity import cross_load_eval

    out = {}
    for dist in args.distribution:
        stage_json = os.path.join(
            args.work_dir,
            f"keras_stage_{dist}_{args.samples_per_class}spc_"
            f"{args.epochs}ep.json")
        with open(stage_json) as f:
            stage = json.load(f)
        tag = "" if dist == "easy" else f"_{dist}"
        ds_root = os.path.join(args.work_dir,
                               f"ds36_{args.samples_per_class}{tag}")
        full = get_dataset(ds_root, classes)
        x, y = np.asarray(full.x, np.float32), np.asarray(full.y, np.int64)
        fp = [float(x.sum()), float(abs(x).sum()), list(x.shape)]
        if fp != stage["__config__"]["corpus_fingerprint"]:
            raise SystemExit(f"corpus fingerprint mismatch for {dist}: "
                             f"{fp} != recorded")
        out[dist] = {}
        for fam in sorted(k for k in stage if k != "__config__"):
            rows = []
            for seed_s, entry in sorted(stage[fam].items(),
                                        key=lambda kv: int(kv[0])):
                seed = int(seed_s)
                rng = np.random.default_rng(seed)
                order = rng.permutation(len(x))
                n_val = int(len(x) * args.val_split)
                val_idx = order[:n_val]
                x_val, y_val = x[val_idx], y[val_idx]
                print(f"[{dist}] {fam} seed {seed}: keras "
                      f"{entry['acc']:.4f}", flush=True)
                cross = cross_load_eval(fam, classes, entry["h5"],
                                        x_val, y_val)
                rows.append({"seed": seed, "keras": entry["acc"],
                             "cross": cross})
            ks = np.array([r["keras"] for r in rows])
            cs = np.array([r["cross"] for r in rows])
            out[dist][fam] = {
                "rows": rows,
                "keras_mean": float(ks.mean()),
                "keras_std": float(ks.std(ddof=1)) if len(ks) > 1 else 0.0,
                "cross_mean": float(cs.mean()),
                "cross_std": float(cs.std(ddof=1)) if len(cs) > 1 else 0.0,
                "mean_abs_delta": float(np.abs(ks - cs).mean()),
                "max_abs_delta": float(np.abs(ks - cs).max()),
            }
            s = out[dist][fam]
            print(f"  => {fam} [{dist}] n={len(rows)} keras "
                  f"{s['keras_mean']:.4f}±{s['keras_std']:.4f} cross "
                  f"{s['cross_mean']:.4f}±{s['cross_std']:.4f} "
                  f"mean|Δ| {s['mean_abs_delta']:.4f} "
                  f"max|Δ| {s['max_abs_delta']:.4f}", flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwritten -> {args.out}")


if __name__ == "__main__":
    main()
