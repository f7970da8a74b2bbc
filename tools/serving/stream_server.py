#!/usr/bin/env python3
"""Multi-stream serving demo: N concurrent audio streams, one device step.

The deployable counterpart of listen.py's single-stream loop: a fixed pool
of serving slots, each holding an independent stream (its own pending-
sample counter via streaming/feature_stream.py), advanced by ONE jitted
device step per chunk tick:

    (states, chunks) -> ring update -> incremental MFCC -> model -> scores

Streams may join and leave at any tick — a freed slot is zeroed with
reset_streams() so a new caller never sees the previous stream's audio —
and each slot runs the reference post-processing (ThresholdDecoder +
TriggerDetector) on the host at chunk cadence.

Demo mode (default): replays wav files into slots with staggered joins and
prints per-slot trigger events.

    python tools/serving/stream_server.py --wavs a.wav b.wav c.wav \
        --slots 8 --classes_path configs/direction_classes.txt \
        --model_path logs/000/trained_final.npz
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--classes_path", required=True)
    parser.add_argument("--wavs", nargs="+", required=True,
                        help="wav files; assigned to free slots round-robin")
    parser.add_argument("--slots", type=int, default=8,
                        help="serving capacity (streams per device step)")
    parser.add_argument("--chunk_size", type=int, default=1024)
    parser.add_argument("--stagger", type=int, default=3,
                        help="ticks between stream admissions")
    parser.add_argument("--sensitivity", type=float, default=0.5)
    parser.add_argument("--trigger_level", type=int, default=3)
    parser.add_argument("--params_path", default=None)
    args = parser.parse_args()
    if args.slots < 1:
        parser.error("--slots must be >= 1 (0 slots can never admit a "
                     "stream, so the serve loop would spin forever)")

    from tpu_speech_commands.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu_speech_commands.data.wav import load_wav
    from tpu_speech_commands.export.inference_loader import load_inference_model
    from tpu_speech_commands.frontend import Frontend
    from tpu_speech_commands.params import inject_params, pr
    from tpu_speech_commands.streaming import (
        ThresholdDecoder,
        TriggerDetectorArray,
        init_stream_state,
        make_stream_update,
        reset_streams,
    )
    from tpu_speech_commands.utils.common import (
        ensure_background_first,
        get_classes,
    )

    classes = get_classes(args.classes_path)
    ensure_background_first(classes)

    # load FIRST (a native checkpoint restores its stored train-time
    # params), then --params_path wins on top — same precedence as
    # listen.py/eval.py
    predict, model_format = load_inference_model(args.model_path)
    if args.params_path:
        inject_params(args.params_path)

    from tpu_speech_commands.export.inference_loader import (
        resolve_checkpoint_contract,
    )

    feature_type = resolve_checkpoint_contract(
        predict, model_format, class_names=classes
    )
    frontend = Frontend(pr, feature_type=feature_type)
    update = make_stream_update(frontend, args.chunk_size)
    # native checkpoints fuse ring-update + model forward into ONE jitted
    # dispatch per tick with donated stream state (same shape as
    # Listener._setup_stream) — on the tunneled TPU each dispatch is
    # ~32 ms RTT-bound, so an unfused update+predict pair plus the
    # device->host->device feature round trip could not hold the 64 ms
    # chunk cadence.  External formats (ONNX/TFLite) execute on the host,
    # so the feature pull is inherent there.
    if model_format == "NATIVE":
        from tpu_speech_commands.models import features_to_input, score_fn

        model, variables = predict.model, predict.variables
        model_type = predict.model_type

        def _fused(states, chunks):
            states, feats = update(states, chunks)
            x = features_to_input(feats, model_type)
            return states, score_fn(model.apply(variables, x, train=False))

        _step = jax.jit(_fused, donate_argnums=(0,))
        _update_only = jax.jit(lambda s, c: update(s, c)[0],
                               donate_argnums=(0,))

        def tick_scores(states, chunks):
            states, scores = _step(states, jnp.asarray(chunks))
            return states, np.asarray(scores)

        def tick_update(states, chunks):
            # idle tick (no active slot): ring update only — don't burn
            # a classifier dispatch computing scores nobody reads
            return _update_only(states, jnp.asarray(chunks))
    else:
        _update = jax.jit(update, donate_argnums=(0,))
        _update_only = jax.jit(lambda s, c: update(s, c)[0],
                               donate_argnums=(0,))

        def tick_scores(states, chunks):
            states, feats = _update(states, jnp.asarray(chunks))
            return states, np.asarray(predict(np.asarray(feats)))

        def tick_update(states, chunks):
            return _update_only(states, jnp.asarray(chunks))

    n_slots = args.slots
    states = init_stream_state(pr, n_streams=n_slots)
    # postprocess is vectorized across the slot pool: one stateless CDF
    # decode (decode_array) + one TriggerDetectorArray update per tick —
    # a per-slot Python loop becomes the budget near ~1000 slots (see
    # tools/evaluation/bench_postprocess.py for the measurement)
    decoder = ThresholdDecoder(pr.threshold_config, pr.threshold_center)
    detector = TriggerDetectorArray(args.chunk_size, classes,
                                    args.sensitivity, args.trigger_level,
                                    n_slots=n_slots)

    # host-side slot bookkeeping
    slot_wav = [None] * n_slots    # active wav audio per slot
    slot_pos = [0] * n_slots
    slot_name = [""] * n_slots
    pending = list(args.wavs)
    tick = 0
    served = 0

    def admit():
        nonlocal states
        free = [i for i in range(n_slots) if slot_wav[i] is None]
        if not free or not pending:
            return
        slot = free[0]
        path = pending.pop(0)
        audio = load_wav(path, sample_rate=pr.sample_rate)
        mask = np.zeros(n_slots, bool)
        mask[slot] = True
        states = reset_streams(states, jnp.asarray(mask))
        detector.reset(slot)
        slot_wav[slot] = audio.astype(np.float32)
        slot_pos[slot] = 0
        slot_name[slot] = os.path.basename(path)
        print(f"[tick {tick}] slot {slot} <- {slot_name[slot]} "
              f"({len(audio)} samples)")

    while pending or any(w is not None for w in slot_wav):
        if tick % max(args.stagger, 1) == 0:
            admit()

        chunks = np.zeros((n_slots, args.chunk_size), np.float32)
        active = []
        for i in range(n_slots):
            if slot_wav[i] is None:
                continue
            lo = slot_pos[i]
            piece = slot_wav[i][lo : lo + args.chunk_size]
            chunks[i, : len(piece)] = piece
            slot_pos[i] += args.chunk_size
            active.append(i)

        if active:
            states, scores = tick_scores(states, chunks)
            idx = scores.argmax(axis=1)
            conf = scores[np.arange(n_slots), idx].astype(np.float64)
            non_bg = idx != 0
            conf[non_bg] = decoder.decode_array(conf[non_bg])
            active_mask = np.zeros(n_slots, bool)
            active_mask[active] = True
            fired = detector.update(idx, conf, active_mask)
            for i in np.nonzero(fired)[0]:
                print(f"[tick {tick}] slot {i} ({slot_name[i]}): "
                      f"command '{classes[idx[i]]}' detected!")
        else:
            states = tick_update(states, chunks)

        for i in list(active):
            if slot_pos[i] >= len(slot_wav[i]):
                print(f"[tick {tick}] slot {i} ({slot_name[i]}) finished")
                slot_wav[i] = None
                served += 1
        tick += 1

    print(f"served {served} streams over {tick} ticks "
          f"({n_slots} slots, {model_format} model)")


if __name__ == "__main__":
    main()
