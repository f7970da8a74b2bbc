"""Dataset pipeline (reference: classifier/data.py:15-120).

Layout contract is identical to the reference:

    <dataset>/sounds/<class_name>/*.wav        raw audio
    <dataset>/features/<class_name>/*.npy      per-sample feature cache

but the hot loop changes shape: instead of per-wav CPU DSP
(`data.py:30-46`), wav decode happens on the host into fixed-length int16
buffers and the feature transform runs **batched on device** through the
jnp frontend (`frontend.dsp.Frontend`).  The legacy per-sample `.npy`
feature cache is still supported (read and write) for drop-in compatibility
with datasets prepared by the reference tooling.

An additional packed cache (`features.npz`, one array per class) amortises
file-system overhead for large datasets.
"""
from __future__ import annotations

import os
import uuid
import weakref
from dataclasses import dataclass
from glob import glob

import numpy as np

from ..params import pr
from .wav import load_wav


@dataclass
class Dataset:
    """In-memory dataset: x features, y integer labels."""

    x: np.ndarray  # (N, n_features, feature_size) float32
    y: np.ndarray  # (N,) int32

    def __len__(self):
        return len(self.x)


def get_sample_list(dataset_path: str, class_names: list[str]) -> dict[str, list[str]]:
    """Scan <dataset>/sounds/<class>/*.wav; error on a missing class dir
    (data.py:15-27)."""
    sound_root = os.path.join(dataset_path, "sounds")
    samples = {}
    for class_name in class_names:
        class_dir = os.path.join(sound_root, class_name)
        if not os.path.isdir(class_dir):
            raise ValueError(f"class dir {class_dir} does not exist")
        samples[class_name] = sorted(glob(os.path.join(class_dir, "*.wav")))
    return samples


def load_audio_batch(wav_paths: list[str], params=None) -> np.ndarray:
    """Decode wavs into a fixed-length float32 batch (N, max_samples),
    left-zero-padded / tail-truncated (data_utils.py:73-80 semantics)."""
    p = params or pr
    out = np.zeros((len(wav_paths), p.max_samples), dtype=np.float32)
    for i, path in enumerate(wav_paths):
        audio = load_wav(path, p.sample_rate)[: p.max_samples]
        out[i, p.max_samples - len(audio) :] = audio
    return out


# jit wrappers cached per frontend object: a fresh jax.jit(lambda ...) on
# every call would retrace (and on the tunneled TPU recompile, minutes)
# once per extract_features_batched call — e.g. once per class in
# get_dataset.  Weak keys so frontends stay garbage-collectable.
_JITTED_FRONTENDS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _jitted_frontend(frontend):
    try:
        fn = _JITTED_FRONTENDS.get(frontend)
    except TypeError:  # unhashable / not weakref-able callable
        fn = getattr(frontend, "_tsc_jitted", None)
    if fn is None:
        import jax

        # close over a weakref, not the frontend itself: the cached value
        # is held by the WeakKeyDictionary (values are strong refs), so a
        # closure over `frontend` would keep its own key alive forever
        try:
            ref = weakref.ref(frontend)
            fn = jax.jit(lambda a: ref()(a))
            _JITTED_FRONTENDS[frontend] = fn
        except TypeError:  # unhashable / not weakref-able callable
            fn = jax.jit(lambda a: frontend(a))
            try:  # cache on the object so repeat calls don't retrace
                frontend._tsc_jitted = fn
            except AttributeError:
                pass  # truly uncacheable (slots/frozen): retrace per call
    return fn


def extract_features_batched(
    wav_paths: list[str],
    frontend,
    batch_size: int = 512,
    params=None,
) -> np.ndarray:
    """Device-batched feature extraction for a list of wavs.

    `frontend` is a jit-compatible callable (B, max_samples) -> (B, T, F)
    — the TPU replacement for the reference CPU hot loop (data.py:30-46).
    The last batch is padded to `batch_size` to avoid a recompile.
    """
    import jax.numpy as jnp

    p = params or pr
    fn = _jitted_frontend(frontend)
    feats = []
    starts = range(0, len(wav_paths), batch_size)
    try:  # progress bar like the reference extraction loop (data.py:38)
        from tqdm import tqdm

        starts = tqdm(starts, desc="extract features", unit="batch")
    except ImportError:
        pass
    for start in starts:
        chunk = wav_paths[start : start + batch_size]
        audio = load_audio_batch(chunk, p)
        if len(chunk) < batch_size:
            audio = np.concatenate(
                [audio, np.zeros((batch_size - len(chunk), p.max_samples), np.float32)]
            )
        out = np.asarray(fn(jnp.asarray(audio)))[: len(chunk)]
        feats.append(out.astype(np.float32))
    return np.concatenate(feats) if feats else np.zeros((0, 0, 0), np.float32)


def save_features_npy(
    dataset_path: str, class_name: str, features: np.ndarray
) -> None:
    """Write the reference-compatible per-sample .npy cache (data.py:49-68)."""
    feat_dir = os.path.join(dataset_path, "features", class_name)
    os.makedirs(feat_dir, exist_ok=True)
    for feat in features:
        np.save(os.path.join(feat_dir, f"{uuid.uuid4()}.npy"), feat)


def _load_cached_class(feat_dir: str) -> np.ndarray:
    files = sorted(glob(os.path.join(feat_dir, "*.npy")))
    return np.stack([np.load(f) for f in files]) if files else None


def get_audio_dataset(
    dataset_path: str,
    class_names: list[str],
    val_split: float | None = None,
    seed: int = 0,
    params=None,
):
    """Load raw audio (fixed-length, left-padded) instead of features.

    Feeds the on-device augmentation + fused-frontend training path
    (data/augment.py): x is (N, max_samples) float32.  Returns Dataset or
    (train, val) like get_dataset.
    """
    p = params or pr
    samples = get_sample_list(dataset_path, class_names)
    xs, ys = [], []
    for idx, class_name in enumerate(class_names):
        paths = samples[class_name]
        if not paths:
            continue
        xs.append(load_audio_batch(paths, p))
        ys.append(np.full(len(paths), idx, np.int32))
    x = np.concatenate(xs).astype(np.float32)
    y = np.concatenate(ys).astype(np.int32)
    if val_split is None:
        return Dataset(x, y)
    return _shuffled_split(x, y, val_split, seed)


def _shuffled_split(x, y, val_split: float, seed: int):
    """(train, val) Datasets via a shuffled split (reference uses sklearn
    train_test_split, data.py:71-77)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(x))
    n_val = int(round(len(x) * val_split))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    return Dataset(x[train_idx], y[train_idx]), Dataset(x[val_idx], y[val_idx])


PACKED_CACHE = "features_packed.npz"


def _cache_fingerprint(dataset_path: str, class_names: list[str]) -> str:
    """Cheap content fingerprint of the source tree a pack snapshots.

    Per class: file count and max file mtime over both the wavs and the
    per-sample .npy cache.  Unlike directory mtimes this catches in-place
    edits to an existing file and same-second adds on coarse-mtime
    filesystems (mtime compared at 1 µs granularity per file, not via the
    parent dir)."""
    parts = []
    for class_name in class_names:
        for root in ("sounds", "features"):
            for cand in (class_name, class_name.lower()):
                d = os.path.join(dataset_path, root, cand)
                if not os.path.isdir(d):
                    continue
                pat = "*.wav" if root == "sounds" else "*.npy"
                files = glob(os.path.join(d, pat))
                max_t = max((os.path.getmtime(f) for f in files), default=0.0)
                parts.append(f"{root}/{cand}:{len(files)}:{max_t:.6f}")
    return ";".join(parts)


def pack_cache(dataset_path: str, class_names: list[str]) -> str:
    """Consolidate the per-sample .npy cache into one packed file.

    At Google-Speech-Commands scale the legacy layout is ~100k tiny files;
    the packed form loads `get_dataset` in one archive read instead of
    100k opens.  The legacy cache remains valid (reference compatibility)
    — packing is an optimisation, not a migration.
    """
    ds = get_dataset(dataset_path, class_names, use_cache=True)
    out = os.path.join(dataset_path, PACKED_CACHE)
    np.savez(out, x=ds.x, y=ds.y,
             classes=np.array(class_names, dtype=np.str_),
             fingerprint=np.array(
                 _cache_fingerprint(dataset_path, class_names), dtype=np.str_))
    return out


def _load_packed(dataset_path: str, class_names: list[str]):
    path = os.path.join(dataset_path, PACKED_CACHE)
    if not os.path.exists(path):
        return None
    # staleness check: the pack snapshots the per-sample cache / sounds
    # tree.  Primary: a per-file content fingerprint stored inside the
    # pack (counts + max file mtime per class dir) — robust to coarse
    # directory mtimes and in-place file edits, which the dir-mtime probe
    # below misses.  Old packs without a fingerprint fall back to the
    # dir-mtime heuristic.
    data = np.load(path)
    if "fingerprint" in data.files:
        if str(data["fingerprint"]) != _cache_fingerprint(dataset_path, class_names):
            return None
    else:
        pack_t = os.path.getmtime(path)
        feature_root = os.path.join(dataset_path, "features")
        sound_root = os.path.join(dataset_path, "sounds")
        dirs = [dataset_path, feature_root, sound_root]
        for root in (feature_root, sound_root):
            for c in class_names:
                dirs += [os.path.join(root, c), os.path.join(root, c.lower())]
        if any(os.path.isdir(d) and os.path.getmtime(d) > pack_t for d in dirs):
            return None
    stored = [str(c) for c in data["classes"]]
    if stored != list(class_names):
        return None  # class list changed; fall back to per-sample cache
    return Dataset(np.asarray(data["x"]), np.asarray(data["y"]))


def get_dataset(
    dataset_path: str,
    class_names: list[str],
    val_split: float | None = None,
    frontend=None,
    batch_size: int = 512,
    use_cache: bool = True,
    seed: int = 0,
    params=None,
):
    """Load (or build) the feature dataset (data.py:80-120).

    Returns Dataset, or (train_ds, val_ds) when val_split is given.
    Labels are class indices in `class_names` order; the `features/` dir
    short-circuits re-extraction exactly like the reference cache.
    """
    p = params or pr
    feature_root = os.path.join(dataset_path, "features")
    xs, ys = [], []

    packed = _load_packed(dataset_path, class_names) if use_cache else None
    if packed is not None:
        xs, ys = [packed.x], [packed.y]
    elif use_cache and os.path.isdir(feature_root):
        for idx, class_name in enumerate(class_names):
            feats = _load_cached_class(os.path.join(feature_root, class_name.lower()))
            if feats is None:
                feats = _load_cached_class(os.path.join(feature_root, class_name))
            if feats is None:
                sound_dir = os.path.join(dataset_path, "sounds", class_name)
                if os.path.isdir(sound_dir) and not glob(
                    os.path.join(sound_dir, "*.wav")
                ):
                    # mirror the extraction branch: a class with zero
                    # source wavs is skipped at build time (nothing is
                    # cached for it), so a cached reload must skip it
                    # too instead of failing every run after the first
                    continue
                raise ValueError(f"no cached features for class {class_name}")
            xs.append(np.squeeze(feats, axis=-1) if feats.ndim == 4 else feats)
            ys.append(np.full(len(feats), idx, np.int32))
    else:
        if frontend is None:
            from ..frontend import Frontend

            frontend = Frontend(p)
        samples = get_sample_list(dataset_path, class_names)
        for idx, class_name in enumerate(class_names):
            paths = samples[class_name]
            if not paths:
                continue
            feats = extract_features_batched(paths, frontend, batch_size, p)
            xs.append(feats)
            ys.append(np.full(len(feats), idx, np.int32))
            if use_cache:
                save_features_npy(dataset_path, class_name, feats)

    x = np.concatenate(xs).astype(np.float32)
    y = np.concatenate(ys).astype(np.int32)

    if val_split is None:
        return Dataset(x, y)
    return _shuffled_split(x, y, val_split, seed)


def batch_iterator(
    ds: Dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = False,
    pad_final: bool = True,
):
    """Yield (x, y, valid_count) host batches.

    The final short batch is padded to `batch_size` with REPEATED real
    rows (valid_count marks the real ones) so jitted steps see one static
    shape — no recompiles — without zero rows skewing BatchNorm stats.
    """
    n = len(ds)
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        x, y = ds.x[idx], ds.y[idx]
        valid = len(idx)
        if valid < batch_size:
            if drop_remainder:
                return
            if pad_final:
                # repeat real rows rather than zero-pad: padded rows are
                # masked out of loss/metrics but still enter BatchNorm
                # batch statistics, and zero rows would skew them
                pad = batch_size - valid
                rep = np.arange(pad) % max(valid, 1)
                x = np.concatenate([x, x[rep]])
                y = np.concatenate([y, y[rep]])
        yield x, y, valid
