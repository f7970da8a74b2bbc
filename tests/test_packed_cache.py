"""Packed feature-cache tests."""
import os

import numpy as np

from tpu_speech_commands.data.dataset import (
    PACKED_CACHE,
    get_dataset,
    pack_cache,
)
from tpu_speech_commands.data.synthetic import make_synthetic_dataset
from tpu_speech_commands.frontend import Frontend

CLASSES = ["background", "left", "right"]


def test_pack_cache_roundtrip(tmp_path):
    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES, samples_per_class=4)
    base = get_dataset(root, CLASSES, frontend=Frontend(), use_cache=True)
    packed_path = pack_cache(root, CLASSES)
    assert os.path.basename(packed_path) == PACKED_CACHE

    packed = get_dataset(root, CLASSES, use_cache=True)
    assert len(packed) == len(base) == 12
    np.testing.assert_allclose(
        np.sort(packed.x.sum((1, 2))), np.sort(base.x.sum((1, 2))), rtol=1e-5
    )
    np.testing.assert_array_equal(np.sort(packed.y), np.sort(base.y))


def test_packed_cache_stale_after_data_change(tmp_path):
    """Deleting features/ (the force-re-extract gesture) and adding wavs
    must invalidate the pack — it used to short-circuit everything."""
    import shutil
    import time

    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES,
                                  samples_per_class=3)
    get_dataset(root, CLASSES, frontend=Frontend(), use_cache=True)
    pack_cache(root, CLASSES)
    time.sleep(0.05)  # ensure the change mtimes exceed the pack's
    snd = os.path.join(root, "sounds", "left")
    src = sorted(os.listdir(snd))[0]
    shutil.copy(os.path.join(snd, src), os.path.join(snd, "zz_new.wav"))
    shutil.rmtree(os.path.join(root, "features"))
    ds = get_dataset(root, CLASSES, frontend=Frontend(), use_cache=True)
    assert len(ds) == 10  # re-extracted: the new wav is included


def test_packed_cache_stale_after_inplace_edit(tmp_path):
    """Overwriting an existing wav/.npy does NOT bump the class dir's
    mtime — the stored content fingerprint (counts + max file mtime)
    must still catch it."""
    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES,
                                  samples_per_class=3)
    get_dataset(root, CLASSES, frontend=Frontend(), use_cache=True)
    pack_cache(root, CLASSES)
    feat_dir = os.path.join(root, "features", "left")
    victim = sorted(os.listdir(feat_dir))[0]
    victim_path = os.path.join(feat_dir, victim)
    arr = np.load(victim_path)
    np.save(victim_path, arr + 123.0)  # in-place edit, same file count
    os.utime(victim_path, (os.path.getmtime(victim_path) + 5,) * 2)
    ds = get_dataset(root, CLASSES, use_cache=True)
    # reloaded from the live .npy tree, so the edit is visible
    assert np.any(ds.x.max((1, 2)) > 100.0)


def test_empty_class_survives_cached_reload(tmp_path):
    """A class dir with zero wavs is skipped at build time; the cached
    reload must skip it too (it used to raise on every run after the
    first, because nothing was cached for the empty class)."""
    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES,
                                  samples_per_class=3)
    os.makedirs(os.path.join(root, "sounds", "stop"))
    classes = CLASSES + ["stop"]
    first = get_dataset(root, classes, frontend=Frontend(), use_cache=True)
    again = get_dataset(root, classes, frontend=Frontend(), use_cache=True)
    assert len(first) == len(again) == 9


def test_packed_cache_invalidated_by_class_change(tmp_path):
    root = make_synthetic_dataset(str(tmp_path / "ds"), CLASSES, samples_per_class=3)
    get_dataset(root, CLASSES, frontend=Frontend(), use_cache=True)
    pack_cache(root, CLASSES)
    # different class ordering -> packed file rejected, legacy cache used
    reordered = ["background", "right", "left"]
    ds = get_dataset(root, reordered, use_cache=True)
    assert len(ds) == 9
