"""Params layer tests — derived-quantity rounding must match the reference
(classifier/params.py:59-91)."""
import json

from tpu_speech_commands.params import ListenerParams, inject_params, pr, save_params


def test_default_derived_quantities():
    p = ListenerParams()
    # Defaults (reference params.py:99-103) imply a 30x20 model input.
    assert p.window_samples == 1024
    assert p.hop_samples == 512
    assert p.max_samples == 16000
    assert p.buffer_samples == 15872  # truncated to hop multiple
    assert p.n_features == 30
    assert p.feature_size == 20
    assert p.n_fft_bins == 513


def test_use_delta_doubles_feature_size():
    p = ListenerParams(use_delta=True)
    assert p.feature_size == 40


def test_rounding_half_up():
    # window_t=0.0639 -> 1022.4 + .5 -> 1022 ; 0.064 -> 1024.5 -> 1024
    assert ListenerParams(window_t=0.0639).window_samples == 1022


def test_inject_and_save_roundtrip(tmp_path):
    path = tmp_path / "params.json"
    cfg = {
        "buffer_t": 1.5,
        "window_t": 0.064,
        "hop_t": 0.032,
        "sample_rate": 16000,
        "sample_depth": 2,
        "n_fft": 512,
        "n_filt": 24,
        "n_mfcc": 13,
        "use_delta": False,
        "threshold_config": [[6, 4]],
        "threshold_center": 0.2,
    }
    path.write_text(json.dumps(cfg))
    old = pr.to_dict()
    try:
        out = inject_params(str(path))
        assert out is pr  # global singleton mutated in place
        assert pr.n_fft == 512 and pr.n_filt == 24 and pr.n_mfcc == 13
        assert pr.threshold_config == ((6, 4),)
        save_path = tmp_path / "saved.json"
        save_params(str(save_path))
        assert json.loads(save_path.read_text())["n_filt"] == 24
    finally:
        pr.override(old)


def test_inject_missing_file_is_noop(tmp_path):
    old = pr.to_dict()
    inject_params(str(tmp_path / "nope.json"))
    assert pr.to_dict() == old


def test_inject_bad_files_warn_and_leave_params_intact(tmp_path, capsys):
    """Atomicity + warning contract: a non-object JSON top level or a bad
    field value must leave the singleton untouched (no half-mutation) and
    print the reference-style warning instead of crashing."""
    old = pr.to_dict()
    # non-object top level used to escape as AttributeError
    p1 = tmp_path / "arr.json"
    p1.write_text("[1, 2, 3]")
    inject_params(str(p1))
    assert pr.to_dict() == old
    # a good field before a bad one: must be all-or-nothing
    p2 = tmp_path / "half.json"
    p2.write_text(json.dumps({"sample_rate": 8000, "threshold_config": 5}))
    inject_params(str(p2))
    assert pr.to_dict() == old
    out = capsys.readouterr().out
    assert out.count("Failed to load parameters") == 2


def test_inject_unknown_key_warns(tmp_path, capsys):
    old = pr.to_dict()
    path = tmp_path / "typo.json"
    path.write_text(json.dumps({"nfft": 512}))
    try:
        inject_params(str(path))
        assert pr.to_dict() == old  # typo'd key silently dropped before
        assert "ignoring unknown params key 'nfft'" in capsys.readouterr().out
    finally:
        pr.override(old)
