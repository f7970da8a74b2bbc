"""NumPy-oracle frontend tests.

Golden fixtures in tests/fixtures/golden_mfcc.npz were produced by running
the *reference's own C++ DSP port* (inference/tflite/mfcc.h, the faithful
sonopy port) on deterministic signals — see tools/dev/gen_golden_mfcc.py.

Known reference-internal discrepancy (SURVEY.md §2.2): the C++ port
short-circuits all-zero frames to zero vectors, while the sonopy python path
(used for training data) yields [log(eps), dct-of-constant...].  Our oracle
follows the *training* (sonopy) semantics, so comparisons skip all-zero
frames.
"""
import os

import numpy as np
import pytest
import scipy.fftpack

from tpu_speech_commands.frontend import numpy_ref

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "golden_mfcc.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURES)


def _nonzero_frames(audio, window, hop):
    frames = np.array(numpy_ref.chop_array(audio, window, hop))
    return ~np.all(frames == 0, axis=1)


def test_mfcc_matches_reference_cpp_default(golden):
    audio = golden["audio_default"].astype(np.float64)
    ours = numpy_ref.mfcc_spec(
        audio, 16000, (1024, 512), fft_size=1024, num_filt=20, num_coeffs=20
    )
    theirs = golden["mfcc_default"]
    assert ours.shape == theirs.shape == (30, 20)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)


def test_mfcc_matches_reference_cpp_padded(golden):
    audio = golden["audio_padded"].astype(np.float64)
    ours = numpy_ref.mfcc_spec(
        audio, 16000, (1024, 512), fft_size=1024, num_filt=20, num_coeffs=20
    )
    theirs = golden["mfcc_padded"]
    mask = _nonzero_frames(audio, 1024, 512)
    assert mask.sum() > 10  # enough non-trivial frames
    np.testing.assert_allclose(ours[mask], theirs[mask], rtol=1e-5, atol=1e-4)
    # sonopy semantics on all-zero frames: coeff0 = log(eps), rest from
    # dct(log(eps) * ones)[1:] == 0
    zero_rows = ours[~mask]
    if len(zero_rows):
        np.testing.assert_allclose(zero_rows[:, 0], np.log(numpy_ref.LOG_EPS))
        np.testing.assert_allclose(zero_rows[:, 1:], 0.0, atol=1e-12)


def test_mfcc_matches_reference_cpp_alt_config(golden):
    audio = golden["audio_default"].astype(np.float64)
    sr, win, hop, nfft, nmfcc, nfilt = golden["alt_config"]
    ours = numpy_ref.mfcc_spec(
        audio, sr, (win, hop), fft_size=nfft, num_filt=nfilt, num_coeffs=nmfcc
    )
    np.testing.assert_allclose(ours, golden["mfcc_alt"], rtol=1e-5, atol=1e-4)


def test_power_spec_matches_direct_fft(rng):
    audio = rng.standard_normal(4000)
    p = numpy_ref.power_spec(audio, (512, 256), 512)
    assert p.shape == (1 + (4000 - 512) // 256, 257)
    f0 = np.fft.rfft(audio[:512], n=512)
    np.testing.assert_allclose(p[0], (f0.real ** 2 + f0.imag ** 2) / 512, rtol=1e-10)


def test_dct_matrix_matches_scipy(rng):
    x = rng.standard_normal((7, 20))
    np.testing.assert_allclose(
        numpy_ref.dct_ortho(x),
        scipy.fftpack.dct(x, norm="ortho"),
        rtol=1e-10,
        atol=1e-12,
    )


def test_mel_filterbank_shape_and_quirk():
    banks = numpy_ref.mel_filterbanks(16000, 20, 513)
    assert banks.shape == (20, 513)
    assert np.all(banks >= 0) and np.all(banks <= 1)
    # sonopy quirk: high edge at sample_rate -> the top filter's triangle
    # extends past the last rfft bin and is clipped mid-ramp
    assert banks[-1, -1] > 0.0


def test_bark_filterbank_invariants():
    fb = numpy_ref.bark_filterbanks(nfilts=20, nfft=512, sample_rate=16000)
    assert fb.shape == (20, 257)
    assert np.all(fb >= 0) and np.all(fb <= 1.0 + 1e-12)
    # constant scale: each filter has a unity-gain plateau region
    assert (fb.max(axis=1) > 0.99).sum() >= 15


def test_bark_filterbank_default_constant_quirk():
    # The bin mapping ignores the nfft argument (uses defaults 512/16000):
    # with nfft=1024 the filters still occupy only the first ~257 bins.
    fb = numpy_ref.bark_filterbanks(nfilts=20, nfft=1024, sample_rate=16000)
    assert fb.shape == (20, 513)
    assert fb[:, 300:].sum() == 0.0


def test_bfcc_spec_shape_and_energy_swap(rng):
    audio = rng.standard_normal(16000)
    bf = numpy_ref.bfcc_spec(audio, 16000, 1024, 512, fft_size=1024,
                             num_filt=20, num_coeffs=20)
    assert bf.shape == (30, 20)
    powers = numpy_ref.power_spec(audio, (1024, 512), 1024)
    np.testing.assert_allclose(bf[:, 0], numpy_ref.safe_log(powers.sum(1)))


def test_add_deltas(rng):
    f = rng.standard_normal((5, 3))
    d = numpy_ref.add_deltas(f)
    assert d.shape == (5, 6)
    np.testing.assert_allclose(d[0, 3:], 0.0)
    np.testing.assert_allclose(d[1:, 3:], f[1:] - f[:-1])


def test_audio_to_feature_left_pads(rng):
    short = rng.standard_normal(7000)
    feat = numpy_ref.audio_to_feature(short)
    assert feat.shape == (30, 20)
    manual = np.concatenate([np.zeros(9000), short])
    np.testing.assert_allclose(feat, numpy_ref.vectorize_raw(manual))


def test_audio_to_feature_truncates(rng):
    long = rng.standard_normal(20000)
    feat = numpy_ref.audio_to_feature(long)
    np.testing.assert_allclose(feat, numpy_ref.vectorize_raw(long[:16000]))
