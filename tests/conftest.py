"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests must run without TPU hardware; multi-chip sharding tests use
xla_force_host_platform_device_count to emulate an 8-device mesh.
This must run before the first `import jax` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flag = "--xla_force_host_platform_device_count=8"
_existing = os.environ.get("XLA_FLAGS", "")
if _flag not in _existing:
    os.environ["XLA_FLAGS"] = (_existing + " " + _flag).strip()

# The axon TPU plugin overrides JAX_PLATFORMS; the config knob wins.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def native_lib() -> str:
    """Build native/build/libtsc.so on demand; skip if it can't be built.

    Tests that exercise the .tscm native runtime outside test_native.py
    (which has its own build-on-demand fixture) request this so a fresh
    checkout — where native/build/ is untracked — doesn't fail on test
    order (test_cli sorts before test_native)."""
    import subprocess

    from tpu_speech_commands.utils.native_build import ensure_native_build

    try:
        build = ensure_native_build("libtsc.so")
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"native runtime not built and build failed: {e}")
    return os.path.join(build, "libtsc.so")


@pytest.fixture(autouse=True)
def _restore_pr():
    """Snapshot/restore the global `pr` singleton around every test — the
    checkpoint loaders and exporters inject meta['params'] into it, which
    must not leak into unrelated tests."""
    from tpu_speech_commands.params import pr

    snap = pr.to_dict()
    yield
    pr.override(snap)
