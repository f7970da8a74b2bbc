"""Build the native/ C++ runtime on demand — the ONE copy of the
cmake+ninja invocation shared by the test suite and the evaluation
tools (tests/conftest.py, tests/test_native.py, bench_native.py)."""
import os
import subprocess

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
NATIVE_DIR = os.path.join(REPO, "native")
BUILD_DIR = os.path.join(NATIVE_DIR, "build")


def ensure_native_build(*artifacts: str) -> str:
    """Configure + build native/build when any named artifact is missing.

    `artifacts` are paths relative to native/build (default: libtsc.so).
    Returns the build directory.  Raises OSError/CalledProcessError on a
    failed build — callers decide whether that's a skip or a hard fail.
    """
    needed = artifacts or ("libtsc.so",)
    if all(os.path.exists(os.path.join(BUILD_DIR, a)) for a in needed):
        return BUILD_DIR
    subprocess.run(
        ["cmake", "-B", "build", "-G", "Ninja", "."],
        cwd=NATIVE_DIR, check=True, capture_output=True,
    )
    subprocess.run(
        ["ninja", "-C", "build"],
        cwd=NATIVE_DIR, check=True, capture_output=True,
    )
    return BUILD_DIR
