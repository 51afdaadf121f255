"""Test configuration: force an 8-device virtual CPU mesh for JAX tests.

Multi-chip TPU hardware is not available in CI; sharding tests run against
virtual CPU devices (the standard JAX testing approach), and f64 must be
enabled for parity tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["DEFUSE_ASSUME_BACKEND"] = "cpu"  # skip device probe subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

# The hosting environment may preload jax with a TPU plugin before
# conftest runs (sitecustomize); env vars alone are then too late.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib
import subprocess

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_BIN = REPO / "ref_build" / "bin"
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def ref_binaries():
    """Build (once) and return the golden reference binaries directory.

    Skips golden tests when the reference tree is unavailable.
    """
    if not REFERENCE.exists():
        pytest.skip("reference tree not available")
    if not (REF_BIN / "clustermatepairs").exists():
        subprocess.run(["bash", str(REPO / "ref_build" / "build.sh")],
                       check=True, capture_output=True)
    return REF_BIN
