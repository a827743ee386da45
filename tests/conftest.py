"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU is a single chip here; multi-chip sharding is validated on
``xla_force_host_platform_device_count=8`` CPU devices (same SPMD program XLA
would partition across real chips), mirroring the driver's ``dryrun_multichip``.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import time  # noqa: E402
from pathlib import Path  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs[:8]


def pytest_sessionfinish(session, exitstatus):
    """Record the last test-run status for the pre-commit gate
    (the reference's ``.pytest_status`` convention, tests/conftest.py:60-67)."""
    status = {"exit_status": int(exitstatus), "timestamp": time.time()}
    try:
        (Path(__file__).resolve().parents[1] / ".pytest_status").write_text(json.dumps(status))
    except OSError:
        pass
