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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs[:8]
