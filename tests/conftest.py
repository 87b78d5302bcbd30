"""Test configuration: run everything on the CPU backend with 8 virtual
devices so kernel logic (interpret mode) and multi-chip sharding (mesh over
virtual devices) are testable without TPU hardware (SURVEY.md §4).

Must configure the platform before any JAX backend initialization. The
container's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel), so we
override via jax.config, which wins over the env var.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _check_cpu_devices():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8, jax.devices()
