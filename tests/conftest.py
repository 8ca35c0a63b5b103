"""Test harness: run everything on a virtual 8-device CPU mesh.

The container pins JAX_PLATFORMS=axon (one real TPU chip via a tunnel) and
axon's sitecustomize overrides the env var at import, so we must force the
CPU platform through jax.config *after* import.  XLA_FLAGS must carry the
virtual device count before the CPU backend initializes (SURVEY.md §4
distributed test strategy).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
