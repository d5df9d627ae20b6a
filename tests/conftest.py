"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated the way SURVEY §4/§7 directs —
``xla_force_host_platform_device_count`` CPU devices — so the suite runs
anywhere.  Must set env vars before JAX initializes its backends.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (remote TPU tunnel),
# which would turn every test op into a network round-trip.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session's sitecustomize imports jax before conftest runs, capturing
# JAX_PLATFORMS=axon from the env; override through the live config too.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
