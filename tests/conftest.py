"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md section 4 test plan).
Must run before the first ``import jax``.
"""
import os

# Force CPU: never run unit tests over the TPU tunnel.  The environment's
# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon, so
# the env var alone is too late — update the live jax config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Pose algebra correctness tests use float64 oracles; enabling x64 makes jnp
# honor input dtypes (the pipeline itself still runs float32/bfloat16).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
