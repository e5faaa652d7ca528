"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run against this mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8, JAX_PLATFORMS=cpu),
mirroring how the driver validates dryrun_multichip.
"""
import os

# Force CPU: the image pins JAX_PLATFORMS=axon (real TPU tunnel) and the axon
# bootstrap overrides the env var via jax.config, so tests must override the
# config value itself after import to run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def np_rng():
    return np.random.default_rng(0)
