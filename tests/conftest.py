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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU in-process collectives hard-abort the process when a rendezvous
# participant is >40s late. On a 1-core CI host the 8 virtual devices time-
# share one core, so a busy suite can legitimately exceed that; raise the
# limits rather than let a slow machine look like a deadlock.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=600"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120")
os.environ["XLA_FLAGS"] = flags

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
