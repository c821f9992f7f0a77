"""Test harness: run everything on a faked 8-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware
(XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import os

# Force CPU even when the session env points at TPU (JAX_PLATFORMS=axon):
# the suite must exercise multi-device sharding, which needs the faked
# 8-device CPU platform. The axon plugin overrides the JAX_PLATFORMS env
# var, so use jax.config (which wins) plus XLA_FLAGS before backend init.
# Set DSJAX_TEST_TPU=1 to run on real hardware instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("DSJAX_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
