"""Test config: run JAX on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware, and keep runs deterministic."""

import os

# Run all tests on a virtual 8-device CPU mesh. The environment's
# sitecustomize registers the tunneled-TPU backend and overwrites
# JAX_PLATFORMS at interpreter start, so the env var alone is not
# enough — override the jax config directly before any backend is
# initialized (eager test dispatch over the TPU tunnel would do a
# network round-trip per op).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
