"""TPU-gated tests: run manually on the real chip
(`python -m pytest tpu_tests/ -q`). Unlike tests/, this conftest does
NOT force the CPU backend; tests skip themselves when no TPU is up."""

import os

import numpy as np
import pytest

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
