"""Mosaic lowering + bit-exactness of the Pallas lift kernels on the
real TPU (the tests/ suite only ever exercises interpreter mode).

Covers VERDICT round-1 gap: a hardware-lowered kernel test that would
catch a Mosaic regression. Reference kernel semantics:
library/wavelet-cdf53.c:57-199, wavelet-dd137.c:57-702."""

import numpy as np
import pytest

import jax

if jax.default_backend() == "cpu":
    pytest.skip("TPU-only tests (Mosaic lowering)", allow_module_level=True)

import jax.numpy as jnp

from ako_tpu.core.settings import Wavelet, Wrap
from ako_tpu.ops.pallas_lift import lift2d_pallas, unlift2d_pallas
from ako_tpu.ops.wavelets import lift2d, unlift2d
from ako_tpu.core import geometry


WAVELETS = [Wavelet.DD137, Wavelet.CDF53, Wavelet.HAAR]
WRAPS = [Wrap.CLAMP, Wrap.MIRROR, Wrap.REPEAT, Wrap.ZERO]


@pytest.mark.parametrize("wavelet", WAVELETS)
@pytest.mark.parametrize("wrap", WRAPS)
def test_lift2d_lowers_and_matches_xla(rng, wavelet, wrap):
    x = rng.integers(-2000, 2000, size=(3, 128, 128)).astype(np.int16)
    level = geometry.lift_schedule(128, 128).levels[0]
    ref = jax.jit(lambda v: lift2d(wavelet, wrap, v, level))(jnp.asarray(x))
    got = jax.jit(lambda v: lift2d_pallas(wavelet, wrap, v))(jnp.asarray(x))
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


@pytest.mark.parametrize("wavelet", WAVELETS)
@pytest.mark.parametrize("wrap", WRAPS)
def test_unlift2d_lowers_and_matches_xla(rng, wavelet, wrap):
    th = tw = 64
    quads = [
        rng.integers(-2000, 2000, size=(2, th, tw)).astype(np.int16)
        for _ in range(4)
    ]
    level = geometry.lift_schedule(2 * th, 2 * tw).levels[0]
    ref = jax.jit(
        lambda a, b, c, d: unlift2d(wavelet, wrap, a, b, c, d, level)
    )(*map(jnp.asarray, quads))
    got = jax.jit(
        lambda a, b, c, d: unlift2d_pallas(wavelet, wrap, a, b, c, d)
    )(*map(jnp.asarray, quads))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
