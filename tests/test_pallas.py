"""Pallas lifting kernels: bit-identical to the XLA path (run in
interpreter mode on the CPU test mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ako_tpu.core import geometry
from ako_tpu.core.settings import Settings, Wavelet, Wrap
from ako_tpu.ops.lifting import forward_tile, inverse_tile
from ako_tpu.ops.pallas_lift import lift2d_pallas, unlift2d_pallas
from ako_tpu.ops.quantization import level_qg
from ako_tpu.ops.wavelets import lift2d


class TestLift2dPallas:
    @pytest.mark.parametrize("wavelet", [Wavelet.DD137, Wavelet.CDF53, Wavelet.HAAR])
    @pytest.mark.parametrize("wrap", [Wrap.CLAMP, Wrap.MIRROR])
    def test_matches_xla(self, rng, wavelet, wrap):
        x = rng.integers(-512, 512, size=(2, 3, 32, 32)).astype(np.int16)
        lvl = geometry.lift_schedule(32, 32).levels[0]
        ref = lift2d(wavelet, wrap, jnp.asarray(x), lvl)
        got = lift2d_pallas(wavelet, wrap, jnp.asarray(x))
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    def test_unlift_roundtrip(self, rng):
        x = rng.integers(-255, 256, size=(1, 2, 16, 16)).astype(np.int16)
        ll, b, c, d = lift2d_pallas(Wavelet.CDF53, Wrap.CLAMP, jnp.asarray(x))
        back = unlift2d_pallas(Wavelet.CDF53, Wrap.CLAMP, ll, b, c, d)
        np.testing.assert_array_equal(np.asarray(back), x)


class TestFullPipePallas:
    @pytest.mark.parametrize("q", [0, 16])
    def test_forward_tile_parity(self, rng, q):
        """Power-of-two tile: every level runs through the kernels."""
        planes = rng.integers(-512, 512, size=(3, 64, 64)).astype(np.int16)
        sched = geometry.lift_schedule(64, 64)
        s = Settings(quantization=q)
        qg = level_qg(sched, 3, q, 0, 1)
        a = forward_tile(jnp.asarray(planes), sched, s.wavelet, s.wrap, qg,
                         use_pallas=False)
        b = forward_tile(jnp.asarray(planes), sched, s.wavelet, s.wrap, qg,
                         use_pallas=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_inverse_tile_parity(self, rng):
        planes = rng.integers(-512, 512, size=(2, 64, 64)).astype(np.int16)
        sched = geometry.lift_schedule(64, 64)
        s = Settings(quantization=16)
        qg = level_qg(sched, 2, 16, 0, 1)
        coeffs = forward_tile(jnp.asarray(planes), sched, s.wavelet, s.wrap, qg)
        a = inverse_tile(coeffs, sched, s.wavelet, s.wrap, 2, use_pallas=False)
        b = inverse_tile(coeffs, sched, s.wavelet, s.wrap, 2, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_odd_dims_fall_back(self, rng):
        # odd levels use the XLA path transparently; stream unchanged
        planes = rng.integers(-512, 512, size=(1, 33, 48)).astype(np.int16)
        sched = geometry.lift_schedule(48, 33)
        s = Settings(quantization=16)
        qg = level_qg(sched, 1, 16, 0, 1)
        a = forward_tile(jnp.asarray(planes), sched, s.wavelet, s.wrap, qg,
                         use_pallas=False)
        b = forward_tile(jnp.asarray(planes), sched, s.wavelet, s.wrap, qg,
                         use_pallas=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
