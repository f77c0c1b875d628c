"""Research prototypes: scalar golden model vs production kernels, and
the rANS coder's round-trip property (the rebuild's analog of the
reference's resources/research tests)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ako_tpu.core.settings import Wavelet, Wrap
from ako_tpu.ops import wavelets as prod
from ako_tpu.research import rans, scalar_model


class TestScalarModelVsProduction:
    @pytest.mark.parametrize("wavelet", [Wavelet.CDF53, Wavelet.DD137, Wavelet.HAAR])
    @pytest.mark.parametrize("wrap", list(Wrap))
    @pytest.mark.parametrize("n", [8, 16, 24, 64])
    def test_forward_agree(self, rng, wavelet, wrap, n):
        x = rng.integers(-2000, 2000, size=n).astype(np.int16)
        lp_s, hp_s = scalar_model.lift1d(wavelet, wrap, x)
        lp_p, hp_p = prod.lift1d(wavelet, wrap, jnp.asarray(x[None]), 0, axis=-1)
        np.testing.assert_array_equal(np.asarray(lp_p)[0], lp_s)
        np.testing.assert_array_equal(np.asarray(hp_p)[0], hp_s)

    @pytest.mark.parametrize("wavelet", [Wavelet.CDF53, Wavelet.DD137])
    def test_scalar_roundtrip(self, rng, wavelet):
        x = rng.integers(-255, 256, size=32).astype(np.int16)
        lp, hp = scalar_model.lift1d(wavelet, Wrap.CLAMP, x)
        back = scalar_model.unlift1d(wavelet, Wrap.CLAMP, lp, hp)
        np.testing.assert_array_equal(back, x)


class TestRans:
    def test_roundtrip_random(self, rng):
        data = rng.integers(0, 256, size=4096).astype(np.uint8)
        freq, cum = rans.build_model(data)
        blob = rans.encode(data, freq, cum)
        out = rans.decode(blob, len(data), freq, cum)
        np.testing.assert_array_equal(out, data)

    def test_roundtrip_skewed(self, rng):
        # zero-heavy, like quantized coefficients
        data = rng.integers(0, 8, size=8192)
        data[rng.random(8192) < 0.8] = 0
        data = data.astype(np.uint8)
        freq, cum = rans.build_model(data)
        blob = rans.encode(data, freq, cum)
        out = rans.decode(blob, len(data), freq, cum)
        np.testing.assert_array_equal(out, data)
        # skewed data must actually compress
        assert len(blob) < len(data) // 2

    def test_single_symbol(self):
        data = np.full(1000, 7, np.uint8)
        freq, cum = rans.build_model(data)
        blob = rans.encode(data, freq, cum)
        out = rans.decode(blob, 1000, freq, cum)
        np.testing.assert_array_equal(out, data)
        assert len(blob) < 40
