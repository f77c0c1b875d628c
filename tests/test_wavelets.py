"""Stage-level parity: lift/unlift pipelines vs the reference's
akoLift/akoUnlift, plus pure round-trip properties of the 1-D kernels
(the rebuild's analog of tests/{cdf53,dd137}-test.c, extended to also
cover Haar — a gap in the reference's own suite)."""

import numpy as np
import pytest
import jax.numpy as jnp

from ako_tpu.core import geometry
from ako_tpu.core.settings import Settings, Wavelet, Wrap, Color
from ako_tpu.ops.lifting import forward_tile, inverse_tile
from ako_tpu.ops.quantization import level_qg
from ako_tpu.ops.wavelets import lift1d, unlift1d_pair, _interleave
from tests import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference sources not available"
)


def _planes(rng, ch, h, w, lo=-512, hi=512):
    return rng.integers(lo, hi, size=(ch, h, w)).astype(np.int16)


def run_forward(planes, s, qg=None):
    ch, th, tw = planes.shape
    schedule = geometry.lift_schedule(tw, th)
    if qg is None:
        qg = level_qg(schedule, ch, s.quantization, s.gate, s.chroma_loss)
    out = forward_tile(jnp.asarray(planes), schedule, s.wavelet, s.wrap, qg)
    return np.asarray(out)


def run_inverse(coeffs, s, ch, tw, th):
    schedule = geometry.lift_schedule(tw, th)
    out = inverse_tile(jnp.asarray(coeffs), schedule, s.wavelet, s.wrap, ch)
    return np.asarray(out)


class TestLiftParity:
    @pytest.mark.parametrize("wavelet", [Wavelet.DD137, Wavelet.CDF53, Wavelet.HAAR])
    @pytest.mark.parametrize("wh", [(32, 32), (17, 23), (8, 8), (64, 24)])
    def test_lift_vs_reference(self, rng, wavelet, wh):
        w, h = wh
        s = Settings(wavelet=wavelet, quantization=16)
        planes = _planes(rng, 3, h, w)
        spacing = geometry.planes_spacing(w, h)
        ref = oracle.ref_lift(s, 3, planes, spacing)
        ours = run_forward(planes, s)
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("wrap", list(Wrap))
    def test_wrap_parity(self, rng, wrap):
        s = Settings(wavelet=Wavelet.DD137, wrap=wrap, quantization=0, gate=0)
        planes = _planes(rng, 1, 24, 24)
        spacing = geometry.planes_spacing(24, 24)
        ref = oracle.ref_lift(s, 1, planes, spacing)
        ours = run_forward(planes, s)
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("wavelet", [Wavelet.DD137, Wavelet.CDF53, Wavelet.HAAR])
    def test_unlift_vs_reference(self, rng, wavelet):
        w = h = 32
        s = Settings(wavelet=wavelet, quantization=16)
        planes = _planes(rng, 3, h, w)
        spacing = geometry.planes_spacing(w, h)
        coeffs = oracle.ref_lift(s, 3, planes, spacing)
        ref = oracle.ref_unlift(s, 3, w, h, coeffs, spacing)
        ours = run_inverse(coeffs, s, 3, w, h)
        np.testing.assert_array_equal(ours, ref)


class TestLosslessRoundTrip:
    """q=0, gate=0 must reconstruct exactly (integer lifting is
    perfectly invertible)."""

    @pytest.mark.parametrize("wavelet", [Wavelet.DD137, Wavelet.CDF53, Wavelet.HAAR])
    @pytest.mark.parametrize("wh", [(16, 16), (15, 9), (33, 7)])
    def test_roundtrip(self, rng, wavelet, wh):
        w, h = wh
        s = Settings(wavelet=wavelet, quantization=0, gate=0)
        planes = _planes(rng, 2, h, w, lo=-255, hi=256)
        coeffs = run_forward(planes, s)
        back = run_inverse(coeffs, s, 2, w, h)
        np.testing.assert_array_equal(back, planes)


class TestKernels1D:
    """1-D lift/unlift round-trip over the length sweep of the
    reference's own kernel tests (tests/cdf53-test.c:236-275), for all
    wrap modes, batched as rows of a 2-D array."""

    LENGTHS = [22, 16, 10, 9, 8, 7, 6, 5, 4, 3, 13, 17, 150, 300, 512]

    @pytest.mark.parametrize("wrap", list(Wrap))
    @pytest.mark.parametrize("wavelet", [Wavelet.CDF53, Wavelet.HAAR])
    def test_h_roundtrip(self, rng, wrap, wavelet):
        for n in self.LENGTHS:
            x = rng.integers(-2000, 2000, size=(4, n)).astype(np.int16)
            fake = n % 2
            lp, hp = lift1d(wavelet, wrap, jnp.asarray(x), fake, axis=-1)
            ev, od = unlift1d_pair(wavelet, wrap, lp, hp, axis=-1)
            if fake:
                od = od[:, :-1]
            back = np.asarray(_interleave(ev, od, axis=-1))
            np.testing.assert_array_equal(back, x, err_msg=f"len={n}")

    @pytest.mark.parametrize("wrap", list(Wrap))
    def test_dd137_roundtrip(self, rng, wrap):
        for n in [x for x in self.LENGTHS if x >= 16]:
            x = rng.integers(-2000, 2000, size=(4, n)).astype(np.int16)
            fake = n % 2
            lp, hp = lift1d(Wavelet.DD137, wrap, jnp.asarray(x), fake, axis=-1)
            ev, od = unlift1d_pair(Wavelet.DD137, wrap, lp, hp, axis=-1)
            if fake:
                od = od[:, :-1]
            back = np.asarray(_interleave(ev, od, axis=-1))
            np.testing.assert_array_equal(back, x, err_msg=f"len={n}")

    @pytest.mark.parametrize("wavelet", [Wavelet.CDF53, Wavelet.DD137])
    def test_v_axis_roundtrip(self, rng, wavelet):
        # vertical (axis=-2) with narrow width catches stride bugs
        # (the reference uses sentinel columns, tests/cdf53-test.c:155)
        x = rng.integers(-2000, 2000, size=(16, 3)).astype(np.int16)
        lp, hp = lift1d(wavelet, Wrap.CLAMP, jnp.asarray(x), 0, axis=-2)
        ev, od = unlift1d_pair(wavelet, Wrap.CLAMP, lp, hp, axis=-2)
        back = np.asarray(_interleave(ev, od, axis=-2))
        np.testing.assert_array_equal(back, x)
