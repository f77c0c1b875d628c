"""Color transform parity vs the reference's format stage
(library/format.c:64-311), via akoFormatToPlanarI16Yuv /
akoFormatToInterleavedU8Rgb called directly."""

import ctypes

import numpy as np
import pytest
import jax.numpy as jnp

from ako_tpu.core.settings import Color
from ako_tpu.ops.colorspace import to_planar_yuv, to_interleaved_u8
from tests import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference sources not available"
)


def ref_to_planar(image: np.ndarray, color: Color, discard: bool):
    lib = oracle.load()
    h, w, ch = image.shape
    image = np.ascontiguousarray(image)
    out = np.zeros(ch * h * w, dtype=np.int16)
    lib.akoFormatToPlanarI16Yuv(
        ctypes.c_int(1 if discard else 0),
        ctypes.c_int(int(color)),
        ctypes.c_size_t(ch),
        ctypes.c_size_t(w),
        ctypes.c_size_t(h),
        ctypes.c_size_t(w),  # input stride
        ctypes.c_size_t(0),  # out planes_spacing
        image.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out.reshape(ch, h, w)


def ref_to_interleaved(planes: np.ndarray, color: Color):
    lib = oracle.load()
    ch, h, w = planes.shape
    planes = np.ascontiguousarray(planes).copy()  # the C function destroys 'in'
    out = np.zeros(h * w * ch, dtype=np.uint8)
    lib.akoFormatToInterleavedU8Rgb(
        ctypes.c_int(int(color)),
        ctypes.c_size_t(ch),
        ctypes.c_size_t(w),
        ctypes.c_size_t(h),
        ctypes.c_size_t(0),
        ctypes.c_size_t(w),
        planes.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out.reshape(h, w, ch)


ALL_COLORS = [Color.YCOCG, Color.YCOCG_Q, Color.SUBTRACT_G, Color.NONE]


class TestForward:
    @pytest.mark.parametrize("color", ALL_COLORS)
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_parity(self, rng, color, ch):
        img = rng.integers(0, 256, size=(8, 8, ch), dtype=np.uint8)
        ref = ref_to_planar(img, color, False)
        ours = np.asarray(to_planar_yuv(jnp.asarray(img), color, False))
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("ch", [2, 4])
    def test_discard_non_visible(self, rng, ch):
        img = rng.integers(0, 256, size=(8, 8, ch), dtype=np.uint8)
        img[:4, :, -1] = 0
        ref = ref_to_planar(img, Color.YCOCG, True)
        ours = np.asarray(to_planar_yuv(jnp.asarray(img), Color.YCOCG, True))
        np.testing.assert_array_equal(ours, ref)


class TestInverse:
    @pytest.mark.parametrize("color", ALL_COLORS)
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_parity(self, rng, color, ch):
        # Wide range: the inverse must saturate and wrap exactly like C
        planes = rng.integers(-1024, 1024, size=(ch, 8, 8)).astype(np.int16)
        ref = ref_to_interleaved(planes, color)
        ours = np.asarray(to_interleaved_u8(jnp.asarray(planes), color, ch))
        np.testing.assert_array_equal(ours, ref)

    @pytest.mark.parametrize("color", ALL_COLORS)
    def test_roundtrip_u8(self, rng, color):
        img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        planes = to_planar_yuv(jnp.asarray(img), color, False)
        back = np.asarray(to_interleaved_u8(planes, color, 3))
        np.testing.assert_array_equal(back, img)
