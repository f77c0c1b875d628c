"""ctypes bindings to the *reference* Ako library, used purely as a
test oracle. The reference sources at /root/reference are compiled
(out-of-tree, into .refbuild/) with default symbol visibility so the
internal stage functions are callable for fine-grained parity tests.
No reference code is vendored into this repo.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("AKO_REFERENCE", "/root/reference")
BUILD_DIR = os.path.join(REPO, ".refbuild")
LIB_PATH = os.path.join(BUILD_DIR, "libako_oracle.so")

_lib = None


class AkoSettingsC(ctypes.Structure):
    _fields_ = [
        ("wavelet", ctypes.c_int),
        ("color", ctypes.c_int),
        ("wrap", ctypes.c_int),
        ("compression", ctypes.c_int),
        ("tiles_dimension", ctypes.c_size_t),
        ("quantization", ctypes.c_int),
        ("gate", ctypes.c_int),
        ("chroma_loss", ctypes.c_int),
        ("discard_non_visible", ctypes.c_int),
    ]


def available() -> bool:
    return os.path.isdir(REF) and len(glob.glob(os.path.join(REF, "library", "*.c"))) > 0


def build() -> str:
    os.makedirs(BUILD_DIR, exist_ok=True)
    srcs = sorted(glob.glob(os.path.join(REF, "library", "*.c")))
    newest = max(os.path.getmtime(f) for f in srcs)
    if not os.path.exists(LIB_PATH) or os.path.getmtime(LIB_PATH) < newest:
        # pid-unique temp + atomic replace: concurrent pytest-xdist
        # workers may race to build
        tmp = f"{LIB_PATH}.{os.getpid()}.tmp"
        subprocess.run(
            ["gcc", "-O2", "-fPIC", "-shared", *srcs, "-lm", "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, LIB_PATH)
    return LIB_PATH


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.akoEncodeExt.restype = ctypes.c_size_t
        lib.akoDecodeExt.restype = ctypes.c_void_p
        lib.akoDefaultCallbacks.restype = ctypes.c_void_p * 5
        lib.akoTileDataSize.restype = ctypes.c_size_t
        lib.akoTileDimension.restype = ctypes.c_size_t
        lib.akoImageTilesNo.restype = ctypes.c_size_t
        lib.akoImageMaxTileDataSize.restype = ctypes.c_size_t
        lib.akoDividePlusOneRule.restype = ctypes.c_size_t
        lib.akoPlanesSpacing.restype = ctypes.c_size_t
        lib.akoQuantization.restype = ctypes.c_int16
        lib.akoGate.restype = ctypes.c_int16
        lib.akoKagariEncode.restype = ctypes.c_size_t
        lib.akoKagariDecode.restype = ctypes.c_size_t
        _lib = lib
    return _lib


def settings_c(s) -> AkoSettingsC:
    return AkoSettingsC(
        int(s.wavelet),
        int(s.color),
        int(s.wrap),
        int(s.compression),
        s.tiles_dimension,
        s.quantization,
        s.gate,
        s.chroma_loss,
        1 if s.discard_non_visible else 0,
    )


def ref_encode(image: np.ndarray, s) -> bytes | None:
    """akoEncodeExt on an interleaved uint8 (h, w, ch) image."""
    lib = load()
    h, w, ch = image.shape
    image = np.ascontiguousarray(image)
    out_ptr = ctypes.c_void_p()
    status = ctypes.c_int()
    cs = settings_c(s)
    n = lib.akoEncodeExt(
        None,
        ctypes.byref(cs),
        ctypes.c_size_t(ch),
        ctypes.c_size_t(w),
        ctypes.c_size_t(h),
        image.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(out_ptr),
        ctypes.byref(status),
    )
    if n == 0:
        return None
    blob = ctypes.string_at(out_ptr.value, n)
    lib.akoDefaultFree(out_ptr)
    return blob


def ref_decode(blob: bytes):
    """akoDecodeExt -> (image uint8 (h, w, ch), settings struct) or None."""
    lib = load()
    out_s = AkoSettingsC()
    out_ch = ctypes.c_size_t()
    out_w = ctypes.c_size_t()
    out_h = ctypes.c_size_t()
    status = ctypes.c_int()
    ptr = lib.akoDecodeExt(
        None,
        ctypes.c_size_t(len(blob)),
        blob,
        ctypes.byref(out_s),
        ctypes.byref(out_ch),
        ctypes.byref(out_w),
        ctypes.byref(out_h),
        ctypes.byref(status),
    )
    if not ptr:
        return None
    n = out_w.value * out_h.value * out_ch.value
    img = np.frombuffer(ctypes.string_at(ptr, n), dtype=np.uint8).reshape(
        out_h.value, out_w.value, out_ch.value
    )
    lib.akoDefaultFree(ctypes.c_void_p(ptr))
    return img.copy(), out_s


def ref_kagari_encode(values: np.ndarray, output_size: int) -> bytes | None:
    lib = load()
    values = np.ascontiguousarray(values, dtype=np.int16)
    out = np.zeros(max(output_size, 1), dtype=np.uint8)
    n = lib.akoKagariEncode(
        ctypes.c_size_t(values.nbytes),
        ctypes.c_size_t(output_size),
        values.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if n == 0:
        return None
    return out[:n].tobytes()


def ref_kagari_decode(count: int, blob: bytes, output_size: int):
    lib = load()
    src = np.frombuffer(blob, dtype=np.uint8)
    out = np.zeros(max(output_size, 2) // 2, dtype=np.int16)
    n = lib.akoKagariDecode(
        ctypes.c_size_t(count),
        ctypes.c_size_t(src.nbytes),
        ctypes.c_size_t(output_size),
        src.ctypes.data_as(ctypes.c_void_p) if src.size else None,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if n == 0:
        return None
    return out[:count].copy(), n


def ref_quantization(factor, mul, tw, th, cw, ch) -> int:
    return int(load().akoQuantization(factor, mul, tw, th, cw, ch))


def ref_gate(factor, mul, tw, th, cw, ch) -> int:
    return int(load().akoGate(factor, mul, tw, th, cw, ch))


def ref_tile_data_size(w, h) -> int:
    return int(load().akoTileDataSize(w, h))


def ref_lift(s, channels: int, tile_planes: np.ndarray, planes_spacing: int):
    """akoLift on planar int16 input laid out with planes_spacing gaps;
    returns the serialized coefficient bytes (workarea_b image)."""
    lib = load()
    ch, th, tw = tile_planes.shape
    assert ch == channels
    stride = tw * th + planes_spacing
    workarea = np.zeros(stride * channels + 8 * (tw + th), dtype=np.int16)
    for c in range(channels):
        workarea[c * stride : c * stride + tw * th] = tile_planes[c].reshape(-1)
    tds = ref_tile_data_size(tw, th)
    # slack: the first lift level recycles the output buffer as its
    # H-pass scratch (2*target_w x 2*target_h elements)
    out = np.zeros(tds * channels // 2 + 4 * (tw + th) + 64, dtype=np.int16)
    cs = settings_c(s)
    lib.akoLift(
        ctypes.c_size_t(1),
        ctypes.byref(cs),
        ctypes.c_size_t(channels),
        ctypes.c_size_t(tw),
        ctypes.c_size_t(th),
        ctypes.c_size_t(planes_spacing),
        workarea.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out[: tds * channels // 2].copy()


def ref_unlift(s, channels: int, tile_w: int, tile_h: int, coeffs: np.ndarray,
               planes_spacing: int):
    """akoUnlift on a serialized int16 stream; returns (ch, th, tw) planes."""
    lib = load()
    stride = tile_w * tile_h + planes_spacing
    inbuf = np.ascontiguousarray(coeffs, dtype=np.int16).copy()
    out = np.zeros(stride * channels + 8 * (tile_w + tile_h), dtype=np.int16)
    cs = settings_c(s)
    lib.akoUnlift(
        ctypes.byref(cs),
        ctypes.c_size_t(channels),
        ctypes.c_size_t(1),
        ctypes.c_size_t(tile_w),
        ctypes.c_size_t(tile_h),
        ctypes.c_size_t(planes_spacing),
        inbuf.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    planes = np.zeros((channels, tile_h, tile_w), dtype=np.int16)
    for c in range(channels):
        planes[c] = out[c * stride : c * stride + tile_w * tile_h].reshape(
            tile_h, tile_w
        )
    return planes
