"""Build-and-load for the native runtime library.

Compiles ako_tpu/runtime/native/akort.c into _akort.so next to the
source on first import (cached by source mtime), then exposes a typed
ctypes handle. No pip/apt dependencies: plain cc + libm.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "akort.c")
_LIB = os.path.join(_HERE, "native", "_akort.so")

_lock = threading.Lock()
_lib = None


def _compile() -> None:
    cc = os.environ.get("CC", "cc")
    # pid-unique temp: concurrent processes (pytest-xdist workers) may
    # race to build; os.replace keeps the install atomic either way
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    # -O3 -march=native: measured 2026-08-20 on the bench coefficient
    # distribution, enc 12.1 -> 10.2 ms and dec 8.4 -> 7.5 ms per 1M
    # coeffs vs -O2, identical output bytes. The library always builds
    # on the machine it runs on (first-import compile), so native
    # codegen is safe; AKO_CC_FLAGS overrides, and unsupported flags
    # fall back to plain -O2.
    opt = os.environ.get("AKO_CC_FLAGS", "-O3 -march=native").split()
    base = ["-fPIC", "-shared", "-fvisibility=hidden", _SRC, "-lm", "-o", tmp]
    try:
        subprocess.run([cc, *opt, *base], check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run([cc, "-O2", *base], check=True, capture_output=True)
    os.replace(tmp, _LIB)


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (
            not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _compile()
        lib = ctypes.CDLL(_LIB)

        lib.akort_quantization.restype = ctypes.c_int32
        lib.akort_quantization.argtypes = [
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_uint64,
            ctypes.c_uint64,
        ]
        lib.akort_gate.restype = ctypes.c_int32
        lib.akort_gate.argtypes = lib.akort_quantization.argtypes

        lib.akort_kagari_encode.restype = ctypes.c_size_t
        lib.akort_kagari_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.akort_kagari_decode.restype = ctypes.c_size_t
        lib.akort_kagari_decode.argtypes = [
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.akort_kagari_sync.restype = ctypes.c_size_t
        lib.akort_kagari_sync.argtypes = [
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]

        lib.akort_tile_unlift.restype = ctypes.c_int32
        lib.akort_tile_unlift.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.akort_planes_to_u8.restype = None
        lib.akort_planes_to_u8.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]

        lib.akort_tile_lift.restype = ctypes.c_int32
        lib.akort_tile_lift.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.akort_manba_encode.restype = ctypes.c_size_t
        lib.akort_manba_encode.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.akort_manba_decode.restype = ctypes.c_size_t
        lib.akort_manba_decode.argtypes = [
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
        ]
        lib.akort_manba_sync.restype = ctypes.c_size_t
        lib.akort_manba_sync.argtypes = [
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.akort_u8_to_planes.restype = None
        lib.akort_u8_to_planes.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,
        ]
        lib.akort_tile_encode_block.restype = ctypes.c_size_t
        lib.akort_tile_encode_block.argtypes = [
            ctypes.c_void_p,  # tile u8
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,  # qs
            ctypes.c_void_p,  # gs
            ctypes.c_size_t,  # stream elems
            ctypes.c_void_p,  # out
            ctypes.c_size_t,  # out capacity
            ctypes.c_void_p,  # rc out
        ]
        lib.akort_tile_decode_block.restype = ctypes.c_int32
        lib.akort_tile_decode_block.argtypes = [
            ctypes.c_void_p,  # payload
            ctypes.c_size_t,
            ctypes.c_size_t,  # count
            ctypes.c_size_t,  # output capacity bytes
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_void_p,  # pixels out
        ]
        lib.akort_tile_encode_spans.restype = ctypes.c_int32
        lib.akort_tile_encode_spans.argtypes = [
            ctypes.c_void_p,  # image u8
            ctypes.c_int64,  # row stride bytes
            ctypes.c_int32,  # channels
            ctypes.c_int32,  # wavelet
            ctypes.c_int32,  # wrap
            ctypes.c_int32,  # color
            ctypes.c_int32,  # discard_nv
            ctypes.c_int32,  # n tiles
            ctypes.c_void_p,  # rects i32 (n, 4)
            ctypes.c_void_p,  # qg offsets i64 (n)
            ctypes.c_void_p,  # qs
            ctypes.c_void_p,  # gs
            ctypes.c_void_p,  # counts i64 (n)
            ctypes.c_void_p,  # caps i64 (n)
            ctypes.c_void_p,  # out
            ctypes.c_void_p,  # out offsets i64 (n)
            ctypes.c_void_p,  # sizes out i64 (n)
        ]
        lib.akort_tile_decode_spans.restype = ctypes.c_int32
        lib.akort_tile_decode_spans.argtypes = [
            ctypes.c_void_p,  # blob
            ctypes.c_void_p,  # payload offsets i64 (n)
            ctypes.c_void_p,  # payload sizes i64 (n)
            ctypes.c_void_p,  # counts i64 (n)
            ctypes.c_void_p,  # caps i64 (n)
            ctypes.c_int32,  # n tiles
            ctypes.c_void_p,  # rects i32 (n, 4)
            ctypes.c_int64,  # row stride bytes
            ctypes.c_int32,  # channels
            ctypes.c_int32,  # wavelet
            ctypes.c_int32,  # wrap
            ctypes.c_int32,  # color
            ctypes.c_void_p,  # image out
        ]
        _lib = lib
        return _lib
