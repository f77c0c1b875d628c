"""Host-side Kagari entropy codec API (native-backed).

Byte-level contract: library/kagari.c:228-366 plus the per-tile block
framing of library/compression.c:30-73 (4-byte little-endian
compressed-size head). The TPU pipeline produces/consumes the raw
int16 coefficient stream; these functions translate it to/from the
container's compressed blocks.
"""

from __future__ import annotations

import struct

import numpy as np

from ako_tpu.runtime.build import load

BLOCK_HEAD = struct.Struct("<I")


def kagari_encode(values: np.ndarray, output_capacity: int) -> bytes | None:
    """Encode an int16 array; None when the stream won't fit (the
    incompressible-tile failure mode, which the orchestrator surfaces
    as Status.ERROR exactly like the reference)."""
    lib = load()
    values = np.ascontiguousarray(values, dtype=np.int16)
    out = np.empty(max(output_capacity, 1), dtype=np.uint8)
    n = lib.akort_kagari_encode(
        values.ctypes.data,
        values.nbytes,
        out.ctypes.data,
        output_capacity,
    )
    if n == 0:
        return None
    return out[:n].tobytes()


def kagari_decode(
    count: int, blob: bytes | memoryview, output_capacity_bytes: int
) -> tuple[np.ndarray, int] | None:
    """Decode `count` int16 values; returns (values, consumed_bytes) or
    None on broken input. `output_capacity_bytes` mirrors the
    reference's slack-tolerant output bound (decode.c:150)."""
    lib = load()
    src = np.frombuffer(blob, dtype=np.uint8)
    cap = max(output_capacity_bytes, 2)
    out = np.zeros(cap // 2, dtype=np.int16)
    consumed = lib.akort_kagari_decode(
        count,
        src.ctypes.data if src.size else None,
        src.nbytes,
        out.ctypes.data,
        output_capacity_bytes,
    )
    if consumed == 0:
        return None
    return out[:count], consumed


def kagari_sync(
    count: int,
    blob: bytes | memoryview,
    output_capacity_bytes: int,
    block: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int] | None:
    """Scan a Kagari stream and return per-block sync records for the
    device-side parallel decoder (ops/kagari_device.py): one record per
    `block` output values, (bit_offsets u32, prev i16, consec u16,
    run_remaining u16, consumed_bytes, max_code_bits). None on broken
    input — the failure conditions mirror kagari_decode exactly.

    Streams where max_code_bits > 31 (possible only through the
    zigzag(-32768)+1 wrap quirk, which desynchronizes the gamma
    alignment) must be decoded on the host: the device program's
    64-bit window only covers codes up to 31 bits."""
    lib = load()
    src = np.frombuffer(blob, dtype=np.uint8)
    n_rec = (count + block - 1) // block
    bit_off = np.zeros(n_rec, dtype=np.uint32)
    prev = np.zeros(n_rec, dtype=np.int16)
    consec = np.zeros(n_rec, dtype=np.uint16)
    run = np.zeros(n_rec, dtype=np.uint16)
    max_bits = np.zeros(1, dtype=np.uint32)
    consumed = lib.akort_kagari_sync(
        count,
        src.ctypes.data if src.size else None,
        src.nbytes,
        output_capacity_bytes,
        block,
        bit_off.ctypes.data,
        prev.ctypes.data,
        consec.ctypes.data,
        run.ctypes.data,
        max_bits.ctypes.data,
    )
    if consumed == 0:
        return None
    return bit_off, prev, consec, run, consumed, int(max_bits[0])


def compress_block(values: np.ndarray, tile_data_size: int) -> bytes | None:
    """Kagari + 4-byte block head (compression.c:36-55). The output
    budget equals the uncompressed tile size — incompressible tiles
    fail, as in the reference."""
    payload = kagari_encode(values, tile_data_size - BLOCK_HEAD.size)
    if payload is None:
        return None
    return BLOCK_HEAD.pack(len(payload)) + payload


def decompress_block(
    blob: memoryview, tile_data_size: int, output_capacity_bytes: int
) -> tuple[np.ndarray, int] | None:
    """Inverse of compress_block (compression.c:58-73); returns
    (values, total_consumed_incl_head) or None on broken input."""
    if len(blob) < BLOCK_HEAD.size:
        return None
    (block_size,) = BLOCK_HEAD.unpack_from(blob)
    res = kagari_decode(
        tile_data_size // 2,
        blob[BLOCK_HEAD.size : BLOCK_HEAD.size + block_size],
        output_capacity_bytes,
    )
    if res is None:
        return None
    values, consumed = res
    if consumed != block_size:
        return None
    return values, block_size + BLOCK_HEAD.size
