"""Kagari entropy coder: byte-parity vs reference + self roundtrip."""

import numpy as np
import pytest

from ako_tpu.runtime.kagari import kagari_decode, kagari_encode

from . import oracle

needs_oracle = pytest.mark.skipif(not oracle.available(), reason="reference not mounted")


def _cases(rng):
    yield np.array([0], dtype=np.int16)
    yield np.array([1, -1, 2, -2, 32767, -32767], dtype=np.int16)
    yield np.zeros(10, dtype=np.int16)
    yield np.zeros(100000, dtype=np.int16)  # long run -> RLE overflow path
    yield np.full(70000, -5, dtype=np.int16)
    yield np.arange(-300, 300, dtype=np.int16)
    yield rng.integers(-4, 5, 5000).astype(np.int16)  # gappy, runs
    yield rng.integers(-32768, 32768, 4096).astype(np.int16)  # incl. -32768 quirk
    v = np.zeros(3000, dtype=np.int16)
    v[::7] = rng.integers(-100, 100, v[::7].shape)
    yield v
    # runs of exactly 2 and exactly 3 (RLE trigger edge)
    yield np.array([5, 5, 7, 7, 7, 9, 9, 9, 9, 1], dtype=np.int16)


@needs_oracle
def test_encode_byte_parity(rng):
    for values in _cases(rng):
        cap = values.nbytes * 4 + 64
        ours = kagari_encode(values, cap)
        ref = oracle.ref_kagari_encode(values, cap)
        assert ours == ref, f"mismatch for case len={len(values)}"


@needs_oracle
def test_encode_failure_parity(rng):
    """Out-of-space behavior must match (incompressible-tile error)."""
    values = rng.integers(-32768, 32768, 2048).astype(np.int16)
    for cap in [0, 1, 2, 3, 10, 100, values.nbytes // 2, values.nbytes, values.nbytes * 8]:
        ours = kagari_encode(values, cap)
        ref = oracle.ref_kagari_encode(values, cap)
        assert (ours is None) == (ref is None), f"cap={cap}"
        assert ours == ref


def test_roundtrip(rng):
    for values in _cases(rng):
        cap = values.nbytes * 4 + 64
        blob = kagari_encode(values, cap)
        assert blob is not None
        res = kagari_decode(len(values), blob, values.nbytes + 64)
        assert res is not None
        decoded, consumed = res
        assert consumed == len(blob)
        # -32768 encodes as a corrupt gamma code (the reference's
        # uint16 truncation quirk) so roundtrip only holds without it
        if not np.any(values == -32768):
            np.testing.assert_array_equal(decoded, values)


@needs_oracle
def test_decode_parity_on_garbage(rng):
    """Decoder behavior on malformed bytes matches the reference."""
    for n in [1, 2, 7, 33, 100]:
        blob = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        for count in [1, 5, 50]:
            cap = 4096
            ours = kagari_decode(count, blob, cap)
            ref = oracle.ref_kagari_decode(count, blob, cap)
            assert (ours is None) == (ref is None)
            if ours is not None:
                np.testing.assert_array_equal(ours[0], ref[0])
                assert ours[1] == ref[1]


@needs_oracle
def test_encode_capacity_boundary_sweep(rng):
    """Byte + failure parity at capacities AROUND each stream's exact
    encoded size: the native encoder's bulk-drain fast path proves
    itself only with >= 2 spare bytes and re-runs the reference-exact
    sink otherwise (akort.c kagari_encode_fast), so the boundary
    capacities are where a fast/exact disagreement would surface."""
    streams = [
        rng.integers(-4, 5, 3000).astype(np.int16),
        rng.integers(-32768, 32768, 1024).astype(np.int16),
        np.zeros(5000, dtype=np.int16),
        np.repeat(rng.integers(-9, 9, 60).astype(np.int16), 3),
    ]
    for values in streams:
        full = kagari_encode(values, values.nbytes * 4 + 64)
        assert full is not None
        n = len(full)
        for cap in range(max(1, n - 3), n + 4):
            ours = kagari_encode(values, cap)
            ref = oracle.ref_kagari_encode(values, cap)
            assert (ours is None) == (ref is None), (len(values), n, cap)
            assert ours == ref, (len(values), n, cap)
