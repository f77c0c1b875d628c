"""Device-side (scan-based) Kagari encoder: byte parity with the
reference C coder across literal/RLE/flush regimes.

(The device *decoder* and packer-internals suites live in
test_kagari_device_decode.py / test_kagari_device_pack.py so
pytest-xdist's per-file distribution balances the slowest programs.)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ako_tpu.ops.kagari_device import kagari_encode_device
from tests import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference sources not available"
)


def device_bytes(values: np.ndarray, capacity: int) -> bytes | None:
    fn = jax.jit(lambda v: kagari_encode_device(v, capacity))
    by, total = fn(jnp.asarray(values, dtype=jnp.int16))
    total = int(total)
    if total > capacity:
        return None
    return np.asarray(by)[:total].tobytes()


def assert_parity(values: np.ndarray):
    values = np.asarray(values, dtype=np.int16)
    capacity = max(values.nbytes * 4, 64)
    ref = oracle.ref_kagari_encode(values, capacity)
    ours = device_bytes(values, capacity)
    assert ref is not None
    assert ours == ref


class TestLiterals:
    def test_distinct_values(self, rng):
        assert_parity(np.arange(-100, 100, dtype=np.int16) * 3 + 1)

    def test_random(self, rng):
        assert_parity(rng.integers(-3000, 3000, size=1000).astype(np.int16))

    def test_extremes(self):
        assert_parity(np.array([0, 1, -1, 32767, -32767, 5], dtype=np.int16))

    def test_int16_min_wrap(self):
        # zigzag(-32768)+1 wraps to 0 through the uint16 truncation
        assert_parity(np.array([7, -32768, 7, 9], dtype=np.int16))

    def test_single(self):
        assert_parity(np.array([42], dtype=np.int16))


class TestRle:
    def test_short_runs(self):
        # runs of 1..5 equal values around distinct separators
        vals = []
        for k in range(1, 6):
            vals += [k] * k + [100 + k]
        assert_parity(np.array(vals, dtype=np.int16))

    def test_run_at_end(self):
        assert_parity(np.array([5] * 20, dtype=np.int16))
        assert_parity(np.array([1, 2, 3] + [9] * 50, dtype=np.int16))

    def test_run_of_three_exact_trigger(self):
        # exactly trigger+1 equal: literal x3 then run token of 0 extra
        assert_parity(np.array([4, 4, 4, 8], dtype=np.int16))

    def test_zero_runs(self, rng):
        # quantized coefficient statistics: mostly zeros
        v = rng.integers(-4, 5, size=5000)
        v[rng.random(5000) < 0.8] = 0
        assert_parity(v.astype(np.int16))

    def test_alternating(self):
        assert_parity(np.tile(np.array([3, -3], dtype=np.int16), 100))


class TestLongRuns:
    def test_flush_boundary(self):
        # run counter hits 65534: forced flush token, cycle restarts
        for extra in (0, 1, 2, 3, 5):
            n = 1 + 65534 + extra
            assert_parity(np.full(n, 7, dtype=np.int16))

    def test_two_flushes(self):
        n = 1 + 2 * 65534 + 10
        assert_parity(np.full(n, -2, dtype=np.int16))


class TestPipelineIntegration:
    def test_tile_stream_parity(self, rng):
        """Full tile coefficient stream through the device coder ==
        reference C coder."""
        from ako_tpu.core import geometry
        from ako_tpu.core.settings import Settings
        from ako_tpu.encode import checked_settings, encode_tiles_device

        img = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
        s = checked_settings(Settings(quantization=16))
        streams = encode_tiles_device(img, s)
        assert_parity(streams[0])


class TestSizeOnly:
    """kagari_size_device must return exactly len(reference payload)
    for any stream — it backs the rate-control probes, whose bisection
    path (and therefore the emitted blob) depends on exact sizes."""

    def test_matches_reference_sizes(self, rng):
        from ako_tpu.ops.kagari_device import kagari_size_device

        fn = jax.jit(kagari_size_device)
        streams = [
            rng.integers(-300, 300, size=257).astype(np.int16),
            np.zeros(1024, np.int16),
            np.repeat(rng.integers(-50, 50, size=64), 16).astype(np.int16),
            np.array([7], np.int16),
            np.array([-32768, 0, -32768, -32768, -32768, 5], np.int16),
        ]
        for v in streams:
            ref = oracle.ref_kagari_encode(v, max(v.nbytes * 8, 256))
            assert ref is not None
            assert int(fn(jnp.asarray(v))) == len(ref)

    def test_long_run_flush_sizes(self):
        from ako_tpu.ops.kagari_device import kagari_size_device

        v = np.full(70000, 3, np.int16)  # crosses the 65534 force-flush
        ref = oracle.ref_kagari_encode(v, v.nbytes * 4)
        assert int(jax.jit(kagari_size_device)(jnp.asarray(v))) == len(ref)


class TestRankChunked:
    """The chunk-base rank (kept as an alternative to the sort-based
    rank; see CLAUDE.md perf notes) must equal searchsorted exactly."""

    def test_matches_searchsorted(self, rng):
        from ako_tpu.ops.kagari_device import _rank_chunked

        for _ in range(8):
            n = int(rng.integers(5, 9000))
            q_n = int(rng.integers(2, 4000))
            nb = rng.integers(0, 12, size=n)
            offs = np.cumsum(nb) - nb
            word = (offs >> 5).astype(np.int32)
            q = np.arange(q_n, dtype=np.int32)
            ref = np.searchsorted(word, q, side="right")
            got = np.asarray(_rank_chunked(jnp.asarray(word), jnp.asarray(q)))
            np.testing.assert_array_equal(got, ref)
