"""Device-side (scan-based) Kagari encoder: byte parity with the
reference C coder across literal/RLE/flush regimes."""

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


def _bytes_to_words(payload: bytes, slack: int | None = None) -> np.ndarray:
    from ako_tpu.ops.kagari_device import DECODE_SLACK_WORDS

    if slack is None:
        slack = DECODE_SLACK_WORDS
    pad = (-len(payload)) % 4
    buf = payload + b"\x00" * (pad + 4 * slack)
    return np.frombuffer(buf, dtype=">u4").astype(np.uint32)


class TestDeviceDecode:
    """kagari_decode_device must be bit-exact with the native decoder
    for every stream the host sync scanner accepts (codes <= 31 bits)."""

    def _roundtrip(self, values: np.ndarray, block: int):
        import jax.numpy as jnp

        from ako_tpu.ops.kagari_device import kagari_decode_device
        from ako_tpu.runtime.kagari import kagari_decode, kagari_encode, kagari_sync

        values = np.asarray(values, np.int16)
        n = values.size
        cap = n * 2 + 64
        payload = kagari_encode(values, cap * 4)
        assert payload is not None
        ref = kagari_decode(n, payload, cap)
        assert ref is not None
        sync = kagari_sync(n, payload, cap, block)
        assert sync is not None
        bit_off, prev, consec, run, consumed, max_bits = sync
        assert consumed == ref[1]
        if max_bits > 31:
            return None  # host-fallback streams, not device-decodable
        from ako_tpu.ops.kagari_device import decode_span_words

        words = _bytes_to_words(payload)
        # both window widths: whole-stream (span=None) and the exact
        # per-block span the production decode path computes
        for span in (None, decode_span_words(bit_off, len(payload) * 8)):
            got = np.asarray(
                kagari_decode_device(
                    jnp.asarray(words),
                    jnp.asarray(bit_off),
                    jnp.asarray(prev),
                    jnp.asarray(consec),
                    jnp.asarray(run),
                    n,
                    block,
                    span,
                )
            )
            np.testing.assert_array_equal(got, ref[0])
        return got

    @pytest.mark.parametrize("block", [8, 128])
    def test_random_streams(self, rng, block):
        for _ in range(6):
            n = int(rng.integers(5, 3000))
            v = rng.integers(-300, 300, size=n).astype(np.int16)
            # inject runs of random lengths, crossing block boundaries
            pos = 0
            while pos < n:
                ln = int(rng.integers(1, 40))
                if rng.random() < 0.5:
                    v[pos : pos + ln] = v[pos]
                pos += ln
            self._roundtrip(v, block)

    @pytest.mark.parametrize("block", [8, 128])
    def test_edge_streams(self, rng, block):
        cases = [
            np.zeros(1000, np.int16),  # one giant run
            np.full(5, 7, np.int16),
            np.array([1], np.int16),
            np.array([3, 3], np.int16),
            np.array([3, 3, 3], np.int16),  # exact trigger, rle_len 0
            np.arange(-200, 200, dtype=np.int16),
            np.array([5, 5, 5, 5, 5, 1, 5, 5, 5], np.int16),
            np.tile(np.array([9, 9, 9, 2], np.int16), 100),
            np.array([32767] * 600 + [-32767] * 600, np.int16),
        ]
        for v in cases:
            self._roundtrip(v, block)

    def test_forced_flush_run(self):
        # run counter force-flush at 65534 (kagari.c:265-271)
        v = np.zeros(70000, np.int16)
        self._roundtrip(v, 128)

    def test_int16_min_quirk_streams(self):
        """zigzag(-32768)+1 wraps to a lone 0 bit that desyncs the
        gamma alignment. Safety property: streams whose misaligned
        codes stay <= 31 bits must decode bit-exactly on device
        (_roundtrip asserts it); streams with longer codes must be
        flagged via max_bits so the caller keeps them on the host."""
        self._roundtrip(np.array([-32768, 17, 17000, -9000] * 30, np.int16), 16)

    def test_oversized_code_is_flagged(self):
        """-32768 followed by a 31-bit literal merges into a 33-bit
        code. Every route is safe: the stream is either rejected by
        both host decoder and sync scanner (consistently), or flagged
        via max_bits > 31, or decodes bit-exactly on device."""
        from ako_tpu.runtime.kagari import kagari_decode, kagari_encode, kagari_sync

        v = np.array([-32768, 30000, -1, 2, -3] * 20, np.int16)
        cap = v.size * 2 + 64
        payload = kagari_encode(v, cap * 4)
        assert payload is not None
        sync = kagari_sync(v.size, payload, cap, 16)
        dec = kagari_decode(v.size, payload, cap)
        assert (sync is None) == (dec is None)
        if sync is not None:
            # accepted: either flagged off the device, or exact there
            # (_roundtrip asserts exactness when it runs)
            self._roundtrip(v, 16)

    def test_sync_failure_matches_decoder(self, rng):
        """Truncated streams: sync accepts iff the host decoder does."""
        from ako_tpu.runtime.kagari import kagari_decode, kagari_encode, kagari_sync

        v = rng.integers(-50, 50, size=500).astype(np.int16)
        cap = v.size * 2 + 64
        payload = kagari_encode(v, cap * 4)
        for cut in (0, 1, len(payload) // 2, len(payload) - 1):
            trunc = payload[:cut]
            dec = kagari_decode(v.size, trunc, cap)
            sync = kagari_sync(v.size, trunc, cap, 64)
            assert (dec is None) == (sync is None), f"cut={cut}"


class TestDeviceEntropyDecodePath:
    """decode(device_entropy=True): fused sync-scan + on-device gamma
    decode + unlift must be bit-exact with the host-entropy path."""

    @pytest.mark.parametrize(
        "q,tiles,ch",
        [(0, 0, 3), (16, 0, 4), (16, 32, 4), (64, 0, 1), (0, 16, 2)],
    )
    def test_matches_host_path(self, rng, q, tiles, ch):
        import ako_tpu

        img = (rng.integers(0, 256, size=(48, 56, ch)) // 3 * 3).astype(np.uint8)
        blob = ako_tpu.encode(img, ako_tpu.Settings(quantization=q, tiles_dimension=tiles))
        host = ako_tpu.decode(blob, device_entropy=False)[0]
        dev = ako_tpu.decode(blob, device_entropy=True)[0]
        np.testing.assert_array_equal(dev, host)

    def test_flat_image_long_runs(self):
        import ako_tpu

        img = np.full((64, 64, 3), 137, np.uint8)
        blob = ako_tpu.encode(img, ako_tpu.Settings(quantization=16))
        dev = ako_tpu.decode(blob, device_entropy=True)[0]
        host = ako_tpu.decode(blob, device_entropy=False)[0]
        np.testing.assert_array_equal(dev, host)

    def test_truncation_errors_match(self, rng):
        import ako_tpu
        from ako_tpu.core.settings import AkoError

        img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        blob = ako_tpu.encode(img, ako_tpu.Settings(quantization=16))
        for cut in (17, len(blob) // 2, len(blob) - 1):
            host_err = dev_err = None
            try:
                ako_tpu.decode(blob[:cut], device_entropy=False)
            except AkoError as e:
                host_err = e.status
            try:
                ako_tpu.decode(blob[:cut], device_entropy=True)
            except AkoError as e:
                dev_err = e.status
            assert host_err == dev_err, f"cut={cut}"


class TestRankDense:
    """The dense-inverse rank (histogram + one-hot matmul, the pack
    fast path) must equal searchsorted for step-<=1 word sequences."""

    def test_matches_searchsorted(self, rng):
        from ako_tpu.ops.kagari_device import _rank_dense

        for _ in range(8):
            n = int(rng.integers(5, 9000))
            q_n = int(rng.integers(2, 4000))
            # realistic gamma-code bit lengths incl. long zero-bit runs
            nb = rng.integers(0, 32, size=n)
            nb[rng.random(n) < 0.4] = 0
            offs = np.cumsum(nb) - nb
            word = (offs >> 5).astype(np.int32)
            q = np.arange(q_n, dtype=np.int32)
            ref = np.searchsorted(word, q, side="right")
            got = np.asarray(_rank_dense(jnp.asarray(word), q_n))
            np.testing.assert_array_equal(got, ref)

    def test_all_tokens_one_word(self):
        from ako_tpu.ops.kagari_device import _rank_dense

        word = np.zeros(700, np.int32)  # many span-0 chunks, same base
        got = np.asarray(_rank_dense(jnp.asarray(word), 16))
        ref = np.searchsorted(word, np.arange(16), side="right")
        np.testing.assert_array_equal(got, ref)


class TestMxuCumsum:
    """Exactness of the chunked triangular-matmul cumsums that replace
    jnp.cumsum inside pack_bits (big-stream hot path)."""

    def test_u32_wraparound_exact(self):
        from ako_tpu.ops.kagari_device import _CS_MXU_MIN, _cumsum_mxu_u32

        rng = np.random.default_rng(7)
        for n in (
            1,
            5,
            _CS_MXU_MIN - 1,
            _CS_MXU_MIN,
            _CS_MXU_MIN + 1,
            _CS_MXU_MIN + 255,
            20000,
        ):
            # full-range uint32: the cumsum wraps mod 2^32 many times
            x = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
            ref = np.cumsum(x, dtype=np.uint32)
            got = np.asarray(_cumsum_mxu_u32(jnp.asarray(x)))
            np.testing.assert_array_equal(got, ref)

    def test_small_exclusive_exact(self):
        from ako_tpu.ops.kagari_device import _CS_MXU_MIN, _excl_cumsum_mxu_small

        rng = np.random.default_rng(8)
        for n in (1, 3, _CS_MXU_MIN, _CS_MXU_MIN + 77, 30000):
            x = rng.integers(0, 32, size=n).astype(np.int32)  # gamma lengths
            ref = (np.cumsum(x) - x).astype(np.int32)
            got = np.asarray(_excl_cumsum_mxu_small(jnp.asarray(x)))
            np.testing.assert_array_equal(got, ref)


class TestRankDense2:
    def test_matches_searchsorted(self, rng=None):
        from ako_tpu.ops.kagari_device import _rank_dense2

        rng = np.random.default_rng(11)
        for _ in range(8):
            n = int(rng.integers(5, 9000))
            q_n = int(rng.integers(2, 4000))
            nb = rng.integers(0, 32, size=n)
            nb[rng.random(n) < 0.4] = 0
            offs = np.cumsum(nb) - nb
            word = (offs >> 5).astype(np.int32)
            q = np.arange(q_n, dtype=np.int32)
            ref = np.searchsorted(word, q, side="right")
            got = np.asarray(_rank_dense2(jnp.asarray(word), q_n))
            np.testing.assert_array_equal(got, ref)

    def test_all_tokens_one_word(self):
        from ako_tpu.ops.kagari_device import _rank_dense2

        word = np.zeros(700, np.int32)
        got = np.asarray(_rank_dense2(jnp.asarray(word), 16))
        ref = np.searchsorted(word, np.arange(16), side="right")
        np.testing.assert_array_equal(got, ref)


class TestPlaceWords:
    """The direct dense placement (_PACK_IMPL == 'place') must produce
    the same words as the rank+cumsum-sampling path for gamma-pack
    inputs (disjoint in-word bits)."""

    def _gamma_inputs(self, rng, n):
        from ako_tpu.ops.kagari_device import tokenize
        from ako_tpu.ops.kagari_device import _exclusive_cumsum

        values = rng.integers(-800, 800, size=n).astype(np.int16)
        values[rng.random(n) < 0.5] = 0  # runs
        vals, nbits = tokenize(jnp.asarray(values))
        offs = np.cumsum(np.asarray(nbits)) - np.asarray(nbits)
        return np.asarray(vals), np.asarray(nbits), offs

    def test_words_match_reference_assembly(self):
        from ako_tpu.ops.kagari_device import _place_words_u32

        rng = np.random.default_rng(12)
        for n in (7, 100, 1500, 5000):
            vals, nbits, offs = self._gamma_inputs(rng, n)
            word = (offs >> 5).astype(np.int32)
            shift = (offs & 31).astype(np.int64)
            # host-reference 64-bit window assembly
            total_bits = int(offs[-1] + nbits[-1])
            n_words = (total_bits + 31) // 32 + 2
            acc = np.zeros(n_words + 1, np.uint64)
            for i in range(2 * n):
                nb = int(nbits[i])
                if nb == 0:
                    continue
                v = np.uint64(vals[i])
                w, s = int(word[i]), int(shift[i])
                win = (v << np.uint64(64 - s - nb)) & np.uint64(0xFFFFFFFFFFFFFFFF)
                acc[w] |= win >> np.uint64(32)
                acc[w + 1] |= win & np.uint64(0xFFFFFFFF)
            ref = acc[:n_words].astype(np.uint32)
            # device formulation inputs (hi/lo halves per token)
            v32 = vals.astype(np.uint32)
            k1 = np.minimum(np.clip(32 - (offs & 31), 0, None), nbits).astype(np.int64)
            k2 = nbits - k1
            hi = np.where((nbits > 0) & (k1 > 0),
                          (v32 >> np.minimum(k2, 31).astype(np.uint32))
                          << np.clip(32 - (offs & 31) - k1, 0, 31).astype(np.uint32),
                          0).astype(np.uint32)
            lo_mask = np.where(k2 > 0, (np.uint32(1) << np.minimum(k2, 31).astype(np.uint32)) - 1, 0).astype(np.uint32)
            lo = np.where(k2 > 0, (v32 & lo_mask) << np.clip(32 - k2, 0, 31).astype(np.uint32), 0).astype(np.uint32)
            got = np.asarray(_place_words_u32(
                jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(word), n_words))
            np.testing.assert_array_equal(got, ref)

    def test_pack_impls_agree(self, monkeypatch):
        import ako_tpu.ops.kagari_device as kd

        rng = np.random.default_rng(13)
        for n in (5, 333, 4096):
            values = rng.integers(-500, 500, size=n).astype(np.int16)
            values[rng.random(n) < 0.5] = 0
            cap = 4 * n + 64
            by_a, tot_a = kd.kagari_encode_device(jnp.asarray(values), cap)
            monkeypatch.setattr(kd, "_PACK_IMPL", "rank")
            by_b, tot_b = kd.kagari_encode_device(jnp.asarray(values), cap)
            monkeypatch.setattr(kd, "_PACK_IMPL", "place")
            assert int(tot_a) == int(tot_b)
            np.testing.assert_array_equal(np.asarray(by_a), np.asarray(by_b))
