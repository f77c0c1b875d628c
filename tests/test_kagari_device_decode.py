"""Device-side (block-parallel) Kagari decoder: bit-exact with the
native host decoder for every stream the sync scanner accepts, and the
fused decode(device_entropy=True) path vs the host-entropy path.

(Split from test_kagari_device.py so pytest-xdist's per-file
distribution balances the suite's slowest programs over workers.)
"""

import numpy as np
import pytest
import jax.numpy as jnp


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
