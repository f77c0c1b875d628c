"""Adversarial entropy shapes ON THE REAL CHIP: near-capacity tiles
(the encode._CAPACITY_MARGIN boundary), the 65534 RLE force-flush, and
oversized-code quirk streams — asserting bit/byte parity AND that the
fallback counters (utils/metrics.py) equal the expectations computed
on the host from the blob itself. The flush/trigger rules being
stressed: /root/reference/library/kagari.c:260-297; the device coder
pair: ops/kagari_device.py + the sync scan in runtime/kagari.py.

Run manually on the bench chip: python -m pytest tpu_tests/ -q
"""

import numpy as np
import pytest

import jax

if jax.default_backend() == "cpu":
    pytest.skip("TPU-only tests (entropy stress)", allow_module_level=True)

import ako_tpu
from ako_tpu.core import container, geometry
from ako_tpu.core.settings import Settings
from ako_tpu.encode import _CAPACITY_MARGIN, checked_settings, pack_budget
from ako_tpu.runtime.kagari import BLOCK_HEAD, kagari_sync
from ako_tpu.utils import metrics
from tests import oracle


def _expected_enc_fallbacks(ref_blob: bytes, quantization: int) -> tuple:
    """(n_fallback, n_device) the device packer MUST report for this
    blob, derived host-side from the reference payload sizes (device
    totals equal them byte-for-byte): a tile falls back iff its
    compressed size exceeds the pack budget or sits within
    _CAPACITY_MARGIN of capacity. `quantization` is the encoder-side
    setting (the container does not store q — it lives per-level in
    the lift heads)."""
    view = memoryview(ref_blob)
    ch, w, h, s2 = container.head_read(view)
    grid = geometry.tile_grid(w, h, s2.tiles_dimension)
    cursor = container.HEAD_SIZE
    n_fb = 0
    for t in grid:
        tds = geometry.tile_data_size(t.w, t.h) * ch
        capacity = tds - BLOCK_HEAD.size
        budget = pack_budget(capacity, quantization)
        (bs,) = BLOCK_HEAD.unpack_from(view, cursor)
        cursor += BLOCK_HEAD.size + bs
        if bs > budget or bs >= capacity - _CAPACITY_MARGIN:
            n_fb += 1
    return n_fb, len(grid) - n_fb


class TestNearCapacity:
    def test_mixed_capacity_tiles_counters_and_parity(self, rng):
        """Half the tiles are raw noise at q=1 (value-preserving
        quantization, but the q>0 pack budget of capacity/2 puts the
        noise tiles' ~0.8x-capacity compressed sizes past it ->
        host-coder fallback), half smooth (device path); blob
        byte-identical, counters exactly the host-computed
        expectation."""
        h = w = 64
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        smooth = np.clip(
            120 + 60 * np.sin(x / 9.0) + 50 * np.cos(y / 7.0), 0, 255
        ).astype(np.uint8)
        img[:, :32, :] = smooth[:, :32, None]  # left column of tiles
        s = Settings(quantization=1, tiles_dimension=32)
        ref_blob = oracle.ref_encode(img, checked_settings(s))
        assert ref_blob is not None
        exp_fb, exp_dev = _expected_enc_fallbacks(
            ref_blob, checked_settings(s).quantization
        )
        assert exp_fb >= 1, "construction must produce a near-capacity tile"
        assert exp_dev >= 1, "construction must keep a device tile"

        metrics.reset()
        blob = ako_tpu.encode(img, s)  # fused device-entropy TPU path
        c = metrics.counters()
        assert blob == ref_blob
        assert c.get(metrics.ENC_HOST_FALLBACK, 0) == exp_fb
        assert c.get(metrics.ENC_DEVICE, 0) == exp_dev

        # decode the same adversarial blob on chip: near-capacity
        # blocks are ordinary device decodes (no quirk codes here)
        metrics.reset()
        pix, _, _ = ako_tpu.decode(blob, device_entropy=True)
        c = metrics.counters()
        np.testing.assert_array_equal(pix, oracle.ref_decode(ref_blob)[0])
        assert c.get(metrics.DEC_DEVICE, 0) == exp_fb + exp_dev
        assert c.get(metrics.DEC_HOST_FALLBACK, 0) == 0


class TestForcedFlushRun:
    def test_rle_65534_force_flush_single_tile(self, rng):
        """A constant 256x256 RGBA image in ONE tile: the zero run in
        the serialized stream exceeds 65534, forcing the RLE counter
        flush (kagari.c:265-271) inside the device scan coder."""
        img = np.full((256, 256, 4), 137, np.uint8)
        s = Settings(quantization=16, tiles_dimension=0)
        ref_blob = oracle.ref_encode(img, checked_settings(s))
        metrics.reset()
        blob = ako_tpu.encode(img, s)
        assert blob == ref_blob
        c = metrics.counters()
        assert c.get(metrics.ENC_HOST_FALLBACK, 0) == 0

        pix, _, _ = ako_tpu.decode(blob, device_entropy=True)
        np.testing.assert_array_equal(pix, oracle.ref_decode(ref_blob)[0])


class TestOversizedCodeQuirk:
    def _quirk_blob(self):
        """Hand-framed two-tile container: tile 0 carries the
        zigzag(-32768) quirk (a lone 0 bit) merged with 31-bit
        literals — gamma codes past the 31-bit device window, so the
        sync scan must route it to the exact host decoder; tile 1 is
        a clean device stream."""
        s = checked_settings(Settings(quantization=16, tiles_dimension=32))
        head = container.head_write(1, 32, 64, s)
        count = geometry.tile_data_size(32, 32) // 2
        # seeded construction (a quirk stream can also be legitimately
        # rejected by decoder+scanner consistently — this seed yields
        # one that is FLAGGED (33-bit merged code) yet host-decodable)
        qrng = np.random.default_rng(2)
        vq = qrng.integers(-40, 40, size=count).astype(np.int16)
        idx = qrng.integers(0, count - 1, size=30)
        vq[idx] = -32768
        vq[idx + 1] = qrng.choice(
            np.array([30000, -30000, 25000], np.int16), size=30
        )
        vc = (np.arange(count) % 7 - 3).astype(np.int16)
        blocks = []
        for v in (vq, vc):
            payload = oracle.ref_kagari_encode(v, v.nbytes * 8 + 4096)
            assert payload is not None
            blocks.append(BLOCK_HEAD.pack(len(payload)) + payload)
        # confirm the construction: tile 0 oversized, tile 1 not
        tds = geometry.tile_data_size(32, 32)
        spacing = geometry.planes_spacing(32, 32)
        sq = kagari_sync(count, blocks[0][BLOCK_HEAD.size :], tds + spacing, 256)
        sc = kagari_sync(count, blocks[1][BLOCK_HEAD.size :], tds + spacing, 256)
        assert sq is not None and sq[5] > 31
        assert sc is not None and sc[5] <= 31
        return head + b"".join(blocks)

    def test_quirk_stream_host_fallback_counters(self):
        blob = self._quirk_blob()
        # exact reference-semantics decode: host entropy + device unlift
        ref_pix, _, _ = ako_tpu.decode(blob, device_entropy=False)
        metrics.reset()
        pix, _, _ = ako_tpu.decode(blob, device_entropy=True)
        c = metrics.counters()
        np.testing.assert_array_equal(pix, ref_pix)
        assert c.get(metrics.DEC_HOST_FALLBACK, 0) == 1  # the quirk tile
        assert c.get(metrics.DEC_DEVICE, 0) == 1  # the clean tile
