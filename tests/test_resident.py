"""Paired round-trip word-pool reuse (encode residue -> decode):
roundtrip_iter's decoder reads its bulk word pool from the encoder's
still-device-resident compressed rows instead of re-uploading them
(decode._entropy_decode_fn_resident). Pixels and blobs must stay
bit-identical to the unpaired paths; a wrong pairing must fall back,
never corrupt. No reference counterpart (the reference is single
address space and never re-reads its own output); exactness is vs our
raw device-entropy path, which is oracle-tested elsewhere."""

import numpy as np
import pytest

import importlib

import ako_tpu

dec_mod = importlib.import_module("ako_tpu.decode")
from ako_tpu.core.settings import Settings
from ako_tpu.runtime.executor import (
    PipelineDecoder,
    PipelineEncoder,
    roundtrip_iter,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0xA1C0)


def _photo(rng, h, w, ch=4):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 120 + 60 * np.sin(x / 29.0) + 50 * np.cos(y / 17.0)
    img = np.stack(
        [np.clip(base * (0.6 + 0.1 * c), 0, 255) for c in range(ch)], axis=-1
    )
    img += rng.normal(0, 3.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _count_resident(monkeypatch):
    """Count calls into the resident pack (the resident branch's only
    entry); returns a mutable [count]."""
    calls = [0]
    orig = dec_mod._pack_entropy_upload_resident

    def counted(*a, **k):
        calls[0] += 1
        return orig(*a, **k)

    monkeypatch.setattr(dec_mod, "_pack_entropy_upload_resident", counted)
    return calls


class TestResidentRoundtrip:
    def test_paired_decode_bit_exact(self, rng, monkeypatch):
        calls = _count_resident(monkeypatch)
        s = Settings(quantization=16, tiles_dimension=64)
        # ragged grid: several tile shapes, several residue groups
        imgs = [_photo(rng, 150, 130), _photo(rng, 150, 130)]
        got = list(
            roundtrip_iter(iter(imgs), s, device_entropy=True)
        )
        assert calls[0] > 0, "resident branch never taken"
        for img, (blob, pix) in zip(imgs, got):
            assert blob == ako_tpu.encode(img, s, device_entropy=True)
            ref = ako_tpu.decode(blob, device_entropy=True)[0]
            assert np.array_equal(pix, ref)

    def test_encoder_fallback_tiles_upload(self, rng, monkeypatch):
        # full-range noise tile at q=16 exceeds the device pack budget
        # (capacity/2) and takes the host-coder fallback; its payload
        # must ride the uploaded tail pool while the smooth tile stays
        # resident — mixed bases in one shape group
        calls = _count_resident(monkeypatch)
        img = _photo(rng, 64, 128)
        img[:, 64:, :] = rng.integers(0, 256, size=(64, 64, 4), dtype=np.uint8)
        s = Settings(quantization=16, tiles_dimension=64)

        from ako_tpu.encode import dispatch_tiles_fused

        grid, channels, dispatched = dispatch_tiles_fused(img, s)
        totals, fallback, _g, _r = dispatched[0][3].result()
        if not fallback:
            pytest.skip("noise tile unexpectedly fit the device budget")

        got = list(roundtrip_iter([img], s, device_entropy=True))
        assert calls[0] > 0
        blob, pix = got[0]
        assert blob == ako_tpu.encode(img, s, device_entropy=True)
        assert np.array_equal(pix, ako_tpu.decode(blob, device_entropy=True)[0])

    def test_mismatched_residue_falls_back(self, rng, monkeypatch):
        # decode blob B with blob A's residue: the payload-CRC check
        # (decode._resident_rows) must disable reuse — even if the two
        # blobs' per-tile sizes happened to coincide — and still decode
        # exactly. Asserting the resident branch was never entered
        # pins the fallback directly, not just its end result.
        calls = _count_resident(monkeypatch)
        s = Settings(quantization=16, tiles_dimension=64)
        img_a, img_b = _photo(rng, 64, 64), _photo(rng, 64, 64)
        enc = PipelineEncoder(s, device_entropy=True)
        (blob_a, res_a), (blob_b, _res_b) = list(
            enc.encode_iter([img_a, img_b], keep_residue=True)
        )
        assert blob_a != blob_b
        dec = PipelineDecoder()
        (pix,) = list(
            dec.decode_iter(iter([(blob_b, res_a)]), paired=True, device_entropy=True)
        )
        assert calls[0] == 0, "mispaired residue must not be reused"
        assert np.array_equal(pix, ako_tpu.decode(blob_b, device_entropy=True)[0])

    def test_mismatched_residue_same_sizes_falls_back(self, rng, monkeypatch):
        # coinciding per-tile payload sizes, different bytes: only the
        # CRC check can catch this pairing. Construct it by encoding
        # the SAME image twice (identical sizes and bytes), then
        # corrupting the copy's recorded CRCs to simulate a stale
        # residue whose sizes still line up.
        calls = _count_resident(monkeypatch)
        s = Settings(quantization=16, tiles_dimension=64)
        img = _photo(rng, 64, 64)
        enc = PipelineEncoder(s, device_entropy=True)
        ((blob, res),) = list(enc.encode_iter([img], keep_residue=True))
        assert res and res[0]["crc"] and any(c is not None for c in res[0]["crc"])
        res[0]["crc"] = [None if c is None else c ^ 1 for c in res[0]["crc"]]
        dec = PipelineDecoder()
        (pix,) = list(
            dec.decode_iter(iter([(blob, res)]), paired=True, device_entropy=True)
        )
        assert calls[0] == 0, "size-coinciding mispair must not be reused"
        assert np.array_equal(pix, ako_tpu.decode(blob, device_entropy=True)[0])

    def test_resident_disabled_env(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_RESIDENT", "0")
        calls = _count_resident(monkeypatch)
        s = Settings(quantization=16, tiles_dimension=64)
        img = _photo(rng, 64, 64)
        ((blob, pix),) = list(roundtrip_iter([img], s, device_entropy=True))
        assert calls[0] == 0
        assert blob == ako_tpu.encode(img, s, device_entropy=True)
        assert np.array_equal(pix, ako_tpu.decode(blob, device_entropy=True)[0])

    def test_transport_composes_with_resident(self, rng, monkeypatch):
        # resident word pool + transported pixel download in one stream
        monkeypatch.setenv("AKO_TPU_TRANSPORT", "1")
        calls = _count_resident(monkeypatch)
        s = Settings(quantization=16, tiles_dimension=64)
        img = _photo(rng, 96, 64)
        ((blob, pix),) = list(roundtrip_iter([img], s, device_entropy=True))
        assert calls[0] > 0
        monkeypatch.delenv("AKO_TPU_TRANSPORT")
        assert blob == ako_tpu.encode(img, s, device_entropy=True)
        assert np.array_equal(pix, ako_tpu.decode(blob, device_entropy=True)[0])
