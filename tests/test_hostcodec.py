"""Native host decode path (runtime/hostcodec.py + akort.c unlift).

Three layers of exactness evidence:
- kernel parity: the native tile unlift + inverse color reproduce the
  Python/XLA ops bit-for-bit across wavelets x wraps x q x odd shapes
  (the Python ops are themselves oracle-tested in test_wavelets.py /
  test_colorspace.py);
- end-to-end parity: AKO_TPU_DECODE=host decodes reference-encoded
  blobs to the reference decoder's exact pixels (oracle);
- pipeline: PipelineDecoder/roundtrip_iter under host mode stay
  bit-exact and never touch the device dispatch path.
"""

from __future__ import annotations

import numpy as np
import pytest

import ako_tpu
from ako_tpu.core import geometry
from ako_tpu.core.settings import Color, Compression, Settings, Wavelet, Wrap
from ako_tpu.ops.colorspace import to_interleaved_u8, to_planar_yuv
from ako_tpu.ops.lifting import forward_tile, inverse_tile
from ako_tpu.ops.quantization import level_qg
from ako_tpu.runtime import hostcodec
from tests import oracle


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0DE)


def _roundtrip_case(rng, tw, th, wavelet, wrap, q, ch, color):
    import jax.numpy as jnp

    tile = rng.integers(0, 256, size=(th, tw, ch), dtype=np.uint8)
    sched = geometry.lift_schedule(tw, th)
    qg = level_qg(sched, ch, q, 0, 1)
    planes = to_planar_yuv(jnp.asarray(tile), color, False)
    stream = np.asarray(forward_tile(planes, sched, wavelet, wrap, qg))
    rec = inverse_tile(jnp.asarray(stream), sched, wavelet, wrap, ch)
    ref_planes = np.asarray(rec)
    ref_pix = np.asarray(to_interleaved_u8(rec, color, ch))
    got_planes = hostcodec.tile_unlift(stream, tw, th, ch, wavelet, wrap)
    got_pix = hostcodec.planes_to_u8(got_planes, color)
    assert np.array_equal(got_planes, ref_planes)
    assert np.array_equal(got_pix, ref_pix)


class TestNativeUnliftParity:
    @pytest.mark.parametrize("wavelet", [Wavelet.DD137, Wavelet.CDF53, Wavelet.HAAR])
    @pytest.mark.parametrize(
        "wrap", [Wrap.CLAMP, Wrap.MIRROR, Wrap.REPEAT, Wrap.ZERO]
    )
    def test_wavelet_wrap_matrix(self, rng, wavelet, wrap):
        # odd dims exercise the fake-column/row bookkeeping; 33x47 has
        # a deep ragged pyramid
        _roundtrip_case(rng, 33, 47, wavelet, wrap, 16, 4, Color.YCOCG_Q)

    @pytest.mark.parametrize(
        "tw,th",
        [(64, 64), (8, 8), (3, 5), (2, 7), (17, 9), (128, 96), (5, 128)],
    )
    def test_shape_sweep(self, rng, tw, th):
        _roundtrip_case(rng, tw, th, Wavelet.DD137, Wrap.CLAMP, 16, 4, Color.YCOCG_Q)

    @pytest.mark.parametrize(
        "q,ch,color",
        [
            (0, 4, Color.YCOCG),
            (0, 3, Color.SUBTRACT_G),
            (16, 3, Color.SUBTRACT_G),
            (0, 1, Color.NONE),
            (16, 2, Color.NONE),
            (32, 4, Color.YCOCG_Q),
        ],
    )
    def test_q_channels_colors(self, rng, q, ch, color):
        _roundtrip_case(rng, 40, 24, Wavelet.CDF53, Wrap.MIRROR, q, ch, color)

    def test_stream_size_mismatch_raises(self, rng):
        from ako_tpu.core.settings import AkoError

        stream = np.zeros(100, np.int16)
        with pytest.raises(AkoError):
            hostcodec.tile_unlift(stream, 16, 16, 4, Wavelet.DD137, Wrap.CLAMP)

    def test_wavelet_none_passthrough(self, rng):
        planes = rng.integers(-300, 300, size=(3, 9, 11)).astype(np.int16)
        got = hostcodec.tile_unlift(
            planes.reshape(-1), 11, 9, 3, Wavelet.NONE, Wrap.CLAMP
        )
        assert np.array_equal(got, planes)


def _photo(rng, h, w, ch=4):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 120 + 60 * np.sin(x / 29.0) + 50 * np.cos(y / 17.0)
    img = np.stack(
        [np.clip(base * (0.6 + 0.1 * c), 0, 255) for c in range(ch)], axis=-1
    )
    img += rng.normal(0, 3.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


class TestHostDecodeEndToEnd:
    @pytest.mark.parametrize(
        "kw",
        [
            dict(quantization=16, tiles_dimension=64),
            dict(quantization=0, tiles_dimension=0),
            dict(quantization=16, wavelet=Wavelet.CDF53, wrap=Wrap.MIRROR),
            dict(quantization=8, wavelet=Wavelet.HAAR, tiles_dimension=32),
            dict(quantization=16, compression=Compression.NONE),
            dict(quantization=0, wavelet=Wavelet.NONE, compression=Compression.NONE),
        ],
    )
    def test_reference_blob_exact(self, rng, monkeypatch, kw):
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        s = Settings(**kw)
        img = _photo(rng, 90, 70)
        from ako_tpu.encode import checked_settings

        blob = oracle.ref_encode(img, checked_settings(s))
        got, _s, _ch = ako_tpu.decode(blob)
        ref = oracle.ref_decode(blob)[0]
        assert np.array_equal(got, ref)

    def test_truncated_blob_raises(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        from ako_tpu.core.settings import AkoError
        from ako_tpu.encode import checked_settings

        s = Settings(quantization=16, tiles_dimension=64)
        img = _photo(rng, 90, 70)
        blob = oracle.ref_encode(img, checked_settings(s))
        with pytest.raises(AkoError):
            ako_tpu.decode(blob[: len(blob) // 2])

    def test_per_tile_events_fire(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        from ako_tpu.core.events import Event
        from ako_tpu.encode import checked_settings

        s = Settings(quantization=16, tiles_dimension=64)
        img = _photo(rng, 90, 70)
        blob = oracle.ref_encode(img, checked_settings(s))
        seen = []
        ako_tpu.decode(blob, events=lambda t, n, e, u: seen.append((t, e)))
        tiles = {t for t, _ in seen}
        n_tiles = geometry.image_tiles_no(70, 90, 64)
        assert tiles == set(range(n_tiles)) and n_tiles == 4
        for t in tiles:
            evs = [e for tt, e in seen if tt == t]
            assert evs == [
                Event.COMPRESSION_START,
                Event.COMPRESSION_END,
                Event.WAVELET_START,
                Event.WAVELET_END,
                Event.FORMAT_START,
                Event.FORMAT_END,
            ]


class TestHostDecodePipeline:
    def test_pipeline_decoder_host(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        from ako_tpu.runtime.executor import PipelineDecoder, PipelineEncoder

        s = Settings(quantization=16, tiles_dimension=64)
        imgs = [_photo(rng, 150, 130), _photo(rng, 96, 64)]
        blobs = PipelineEncoder(s).encode_batch(imgs)
        got = list(PipelineDecoder().decode_iter(blobs))
        monkeypatch.delenv("AKO_TPU_DECODE")
        for blob, pix in zip(blobs, got):
            assert np.array_equal(pix, ako_tpu.decode(blob)[0])

    def test_roundtrip_iter_host(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        from ako_tpu.runtime.executor import roundtrip_iter

        s = Settings(quantization=16, tiles_dimension=64)
        imgs = [_photo(rng, 150, 130)]
        ((blob, pix),) = list(roundtrip_iter(imgs, s))
        monkeypatch.delenv("AKO_TPU_DECODE")
        assert blob == ako_tpu.encode(img := imgs[0], s)
        assert np.array_equal(pix, ako_tpu.decode(blob)[0])

    def test_host_mode_never_dispatches_device(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        import importlib

        dec_mod = importlib.import_module("ako_tpu.decode")
        from ako_tpu.runtime.executor import PipelineDecoder, PipelineEncoder

        def boom(*a, **k):  # device dispatch must be unreachable
            raise AssertionError("device path entered under host decode")

        monkeypatch.setattr(dec_mod, "dispatch_tiles_device_entropy", boom)
        monkeypatch.setattr(dec_mod, "_run_tile_decoder", boom)
        s = Settings(quantization=16, tiles_dimension=64)
        img = _photo(rng, 96, 64)
        blobs = PipelineEncoder(s).encode_batch([img])
        (pix,) = list(PipelineDecoder().decode_iter(blobs))
        ref = oracle.ref_decode(blobs[0])[0]
        assert np.array_equal(pix, ref)


class TestHostEncodeEndToEnd:
    """AKO_TPU_ENCODE=host: the native format + lift + entropy produce
    the reference encoder's exact blob bytes with zero device traffic
    (the symmetric twin of TestHostDecodeEndToEnd)."""

    @pytest.mark.parametrize(
        "kw",
        [
            dict(quantization=16, tiles_dimension=64),
            dict(quantization=0, tiles_dimension=0),
            dict(quantization=16, wavelet=Wavelet.CDF53, wrap=Wrap.MIRROR),
            dict(quantization=8, wavelet=Wavelet.HAAR, tiles_dimension=32),
            dict(quantization=16, compression=Compression.NONE),
            dict(quantization=0, wavelet=Wavelet.NONE, compression=Compression.NONE),
            dict(quantization=16, gate=24, chroma_loss=3, tiles_dimension=64),
            dict(quantization=16, discard_non_visible=True, tiles_dimension=64),
        ],
    )
    def test_reference_blob_exact(self, rng, monkeypatch, kw):
        monkeypatch.setenv("AKO_TPU_ENCODE", "host")
        s = Settings(**kw)
        img = _photo(rng, 90, 70)
        from ako_tpu.encode import checked_settings

        blob = ako_tpu.encode(img, s)
        ref = oracle.ref_encode(img, checked_settings(s))
        assert blob == ref

    def test_per_tile_events_fire(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_ENCODE", "host")
        from ako_tpu.core.events import Event

        s = Settings(quantization=16, tiles_dimension=64)
        img = _photo(rng, 90, 70)
        seen = []
        ako_tpu.encode(img, s, events=lambda t, n, e, u: seen.append((t, e)))
        tiles = {t for t, _ in seen}
        n_tiles = geometry.image_tiles_no(70, 90, 64)
        assert tiles == set(range(n_tiles)) and n_tiles == 4
        for t in tiles:
            evs = [e for tt, e in seen if tt == t]
            assert evs == [
                Event.FORMAT_START,
                Event.FORMAT_END,
                Event.WAVELET_START,
                Event.WAVELET_END,
                Event.COMPRESSION_START,
                Event.COMPRESSION_END,
            ]


class TestHostEncodePipeline:
    def test_pipeline_encoder_host(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_ENCODE", "host")
        from ako_tpu.encode import checked_settings
        from ako_tpu.runtime.executor import PipelineEncoder

        # border tiles 8x22 (NOT 1-2 px wide: the reference encoder
        # fails on those — PARITY.md divergence 7 — and it is the
        # oracle here)
        s = Settings(quantization=16, tiles_dimension=64)
        imgs = [_photo(rng, 150, 136), _photo(rng, 96, 64), _photo(rng, 64, 64)]
        blobs = PipelineEncoder(s).encode_batch(imgs)
        for img, blob in zip(imgs, blobs):
            assert blob == oracle.ref_encode(img, checked_settings(s))

    def test_roundtrip_iter_full_host(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_ENCODE", "host")
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        from ako_tpu.encode import checked_settings
        from ako_tpu.runtime.executor import roundtrip_iter

        s = Settings(quantization=16, tiles_dimension=64)
        imgs = [_photo(rng, 150, 136), _photo(rng, 96, 64)]
        pairs = list(roundtrip_iter(imgs, s))
        for img, (blob, pix) in zip(imgs, pairs):
            assert blob == oracle.ref_encode(img, checked_settings(s))
            assert np.array_equal(pix, oracle.ref_decode(blob)[0])

    def test_host_mode_never_dispatches_device(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_ENCODE", "host")
        import importlib

        enc_mod = importlib.import_module("ako_tpu.encode")
        from ako_tpu.encode import checked_settings
        from ako_tpu.runtime.executor import PipelineEncoder

        def boom(*a, **k):  # device dispatch must be unreachable
            raise AssertionError("device path entered under host encode")

        monkeypatch.setattr(enc_mod, "dispatch_tiles_fused", boom)
        monkeypatch.setattr(enc_mod, "encode_tiles_device", boom)
        monkeypatch.setattr(enc_mod, "_tile_encoder", boom)
        s = Settings(quantization=16, tiles_dimension=64)
        img = _photo(rng, 96, 64)
        assert ako_tpu.encode(img, s) == oracle.ref_encode(
            img, checked_settings(s)
        )
        (blob,) = PipelineEncoder(s).encode_batch([img])
        assert blob == oracle.ref_encode(img, checked_settings(s))


class TestNativeForwardParity:
    """The native forward (format + lift) must reproduce the Python/
    XLA forward ops bit-for-bit — it packs the encode-side transport
    upload, whose device unpack runs the real entropy decoder + unlift
    on the resulting stream."""

    @pytest.mark.parametrize("wavelet", [Wavelet.DD137, Wavelet.CDF53, Wavelet.HAAR])
    @pytest.mark.parametrize("wrap", [Wrap.CLAMP, Wrap.MIRROR, Wrap.REPEAT, Wrap.ZERO])
    def test_forward_matrix(self, rng, wavelet, wrap):
        self._case(rng, 33, 47, wavelet, wrap, 16, 4, Color.YCOCG_Q)

    @pytest.mark.parametrize(
        "tw,th,q,ch,color",
        [
            (64, 64, 0, 4, Color.YCOCG),
            (8, 8, 16, 3, Color.SUBTRACT_G),
            (3, 5, 0, 1, Color.NONE),
            (17, 9, 32, 2, Color.NONE),
            (40, 24, 0, 3, Color.YCOCG),
            (5, 128, 16, 4, Color.YCOCG_Q),
        ],
    )
    def test_forward_shapes(self, rng, tw, th, q, ch, color):
        self._case(rng, tw, th, Wavelet.DD137, Wrap.CLAMP, q, ch, color)

    def test_discard_non_visible(self, rng):
        import jax.numpy as jnp

        tile = rng.integers(0, 256, size=(24, 40, 4), dtype=np.uint8)
        tile[::3, ::2, 3] = 0  # scattered invisible pixels
        ref = np.asarray(to_planar_yuv(jnp.asarray(tile), Color.YCOCG, True))
        got = hostcodec.u8_to_planes(tile, Color.YCOCG, True)
        assert np.array_equal(got, ref)

    def test_gate(self, rng):
        self._case(rng, 32, 32, Wavelet.CDF53, Wrap.CLAMP, 16, 3,
                   Color.YCOCG_Q, gate=24)

    def _case(self, rng, tw, th, wavelet, wrap, q, ch, color, gate=0):
        import jax.numpy as jnp

        tile = rng.integers(0, 256, size=(th, tw, ch), dtype=np.uint8)
        sched = geometry.lift_schedule(tw, th)
        qg = level_qg(sched, ch, q, gate, 1)
        ref_planes = np.asarray(to_planar_yuv(jnp.asarray(tile), color, False))
        ref_stream = np.asarray(
            forward_tile(jnp.asarray(ref_planes), sched, wavelet, wrap, qg)
        )
        got_planes = hostcodec.u8_to_planes(tile, color, False)
        assert np.array_equal(got_planes, ref_planes)
        got_stream = hostcodec.tile_lift(got_planes, wavelet, wrap, qg)
        assert np.array_equal(got_stream, ref_stream)


class TestHostSpanPipeline:
    """The batched native span paths (akort_tile_encode_spans /
    akort_tile_decode_spans): one Python<->C crossing per multi-tile
    task, C gathering rects from / placing pixels into the shared
    image buffer. Must stay byte/bit-identical to the per-tile calls
    (which are oracle-gated) across the settings matrix, and must
    reject corrupt payloads exactly like the per-tile path."""

    @pytest.mark.parametrize(
        "kw",
        [
            dict(quantization=16, tiles_dimension=64),
            dict(quantization=16, wavelet=Wavelet.CDF53, wrap=Wrap.MIRROR,
                 tiles_dimension=64),
            dict(quantization=8, wavelet=Wavelet.HAAR, tiles_dimension=32),
            dict(quantization=16, gate=24, chroma_loss=3, tiles_dimension=64),
            dict(quantization=16, discard_non_visible=True, tiles_dimension=64),
            dict(quantization=0, tiles_dimension=0),
        ],
    )
    def test_matrix_vs_oracle(self, rng, monkeypatch, kw):
        monkeypatch.setenv("AKO_TPU_ENCODE", "host")
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        from ako_tpu.encode import checked_settings
        from ako_tpu.runtime.executor import PipelineDecoder, PipelineEncoder

        s = Settings(**kw)
        # 150x136 makes 8x22 border tiles at t=64 (PARITY divergence 7
        # keeps them >2 px: the reference encoder is the oracle here)
        imgs = [_photo(rng, 150, 136), _photo(rng, 96, 64, ch=3),
                _photo(rng, 70, 90, ch=1)]
        blobs = PipelineEncoder(s).encode_batch(imgs)
        pix = list(PipelineDecoder().decode_iter(blobs))
        for img, blob, got in zip(imgs, blobs, pix):
            assert blob == oracle.ref_encode(img, checked_settings(s))
            assert np.array_equal(got, oracle.ref_decode(blob)[0])

    def test_compression_none_falls_back(self, rng, monkeypatch):
        monkeypatch.setenv("AKO_TPU_ENCODE", "host")
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        from ako_tpu.encode import checked_settings
        from ako_tpu.runtime.executor import PipelineDecoder, PipelineEncoder

        s = Settings(quantization=16, compression=Compression.NONE,
                     tiles_dimension=64)
        img = _photo(rng, 96, 70)
        (blob,) = PipelineEncoder(s).encode_batch([img])
        assert blob == oracle.ref_encode(img, checked_settings(s))
        (got,) = list(PipelineDecoder().decode_iter([blob]))
        assert np.array_equal(got, oracle.ref_decode(blob)[0])

    @pytest.mark.parametrize("mutate", ["flip", "truncate_payload", "zero_run"])
    def test_corrupt_blob_raises(self, rng, monkeypatch, mutate):
        monkeypatch.setenv("AKO_TPU_ENCODE", "host")
        monkeypatch.setenv("AKO_TPU_DECODE", "host")
        from ako_tpu.core.settings import AkoError
        from ako_tpu.runtime.executor import PipelineDecoder, PipelineEncoder

        s = Settings(quantization=16, tiles_dimension=64)
        img = _photo(rng, 96, 70)
        (blob,) = PipelineEncoder(s).encode_batch([img])
        b = bytearray(blob)
        if mutate == "flip":
            b[len(b) // 2] ^= 0xFF
        elif mutate == "truncate_payload":
            b = b[: len(b) - 7]
        else:
            from ako_tpu.core import container

            b[container.HEAD_SIZE + 4 : container.HEAD_SIZE + 12] = b"\x00" * 8
        got_err = None
        try:
            list(PipelineDecoder().decode_iter([bytes(b)]))
        except AkoError as e:
            got_err = e
        # the per-tile reference path must agree that it is broken;
        # some single-bit flips decode to different-but-valid streams,
        # in which case both paths must succeed identically
        ref_err = None
        ref_pix = None
        try:
            ref_pix = ako_tpu.decode(bytes(b))[0]
        except AkoError as e:
            ref_err = e
        assert (got_err is None) == (ref_err is None)
        if got_err is None:
            (span_pix,) = list(PipelineDecoder().decode_iter([bytes(b)]))
            assert np.array_equal(span_pix, ref_pix)


class TestSingleCallBlocks:
    """Direct coverage of the single-call per-tile entries
    (tile_encode_block / tile_decode_block): the executor now batches
    through the span entries, but these remain the per-tile API (and
    the C functions the spans are built from)."""

    def test_block_roundtrip_vs_library(self, rng):
        from ako_tpu.core import geometry as geo
        from ako_tpu.encode import _host_qg, checked_settings
        from ako_tpu.runtime.hostcodec import (
            tile_decode_block,
            tile_encode_block,
        )

        s = checked_settings(Settings(quantization=16))
        tile = _photo(rng, 48, 40)
        ch = tile.shape[2]
        qg = _host_qg(40, 48, ch, s.quantization, s.gate, s.chroma_loss)
        tds = geo.tile_data_size(40, 48) * ch
        payload = tile_encode_block(
            tile, s.wavelet, s.wrap, s.color, qg, tds - 4
        )
        assert payload is not None
        spacing = geo.planes_spacing(40, 48)
        pix = tile_decode_block(
            payload, tds // 2, tds + spacing, 40, 48, ch,
            s.wavelet, s.wrap, s.color,
        )
        assert pix is not None
        blob = ako_tpu.encode(tile, s)
        np.testing.assert_array_equal(pix, ako_tpu.decode(blob)[0])

    def test_block_rejects_corrupt_payload(self, rng):
        from ako_tpu.core import geometry as geo
        from ako_tpu.encode import _host_qg, checked_settings
        from ako_tpu.runtime.hostcodec import (
            tile_decode_block,
            tile_encode_block,
        )

        s = checked_settings(Settings(quantization=16))
        tile = _photo(rng, 32, 32)
        ch = tile.shape[2]
        qg = _host_qg(32, 32, ch, s.quantization, s.gate, s.chroma_loss)
        tds = geo.tile_data_size(32, 32) * ch
        payload = bytearray(
            tile_encode_block(tile, s.wavelet, s.wrap, s.color, qg, tds - 4)
        )
        payload = payload[: max(1, len(payload) - 5)]  # truncate
        spacing = geo.planes_spacing(32, 32)
        assert (
            tile_decode_block(
                bytes(payload), tds // 2, tds + spacing, 32, 32, ch,
                s.wavelet, s.wrap, s.color,
            )
            is None
        )
