"""Event-callback granularity (reference contract: ako.h:75-84).

The fused device-entropy paths fire per tile-shape group (PARITY.md
divergence 10); the host-entropy and host-decode paths keep the
reference's per-tile granularity. Pairs must always balance (the
tools' accumulating stopwatches rely on it)."""

import numpy as np
import pytest

import ako_tpu
from ako_tpu.core import geometry
from ako_tpu.core.events import Event
from ako_tpu.core.settings import Settings


@pytest.fixture
def rng():
    return np.random.default_rng(0xE7E7)


def _img(rng, h, w, ch=3):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 120 + 60 * np.sin(x / 29.0) + 50 * np.cos(y / 17.0)
    img = np.stack([base * (0.6 + 0.1 * c) for c in range(ch)], axis=-1)
    return np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.uint8)


def _starts_balanced(seen):
    open_pairs = {}
    for tile, ev in seen:
        kind = ev.name.rsplit("_", 1)[0]
        if ev.name.endswith("_START"):
            assert (tile, kind) not in open_pairs
            open_pairs[(tile, kind)] = True
        else:
            assert open_pairs.pop((tile, kind), None)
    assert not open_pairs


class TestFusedEventGranularity:
    def test_encode_fused_per_shape_group(self, rng):
        # 90x70 at 64-px tiles: 4 tiles in 4 distinct shapes -> first
        # tile index of each shape group is each tile itself
        img = _img(rng, 90, 70)
        s = Settings(quantization=16, tiles_dimension=64)
        seen = []
        blob = ako_tpu.encode(
            img, s, events=lambda t, n, e, u: seen.append((t, e)),
            device_entropy=True,
        )
        assert blob == ako_tpu.encode(img, s, device_entropy=True)
        _starts_balanced(seen)
        groups = {t for t, _ in seen}
        assert groups == {0, 1, 2, 3}  # one group per distinct shape
        for g in groups:
            kinds = [e for t, e in seen if t == g]
            assert kinds.count(Event.FORMAT_START) == 1
            assert kinds.count(Event.WAVELET_START) == 1
            assert kinds.count(Event.COMPRESSION_START) == 1

    def test_decode_fused_per_shape_group(self, rng):
        img = _img(rng, 90, 70)
        s = Settings(quantization=16, tiles_dimension=64)
        blob = ako_tpu.encode(img, s, device_entropy=True)
        seen = []
        pix, _, _ = ako_tpu.decode(
            blob, events=lambda t, n, e, u: seen.append((t, e)),
            device_entropy=True,
        )
        assert np.array_equal(pix, ako_tpu.decode(blob, device_entropy=True)[0])
        _starts_balanced(seen)
        groups = {t for t, e in seen if e == Event.WAVELET_START}
        assert groups == {0, 1, 2, 3}
        # one image-wide COMPRESSION pair (block walk + sync scan) plus
        # one per group
        comp_starts = [t for t, e in seen if e == Event.COMPRESSION_START]
        assert sorted(comp_starts) == [0, 0, 1, 2, 3]

    def _tile_pairs(self, seen, n_tiles):
        _starts_balanced(seen)
        assert {t for t, _ in seen} == set(range(n_tiles))
        for t in range(n_tiles):
            kinds = [e for ti, e in seen if ti == t]
            assert kinds.count(Event.FORMAT_START) == 1
            assert kinds.count(Event.WAVELET_START) == 1
            assert kinds.count(Event.COMPRESSION_START) == 1

    def test_encode_tile_events_mode(self, rng, monkeypatch):
        """AKO_TPU_EVENTS=tile restores the reference's per-tile event
        pairs on the fused device path (one dispatch per tile), with
        the blob byte-identical to the batched path."""
        monkeypatch.setenv("AKO_TPU_EVENTS", "tile")
        img = _img(rng, 90, 70)
        s = Settings(quantization=16, tiles_dimension=64)
        seen = []
        blob = ako_tpu.encode(
            img, s, events=lambda t, n, e, u: seen.append((t, e)),
            device_entropy=True,
        )
        monkeypatch.delenv("AKO_TPU_EVENTS")
        assert blob == ako_tpu.encode(img, s, device_entropy=True)
        self._tile_pairs(seen, 4)

    def test_decode_tile_events_mode(self, rng, monkeypatch):
        img = _img(rng, 90, 70)
        s = Settings(quantization=16, tiles_dimension=64)
        blob = ako_tpu.encode(img, s, device_entropy=True)
        monkeypatch.setenv("AKO_TPU_EVENTS", "tile")
        seen = []
        pix, _, _ = ako_tpu.decode(
            blob, events=lambda t, n, e, u: seen.append((t, e)),
            device_entropy=True,
        )
        monkeypatch.delenv("AKO_TPU_EVENTS")
        np.testing.assert_array_equal(
            pix, ako_tpu.decode(blob, device_entropy=True)[0]
        )
        self._tile_pairs(seen, 4)

    def test_total_tiles_reported(self, rng):
        img = _img(rng, 90, 70)
        s = Settings(quantization=16, tiles_dimension=64)
        totals = set()
        ako_tpu.encode(
            img, s, events=lambda t, n, e, u: totals.add(n), device_entropy=True
        )
        assert totals == {geometry.image_tiles_no(70, 90, 64)}
