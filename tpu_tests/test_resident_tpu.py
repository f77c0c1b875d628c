"""Paired residue word-pool reuse on the real chip: the roundtrip
stream's decode reads its word pool from the encoder's device-resident
compressed rows (decode._entropy_decode_fn_resident). tests/ covers
the all-CPU placement; this catches any cross-backend divergence in
the on-device byte->big-endian-word repack or base addressing."""

import numpy as np
import pytest

import jax

if jax.default_backend() == "cpu":
    pytest.skip("TPU-only tests (resident word pool)", allow_module_level=True)

import ako_tpu
from ako_tpu.core.settings import Settings
from ako_tpu.runtime.executor import roundtrip_iter


def _photo(rng, h, w, ch):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 120 + 60 * np.sin(x / 37.0) + 50 * np.cos(y / 23.0)
    img = np.stack(
        [np.clip(base * (0.6 + 0.15 * c), 0, 255) for c in range(ch)], axis=-1
    )
    img += rng.normal(0, 2.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_resident_roundtrip_tpu(rng):
    s = Settings(quantization=16, tiles_dimension=128)
    imgs = [_photo(rng, 256, 200, 4), _photo(rng, 256, 200, 4)]
    got = list(roundtrip_iter(iter(imgs), s))
    for img, (blob, pix) in zip(imgs, got):
        assert blob == ako_tpu.encode(img, s)
        assert np.array_equal(pix, ako_tpu.decode(blob)[0])


def test_resident_with_transport_tpu(rng, monkeypatch):
    monkeypatch.setenv("AKO_TPU_TRANSPORT", "1")
    s = Settings(quantization=16, tiles_dimension=128)
    img = _photo(rng, 256, 256, 4)
    ((blob, pix),) = list(roundtrip_iter([img], s))
    monkeypatch.delenv("AKO_TPU_TRANSPORT")
    assert blob == ako_tpu.encode(img, s)
    assert np.array_equal(pix, ako_tpu.decode(blob)[0])
