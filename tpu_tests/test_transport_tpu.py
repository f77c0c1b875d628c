"""Transport compression on the real chip: both directions must be
byte/bit-neutral when the pack/unpack spans the host<->TPU boundary
(the tests/ suite only exercises the all-CPU placement).

Exactness contract: runtime/transport.py — the q0 round-trip is the
codec's own lossless guarantee; these tests catch any cross-backend
divergence between the host CPU programs and the TPU programs."""

import numpy as np
import pytest

import jax

if jax.default_backend() == "cpu":
    pytest.skip("TPU-only tests (cross-backend transport)", allow_module_level=True)

import ako_tpu
from ako_tpu.core.settings import Settings


def _photo(rng, h, w, ch):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 120 + 60 * np.sin(x / 37.0) + 50 * np.cos(y / 23.0)
    img = np.stack(
        [np.clip(base * (0.6 + 0.15 * c), 0, 255) for c in range(ch)], axis=-1
    )
    img += rng.normal(0, 2.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_roundtrip_both_directions_tpu(rng, monkeypatch):
    img = _photo(rng, 256, 256, 4)
    s = Settings(quantization=16, tiles_dimension=128)
    blob_ref = ako_tpu.encode(img, s)
    pix_ref = ako_tpu.decode(blob_ref)[0]
    monkeypatch.setenv("AKO_TPU_TRANSPORT", "1")
    blob = ako_tpu.encode(img, s)
    assert blob == blob_ref
    pix = ako_tpu.decode(blob)[0]
    assert np.array_equal(pix, pix_ref)
