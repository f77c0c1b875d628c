"""Randomized differential sweep vs the reference oracle.

The parametrized suites cover each axis (wavelet, wrap, color, q, gate,
tiles, channels, dims) largely independently; this sweep samples the
JOINT settings space with seeded random combinations and asserts the
full contract on each: blob byte-identical to the reference encoder,
decoded pixels bit-identical to the reference decoder, and both the
host-entropy and device-entropy paths agreeing. Interaction bugs
(e.g. a wrap mode x odd-dims x chroma_loss corner) surface here that
no per-axis grid would catch.
"""

from __future__ import annotations

import numpy as np
import pytest

import ako_tpu
from ako_tpu.core.settings import Color, Settings, Wavelet, Wrap
from tests import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="reference sources not available"
)

WAVELETS = [Wavelet.DD137, Wavelet.CDF53, Wavelet.HAAR]
COLORS = [Color.YCOCG, Color.SUBTRACT_G, Color.NONE]
WRAPS = list(Wrap)


def _random_case(rng: np.random.Generator):
    h = int(rng.integers(3, 80))
    w = int(rng.integers(3, 80))
    channels = int(rng.choice([1, 2, 3, 4]))
    kind = rng.integers(0, 3)
    if kind == 0:  # smooth gradient + noise (photo-like)
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        base = 120 + 60 * np.sin(x / 11.0) + 50 * np.cos(y / 7.0)
        img = np.clip(
            base[..., None] + rng.normal(0, 6, size=(h, w, channels)), 0, 255
        ).astype(np.uint8)
    elif kind == 1:  # flat patches (long RLE runs)
        img = np.repeat(
            np.repeat(
                rng.integers(0, 256, size=(max(1, h // 8), max(1, w // 8), channels)),
                8, axis=0,
            ),
            8, axis=1,
        )[:h, :w].astype(np.uint8)
    else:  # full-range noise
        img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    # tiles must be power-of-two >= 8 (or 0 = none); small tiles vs dims
    tiles = int(rng.choice([0, 0, 8, 16, 32]))
    s = Settings(
        quantization=int(rng.choice([0, 1, 5, 16, 64, 700])),
        gate=int(rng.choice([0, 0, 4, 24])),
        wavelet=WAVELETS[rng.integers(0, len(WAVELETS))],
        wrap=WRAPS[rng.integers(0, len(WRAPS))],
        color=COLORS[rng.integers(0, len(COLORS))],
        tiles_dimension=tiles,
        chroma_loss=int(rng.choice([0, 1, 3])),
        discard_non_visible=int(rng.choice([0, 0, 1])),
    )
    return img, s


@pytest.mark.parametrize("seed", range(24))
def test_random_settings_full_contract(seed):
    rng = np.random.default_rng(1000 + seed)
    img, s = _random_case(rng)

    ref_blob = oracle.ref_encode(img, s)
    try:
        ours = ako_tpu.encode(img, s, device_entropy=False)
    except ako_tpu.AkoError:
        # both sides must fail together (e.g. incompressible tiny tile)
        assert ref_blob is None, (seed, s)
        return
    if ref_blob is None:
        # The reference encoder fails on narrow tile-grid remainders
        # (border width 1-2 / height 2 — PARITY.md divergence 7) that
        # its own decoder handles. Require the strict-superset
        # property: our blob must be format-valid per the REFERENCE
        # decoder and produce the same pixels as our decoder.
        ref_dec = oracle.ref_decode(ours)
        assert ref_dec is not None, (seed, s)
        got = ako_tpu.decode(ours, device_entropy=False)[0]
        np.testing.assert_array_equal(
            np.asarray(ref_dec[0]).reshape(got.shape), got, err_msg=str((seed, s))
        )
        return
    assert ours == ref_blob, (seed, s)

    ours_dev = ako_tpu.encode(img, s, device_entropy=True)
    assert ours_dev == ref_blob, (seed, s)

    ref_img, _ref_channels = oracle.ref_decode(ref_blob)[:2]
    got = ako_tpu.decode(ours, device_entropy=False)[0]
    np.testing.assert_array_equal(got, np.asarray(ref_img).reshape(got.shape), err_msg=str((seed, s)))
    got_dev = ako_tpu.decode(ours, device_entropy=True)[0]
    np.testing.assert_array_equal(got_dev, got, err_msg=str((seed, s)))
