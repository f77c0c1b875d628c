"""Device rANS (MANBAVARAN extension) on the real chip: the
block-parallel scan decoder (ops/manba_device.py) must lower through
Mosaic/XLA-TPU and stay bit-exact with the native host coder."""

import numpy as np
import pytest

import jax

if jax.default_backend() == "cpu":
    pytest.skip("TPU-only tests (device rANS)", allow_module_level=True)

import ako_tpu
from ako_tpu.core.settings import Compression, Settings


def _photo(rng, h, w, ch):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 120 + 60 * np.sin(x / 19.0) + 50 * np.cos(y / 13.0)
    img = np.stack(
        [np.clip(base * (0.6 + 0.15 * c), 0, 255) for c in range(ch)], axis=-1
    )
    img += rng.normal(0, 2.0, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_device_rans_decode_tpu(rng, monkeypatch):
    monkeypatch.setenv("AKO_TPU_MANBAVARAN", "1")
    img = _photo(rng, 96, 64, 4)
    s = Settings(quantization=16, tiles_dimension=32,
                 compression=Compression.MANBAVARAN)
    blob = ako_tpu.encode(img, s, device_entropy=False)  # host rANS encode
    expect = ako_tpu.decode(blob, device_entropy=False)[0]  # host rANS decode
    got = ako_tpu.decode(blob, device_entropy=True)[0]  # device rANS decode
    assert np.array_equal(got, expect)


def test_kernel_parity_tpu(rng):
    import jax.numpy as jnp

    from ako_tpu.ops.manba_device import (
        DECODE_BLOCK,
        DECODE_SLACK_WORDS,
        manba_decode_device,
        span_words,
    )
    from ako_tpu.runtime.kagari import manba_encode, manba_sync

    vals = (rng.normal(0, 2.2, size=21846) ** 3 / 8).astype(np.int16)
    p = manba_encode(vals, vals.nbytes * 3)
    sy = manba_sync(len(vals), p, DECODE_BLOCK)
    x, rbyte, ebit, freq, _ro, rans_end, extras_off, _c = sy
    w = (len(p) + 3) // 4 + DECODE_SLACK_WORDS
    pool8 = np.zeros(w * 4, np.uint8)
    pool8[: len(p)] = np.frombuffer(p, np.uint8)
    words = jnp.asarray(pool8.view(">u4").astype(np.uint32))
    out = np.asarray(
        manba_decode_device(
            words,
            jnp.asarray(x),
            jnp.asarray(rbyte),
            jnp.asarray(ebit),
            jnp.asarray(freq.astype(np.int32)),
            rans_end,
            extras_off,
            len(vals),
            DECODE_BLOCK,
            min(span_words(rbyte, rans_end, bits=False), w),
            min(
                span_words(
                    ebit.astype(np.int64) + extras_off * 8, len(p) * 8, bits=True
                ),
                w,
            ),
        )
    )
    assert np.array_equal(out, vals)


def test_device_rans_encode_tpu(rng):
    """The device rANS ENCODER lowers on the chip and stays
    byte-identical to the native host coder (VERDICT r4 item 4:
    TPU-native both directions)."""
    import time

    import jax.numpy as jnp

    from ako_tpu.ops.manba_device import manba_encode_device
    from ako_tpu.runtime.kagari import manba_assemble, manba_encode

    vals = (rng.normal(0, 2.5, size=(8, 32768)) ** 3 / 8).astype(np.int16)
    cap = vals.shape[1] * 2 + 64
    fn = jax.jit(jax.vmap(lambda v: manba_encode_device(v, cap)))
    parts = fn(jnp.asarray(vals))
    host_parts = [np.asarray(p) for p in parts]
    for i in range(vals.shape[0]):
        got = manba_assemble(
            host_parts[0][i], host_parts[1][i], host_parts[2][i],
            host_parts[3][i], host_parts[4][i], host_parts[5][i],
            host_parts[6][i], cap,
        )
        ref = manba_encode(vals[i], cap)
        assert ref is not None and got == ref
    # measured pack time (8 streams of 32k values, forced fetch)
    t0 = time.perf_counter()
    np.asarray(fn(jnp.asarray(vals))[3])
    dt = time.perf_counter() - t0
    print(f"device manba encode: {1e3 * dt:.1f} ms for 8x32768 values")
