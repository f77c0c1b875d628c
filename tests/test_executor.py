"""Streaming pipeline executor: outputs identical to one-shot
encode/decode, in order, with overlap enabled."""

import numpy as np

import ako_tpu
from ako_tpu import Settings
from ako_tpu.runtime.executor import PipelineDecoder, PipelineEncoder


def test_pipeline_encoder_matches_encode(rng):
    images = [
        rng.integers(0, 256, size=(40, 32, 3), dtype=np.uint8) for _ in range(4)
    ]
    s = Settings(quantization=16, tiles_dimension=16)
    enc = PipelineEncoder(s, workers=3)
    blobs = enc.encode_batch(images)
    for img, blob in zip(images, blobs):
        assert blob == ako_tpu.encode(img, s)


def test_pipeline_decoder_matches_decode(rng):
    images = [
        rng.integers(0, 256, size=(40, 32, 3), dtype=np.uint8) for _ in range(3)
    ]
    s = Settings(quantization=16, tiles_dimension=16)
    blobs = [ako_tpu.encode(img, s) for img in images]
    dec = PipelineDecoder(workers=3)
    outs = list(dec.decode_iter(blobs))
    for blob, out in zip(blobs, outs):
        ref, _, _ = ako_tpu.decode(blob)
        np.testing.assert_array_equal(out, ref)


def test_pipeline_encoder_coalesced_matches_encode(rng, monkeypatch):
    """The coalesced device-entropy path (one fused dispatch + one
    totals/byte fetch per image GROUP, opt-in via AKO_ENC_COALESCE)
    must frame byte-identical blobs, including across
    geometry-signature flushes mid-stream, border tiles, and the
    constant-alpha upload elision."""
    monkeypatch.setenv("AKO_ENC_COALESCE", "4")
    images = (
        # group A: RGBA constant alpha, border tiles (two shape groups)
        [rng.integers(0, 256, size=(40, 32, 4), dtype=np.uint8) for _ in range(3)]
        # group B: different geometry forces a signature flush
        + [rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8) for _ in range(2)]
        # group C: varying alpha (fill_val None) splits from A even at
        # equal dims
        + [rng.integers(0, 256, size=(40, 32, 4), dtype=np.uint8)]
    )
    for img in images[:3]:
        img[..., -1] = 255
    s = Settings(quantization=16, tiles_dimension=16)
    enc = PipelineEncoder(s, workers=3, device_entropy=True)
    blobs = enc.encode_batch(images)
    for img, blob in zip(images, blobs):
        assert blob == ako_tpu.encode(img, s, device_entropy=True)


def test_pipeline_encoder_coalesce_partial_group(rng, monkeypatch):
    """Stream length not divisible by AKO_ENC_COALESCE: the trailing
    partial group must flush and stay byte-identical."""
    monkeypatch.setenv("AKO_ENC_COALESCE", "4")
    images = [
        rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8) for _ in range(5)
    ]
    s = Settings(quantization=16, tiles_dimension=32)
    blobs = PipelineEncoder(s, device_entropy=True).encode_batch(images)
    for img, blob in zip(images, blobs):
        assert blob == ako_tpu.encode(img, s, device_entropy=True)


def test_roundtrip_iter_coalesced_hostdec(rng, monkeypatch):
    """The overlapped round-trip stream over the coalesced encoder and
    the host-native decoder (the bench's device-config shape): blobs
    and pixels must match the one-shot paths, in order, including the
    burst-absorbing queue."""
    from ako_tpu.runtime.executor import roundtrip_iter

    monkeypatch.setenv("AKO_ENC_COALESCE", "4")
    monkeypatch.setenv("AKO_TPU_DECODE", "host")
    images = [
        rng.integers(0, 256, size=(40, 32, 3), dtype=np.uint8) for _ in range(6)
    ]
    s = Settings(quantization=16, tiles_dimension=16)
    pairs = list(roundtrip_iter(images, s, workers=3, device_entropy=True))
    assert len(pairs) == 6
    for img, (blob, pix) in zip(images, pairs):
        assert blob == ako_tpu.encode(img, s, device_entropy=True)
        ref, _, _ = ako_tpu.decode(blob)
        np.testing.assert_array_equal(pix, ref)


def test_pipeline_uncompressed(rng):
    from ako_tpu.core.settings import Compression

    images = [rng.integers(0, 256, size=(24, 24, 1), dtype=np.uint8)]
    s = Settings(
        quantization=0, compression=Compression.NONE,
        color=ako_tpu.Color.NONE,
    )
    blobs = PipelineEncoder(s).encode_batch(images)
    outs = list(PipelineDecoder().decode_iter(blobs))
    ref, _, _ = ako_tpu.decode(blobs[0])
    np.testing.assert_array_equal(outs[0], ref)


def test_multihost_single_process_shard(rng):
    """HostShardedPipeline degrades to local round-robin when
    process_count == 1; global indices preserved."""
    from ako_tpu.parallel.multihost import HostShardedPipeline, shard_stream

    images = [
        rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8) for _ in range(3)
    ]
    s = Settings(quantization=16)
    pipe = HostShardedPipeline(s, workers=2)
    got = dict(pipe.encode_shard(images))
    assert sorted(got) == [0, 1, 2]
    for i, img in enumerate(images):
        assert got[i] == ako_tpu.encode(img, s)
    dec = dict(pipe.decode_shard([got[i] for i in range(3)]))
    for i, img_out in dec.items():
        ref, _, _ = ako_tpu.decode(got[i])
        np.testing.assert_array_equal(img_out, ref)
    assert shard_stream([1, 2, 3, 4, 5], 0, 2) == [1, 3, 5]
    assert shard_stream([1, 2, 3, 4, 5], 1, 2) == [2, 4]


def test_roundtrip_iter_matches_oneshot(rng):
    from ako_tpu.runtime.executor import roundtrip_iter

    images = [
        rng.integers(0, 256, size=(40, 32, 3), dtype=np.uint8) for _ in range(4)
    ]
    s = Settings(quantization=16, tiles_dimension=16)
    got = list(roundtrip_iter(images, s, workers=2, depth=2))
    assert len(got) == len(images)
    for img, (blob, pixels) in zip(images, got):
        assert blob == ako_tpu.encode(img, s)
        ref, _, _ = ako_tpu.decode(blob)
        np.testing.assert_array_equal(pixels, ref)


def test_roundtrip_iter_early_exit(rng):
    """Abandoning the stream mid-way must not deadlock the producer."""
    from ako_tpu.runtime.executor import roundtrip_iter

    images = [
        rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8) for _ in range(6)
    ]
    s = Settings(quantization=16)
    it = roundtrip_iter(images, s, workers=2, depth=1)
    next(it)
    it.close()  # runs the generator's finally: drain + join


def test_roundtrip_iter_early_exit_bounded(rng):
    """Early exit must CANCEL the producer: only the in-flight images
    are encoded, not the whole remaining stream (which may be huge or
    unbounded)."""
    from ako_tpu.runtime.executor import roundtrip_iter

    pulled = 0

    def stream():
        nonlocal pulled
        img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        while True:  # endless input
            pulled += 1
            yield img

    s = Settings(quantization=16)
    it = roundtrip_iter(stream(), s, workers=2, depth=1)
    next(it)
    it.close()  # must return: the stop signal ends the feed
    # pipeline depth + queue depth bound the pulls (generous margin)
    assert pulled < 12, pulled


def test_roundtrip_iter_propagates_encoder_error():
    import pytest
    from ako_tpu.runtime.executor import roundtrip_iter

    images = [np.zeros((0, 4, 3), np.uint8)]  # invalid dimensions
    with pytest.raises(ako_tpu.AkoError):
        list(roundtrip_iter(images, Settings()))


def test_concurrent_encodes_no_pool_deadlock(rng, monkeypatch):
    """Task-level fetches (collect group maps) must not share a pool
    with the chunk-level leaf transfers they wait on: with a single
    bounded pool, >=8 concurrent group fetches each blocking on nested
    chunk futures starved the pool and hung forever."""
    import threading

    import ako_tpu.runtime.transfer as tr

    monkeypatch.setattr(tr, "_MIN_PARALLEL_BYTES", 1)
    # 96x96 @ tiles 16 -> 36 tiles -> 4 collect groups of 9 rows each;
    # two concurrent encodes -> 8 task-level fetches, every one fanning
    # chunk fetches out (row count 9 >= 8 chunks, nbytes >= 1)
    imgs = [
        rng.integers(0, 256, size=(96, 96, 3), dtype=np.uint8) for _ in range(2)
    ]
    s = Settings(quantization=16, tiles_dimension=16)
    results = {}

    def enc(i, img):
        results[i] = ako_tpu.encode(img, s, device_entropy=True)

    threads = [
        threading.Thread(target=enc, args=(i, im), daemon=True)
        for i, im in enumerate(imgs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in threads), "pool deadlock"
    for i, im in enumerate(imgs):
        assert results[i] == ako_tpu.encode(im, s)
