"""Executor span-path campaign: random images and settings through the
HOST-native PipelineEncoder/PipelineDecoder (the batched
akort_tile_{encode,decode}_spans entries with PAIRED entropy decode),
asserting blob byte-parity and pixel bit-parity against the reference
oracle. Complements diff_campaign, which drives the library-level
per-tile paths. Usage: span_campaign.py START COUNT
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["AKO_TPU_ENCODE"] = "host"
os.environ["AKO_TPU_DECODE"] = "host"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from ako_tpu.core.settings import Compression, Settings  # noqa: E402
from ako_tpu.encode import checked_settings  # noqa: E402
from ako_tpu.runtime.executor import (  # noqa: E402
    PipelineDecoder,
    PipelineEncoder,
    roundtrip_iter,
)
from tests import oracle  # noqa: E402
from tests.test_differential import COLORS, WAVELETS, WRAPS  # noqa: E402


def _case(rng):
    h = int(rng.integers(16, 220))
    w = int(rng.integers(16, 220))
    channels = int(rng.choice([1, 2, 3, 4]))
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 120 + 60 * np.sin(x / 23.0) + 50 * np.cos(y / 13.0)
    img = np.clip(
        base[..., None] + rng.normal(0, 4, size=(h, w, channels)), 0, 255
    ).astype(np.uint8)
    s = Settings(
        quantization=int(rng.choice([0, 16, 64])),
        gate=int(rng.choice([0, 16])),
        wavelet=WAVELETS[rng.integers(0, len(WAVELETS))],
        wrap=WRAPS[rng.integers(0, len(WRAPS))],
        color=COLORS[rng.integers(0, len(COLORS))],
        # small tile dims against biggish images -> many tiles, odd
        # counts, narrow edge tiles: the span/pair bookkeeping surface
        # (1-2 px border tiles make the reference ENCODER fail —
        # divergence 7 — which the contract below models)
        tiles_dimension=int(rng.choice([0, 16, 32, 64])),
        chroma_loss=int(rng.choice([0, 1, 3])),
        discard_non_visible=bool(rng.integers(0, 2)),
    )
    return img, s


def main() -> int:
    start, count = int(sys.argv[1]), int(sys.argv[2])
    fails = 0
    for seed in range(start, start + count):
        rng = np.random.default_rng(3_000_000 + seed)
        img, s = _case(rng)
        try:
            ref_blob = oracle.ref_encode(img, checked_settings(s))
        except Exception as e:
            print(f"FAIL seed {seed}: oracle encode crash {e}", flush=True)
            fails += 1
            continue
        try:
            pe = PipelineEncoder(s, workers=4)
            (blob,) = pe.encode_batch([img])
        except Exception as e:
            if ref_blob is None:
                continue  # both reject (incompressible etc.)
            print(f"FAIL seed {seed}: pipeline encode raised {e}, ref ok",
                  flush=True)
            fails += 1
            continue
        if ref_blob is None:
            # divergence 7: the reference ENCODER fails on narrow
            # border tiles that are format-valid; its DECODER must
            # read our blob and agree with our pixels (the
            # diff_campaign contract)
            ref_dec = oracle.ref_decode(blob)
            (pix,) = list(PipelineDecoder(workers=4).decode_iter([blob]))
            if ref_dec is None or not np.array_equal(pix, ref_dec[0]):
                print(
                    f"FAIL seed {seed}: ref-encoder-fail case, decoder "
                    "disagreement", flush=True,
                )
                fails += 1
            continue
        # divergence 9: 5x5 corner tiles with channels >= 2 make the
        # reference encoder spill its aux buffer; refquirks models the
        # corrupted reference blob bit-exactly from ours (same contract
        # as diff_campaign — this campaign missed it until a fresh r5
        # seed range drew a 197x21 ch2 t16 case)
        from tests import refquirks

        if refquirks.expected_ref_blob(img, checked_settings(s), blob) != ref_blob:
            print(f"FAIL seed {seed}: blob mismatch", flush=True)
            fails += 1
            continue
        (pix,) = list(PipelineDecoder(workers=4).decode_iter([blob]))
        ref_pix = oracle.ref_decode(blob)[0]
        if not np.array_equal(pix, ref_pix):
            print(f"FAIL seed {seed}: pixel mismatch", flush=True)
            fails += 1
            continue
        if s.compression == Compression.KAGARI and seed % 5 == 0:
            ((rb, rp),) = list(roundtrip_iter([img], s, workers=4))
            # compare against OUR validated blob (ref_blob may carry
            # the modeled divergence-9 corruption)
            if rb != blob or not np.array_equal(rp, ref_pix):
                print(f"FAIL seed {seed}: roundtrip_iter mismatch", flush=True)
                fails += 1
    print(
        f"span range {start}..{start + count}: {count - fails} ok, {fails} fail",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
