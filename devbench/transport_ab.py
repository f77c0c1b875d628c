"""Interleaved A/B on the real link: decode stream with raw pixel
bands vs AKO_TPU_TRANSPORT=1 (lossless q0 re-encode of the download,
runtime/transport.py). Alternates modes within one process and
compares medians (the tunnel swings +-40%, CLAUDE.md). Also reports
roundtrip_iter under both modes, since transport's value depends on
which link direction binds there.
"""
import os
import statistics
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import ako_tpu
from bench import STREAM_N, TILES, synth_images
from ako_tpu.runtime.executor import PipelineDecoder, PipelineEncoder, roundtrip_iter
from ako_tpu.runtime import transport

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

rng = np.random.default_rng(42)
images = synth_images(rng, STREAM_N)
settings = ako_tpu.Settings(quantization=16, tiles_dimension=TILES)
enc = PipelineEncoder(settings, workers=4)
dec = PipelineDecoder(workers=4)
blobs = enc.encode_batch(images)


def dec_stream():
    t0 = time.perf_counter()
    outs = list(dec.decode_iter(blobs))
    return time.perf_counter() - t0, outs


def rt_stream():
    t0 = time.perf_counter()
    pairs = list(roundtrip_iter(images, settings, workers=4))
    return time.perf_counter() - t0, [p for _, p in pairs]


def set_mode(on: bool):
    if on:
        os.environ["AKO_TPU_TRANSPORT"] = "1"
        assert transport.enabled(), "no CPU backend: transport cannot run"
    else:
        os.environ.pop("AKO_TPU_TRANSPORT", None)


for mode in (False, True):  # warm both modes' programs
    set_mode(mode)
    dec_stream()
    rt_stream()

res = {("dec", m): [] for m in (False, True)}
res.update({("rt", m): [] for m in (False, True)})
set_mode(False)
t, ref_outs = dec_stream()
for rep in range(REPS):
    for mode in (False, True):
        set_mode(mode)
        t, outs = dec_stream()
        assert all(np.array_equal(a, b) for a, b in zip(outs, ref_outs))
        res[("dec", mode)].append(t / STREAM_N * 1e3)
        t, outs = rt_stream()
        assert all(np.array_equal(a, b) for a, b in zip(outs, ref_outs))
        res[("rt", mode)].append(t / STREAM_N * 1e3)
    print(
        f"rep {rep}: dec raw {res[('dec', False)][-1]:.0f} vs transport "
        f"{res[('dec', True)][-1]:.0f} ms/img | rt raw "
        f"{res[('rt', False)][-1]:.0f} vs transport {res[('rt', True)][-1]:.0f}",
        flush=True,
    )
set_mode(False)
for kind in ("dec", "rt"):
    a = statistics.median(res[(kind, False)])
    b = statistics.median(res[(kind, True)])
    print(f"{kind} medians: raw {a:.0f} ms/img vs transport {b:.0f} ({a/b:.2f}x)")
