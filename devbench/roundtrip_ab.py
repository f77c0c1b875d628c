"""Interleaved A/B: bench_ours (encode stream then decode stream) vs
bench_ours_roundtrip (one overlapped encode->decode stream).

The tunnel swings +-40% between runs, so the two modes alternate
within one process and only medians are compared (CLAUDE.md). Run
with the TPU tunnel up: `python devbench/roundtrip_ab.py [reps]`.
"""
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import bench
import ako_tpu

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

rng = np.random.default_rng(42)
images = bench.synth_images(rng, bench.STREAM_N)
settings = ako_tpu.Settings(quantization=16, tiles_dimension=bench.TILES)

mp = bench.STREAM_N * bench.MEGAPIXELS
seq, rt = [], []
# one warm pass each (compile + caches); timed reps skip re-warming
bench.bench_ours(images, settings, warm=False)
bench.bench_ours_roundtrip(images, settings, warm=False)
for rep in range(REPS):
    t, b1, o1 = bench.bench_ours(images, settings, warm=False)
    seq.append(t)
    t, b2, o2 = bench.bench_ours_roundtrip(images, settings, warm=False)
    rt.append(t)
    assert b1 == b2 and all(np.array_equal(a, c) for a, c in zip(o1, o2))
    print(f"rep {rep}: seq {mp/seq[-1]:.2f} MP/s, roundtrip {mp/rt[-1]:.2f} MP/s",
          flush=True)
ms, mr = statistics.median(seq), statistics.median(rt)
print(f"medians: seq {mp/ms:.2f} MP/s vs roundtrip {mp/mr:.2f} MP/s "
      f"({ms/mr:.2f}x)")
