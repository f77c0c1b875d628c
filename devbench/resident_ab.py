"""Interleaved A/B: roundtrip stream with the paired residue word-pool
reuse (AKO_TPU_RESIDENT=1, default) vs the full word-pool re-upload
(=0). Transport stays whatever the env says (default off here; set
AKO_TPU_TRANSPORT=1 to measure the composed config).

The tunnel swings +-40% between runs, so the two settings alternate
within one process and only medians are compared (CLAUDE.md). Run with
the TPU tunnel up: `python devbench/resident_ab.py [reps]`.
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
on, off = [], []
os.environ["AKO_TPU_RESIDENT"] = "1"
bench.bench_ours_roundtrip(images, settings, warm=False)  # warm both paths
os.environ["AKO_TPU_RESIDENT"] = "0"
bench.bench_ours_roundtrip(images, settings, warm=False)
for rep in range(REPS):
    os.environ["AKO_TPU_RESIDENT"] = "1"
    t, b1, o1 = bench.bench_ours_roundtrip(images, settings, warm=False)
    on.append(t)
    os.environ["AKO_TPU_RESIDENT"] = "0"
    t, b2, o2 = bench.bench_ours_roundtrip(images, settings, warm=False)
    off.append(t)
    assert b1 == b2 and all(np.array_equal(a, c) for a, c in zip(o1, o2))
    print(f"rep {rep}: resident {mp/on[-1]:.2f} MP/s, re-upload {mp/off[-1]:.2f} MP/s",
          flush=True)

m_on, m_off = statistics.median(on), statistics.median(off)
print(f"medians: resident {mp/m_on:.2f} MP/s, re-upload {mp/m_off:.2f} MP/s "
      f"({m_off/m_on:.2f}x)")
