"""Encode stage profile on TPU: staging+upload, device wait, byte drain."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synth_images, TILES
import ako_tpu
from ako_tpu.encode import dispatch_tiles_fused, collect_tiles_blocks

rng = np.random.default_rng(42)
img = synth_images(rng, 1)[0]
settings = ako_tpu.Settings(quantization=16, tiles_dimension=TILES)
from ako_tpu.encode import checked_settings
s = checked_settings(settings)

# warm/compile
grid, channels, disp = dispatch_tiles_fused(img, s)
blocks = collect_tiles_blocks(s, channels, grid, disp)
print("compressed MB:", sum(len(b) for b in blocks) / 1e6)

for r in range(3):
    t0 = time.perf_counter()
    grid, channels, disp = dispatch_tiles_fused(img, s)
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for rec in disp:
        np.asarray(rec[3])  # totals fetch = device wait
    t_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    blocks = collect_tiles_blocks(s, channels, grid, disp)
    t_drain = time.perf_counter() - t0
    nfall = 0
    print(f"run {r}: stage+upload+dispatch {t_disp*1e3:.0f} ms, device wait {t_dev*1e3:.0f} ms, byte drain {t_drain*1e3:.0f} ms")
