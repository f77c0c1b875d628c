"""A/B: interleaved (T,h,w,3) vs planar (3,T,h,w) u8 tile-batch upload.

The tunnel compresses the uplink with a match-based (zlib-family)
compressor. Planar layout groups same-channel bytes, which usually
compresses better than RGB-interleaved rows without perturbing byte
values (unlike the rejected row-delta filter, which destroyed the
compressor's long matches — see devbench/link_delta.py).

Interleaved measurements (alternating A/B within each rep) per
CLAUDE.md: the tunnel drifts minute-to-minute, so only paired medians
are comparable.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from bench import synth_images

img = synth_images(np.random.default_rng(1), 1)[0]
tiles = np.stack([
    img[y:y+128, x:x+128, :3] for y in range(0, 1280, 128) for x in range(0, 1024, 128)
])
planar = np.ascontiguousarray(np.transpose(tiles, (3, 0, 1, 2)))

d0 = jnp.asarray(tiles); np.asarray(d0[:1, :1, :1, :1])  # warm
inter_t, plan_t = [], []
for rep in range(7):
    for name, arr, acc in (("inter", tiles, inter_t), ("planar", planar, plan_t)):
        t0 = time.perf_counter()
        d = jnp.asarray(arr + rep)  # distinct bytes each rep, same statistics
        np.asarray(d.ravel()[:1])
        acc.append(time.perf_counter() - t0)
mb = tiles.nbytes / 1e6
print("inter :", [f"{mb/t:.0f}" for t in inter_t], "MB/s, median", f"{mb/sorted(inter_t)[3]:.1f}")
print("planar:", [f"{mb/t:.0f}" for t in plan_t], "MB/s, median", f"{mb/sorted(plan_t)[3]:.1f}")
