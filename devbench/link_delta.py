"""A/B: raw vs row-delta u8 tile-batch upload (tunnel compresses uplink)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
from bench import synth_images

img = synth_images(np.random.default_rng(1), 1)[0]
tiles = np.stack([
    img[y:y+128, x:x+128, :3] for y in range(0, 1280, 128) for x in range(0, 1024, 128)
])
delta = tiles.copy()
delta[:, :, 1:, :] = tiles[:, :, 1:, :] - tiles[:, :, :-1, :]

raw_t, del_t = [], []
d0 = jnp.asarray(tiles); np.asarray(d0[:1, :1, :1, :1])
for rep in range(5):
    for name, arr, acc in (("raw", tiles, raw_t), ("delta", delta, del_t)):
        t0 = time.perf_counter()
        d = jnp.asarray(arr + rep)  # distinct bytes each rep, same statistics
        np.asarray(d[:1, :1, :1, :1])
        acc.append(time.perf_counter() - t0)
mb = tiles.nbytes / 1e6
print("raw  :", [f"{mb/t:.0f}" for t in raw_t], "MB/s, median", f"{mb/sorted(raw_t)[2]:.1f}")
print("delta:", [f"{mb/t:.0f}" for t in del_t], "MB/s, median", f"{mb/sorted(del_t)[2]:.1f}")
