"""Probe: does row-delta filtering speed up tunnel pixel transfers?
The tunnel compresses in flight (zeros ~2.8x faster than noise), so a
reversible delta filter that skews bytes toward 0 may raise effective
MB/s for photo content in both directions."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from bench import synth_images
from ako_tpu.runtime.transfer import device_put_parallel, device_get_parallel

rng = np.random.default_rng(1)
img = synth_images(rng, 1)[0]  # (1280,1024,4) u8
# tile-batch layout like the real encode upload: (80,128,128,4)
tiles = np.stack([
    img[y:y+128, x:x+128] for y in range(0, 1280, 128) for x in range(0, 1024, 128)
])
delta = tiles.copy()
delta[:, :, 1:, :] = tiles[:, :, 1:, :] - tiles[:, :, :-1, :]  # u8 wrap

import zlib
print("zlib ratio raw  :", tiles.nbytes / len(zlib.compress(tiles.tobytes(), 1)))
print("zlib ratio delta:", tiles.nbytes / len(zlib.compress(delta.tobytes(), 1)))

for name, arr in [("raw", tiles), ("delta", delta)]:
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        d = device_put_parallel(arr, chunks=2)
        np.asarray(d[:1, :1, :1, :1])
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    print(f"up {name}: median {arr.nbytes/1e6/ts[len(ts)//2]:.1f} MB/s (best {arr.nbytes/1e6/ts[0]:.1f})")

# downloads: fresh device arrays each run (avoid host-side caching)
for name, arr in [("raw", tiles), ("delta", delta)]:
    ts = []
    for k in range(4):
        d = jnp.asarray(arr) + k  # distinct buffer each run
        np.asarray(d[:1, :1, :1, :1])
        t0 = time.perf_counter()
        out = device_get_parallel(d, chunks=8)
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    print(f"down {name}: median {arr.nbytes/1e6/ts[len(ts)//2]:.1f} MB/s (best {arr.nbytes/1e6/ts[0]:.1f})")
