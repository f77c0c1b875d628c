"""Probe tunnel compressibility: photo-like pixels both directions."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from bench import synth_images
from ako_tpu.runtime.transfer import device_put_parallel, device_get_parallel

rng = np.random.default_rng(1)
photo = np.stack([synth_images(rng, 1)[0].reshape(-1)[: 4 * 2**20] for _ in range(5)])
noise = rng.integers(0, 256, size=photo.shape, dtype=np.uint8)

for name, arr in [("photo", photo), ("noise", noise)]:
    for ch in (1, 2, 4):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            d = device_put_parallel(arr, chunks=ch)
            np.asarray(d[:1, :1])
            best = min(best, time.perf_counter() - t0)
        print(f"up   {name} chunks={ch}: {arr.nbytes/1e6/best:.1f} MB/s")

dphoto = jnp.asarray(photo)
dnoise = jnp.asarray(noise)
np.asarray(dphoto[:1, :1]); np.asarray(dnoise[:1, :1])
for name, d in [("photo", dphoto), ("noise", dnoise)]:
    for ch in (1, 8):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            out = device_get_parallel(d, chunks=ch)
            best = min(best, time.perf_counter() - t0)
        print(f"down {name} chunks={ch}: {d.nbytes/1e6/best:.1f} MB/s")
