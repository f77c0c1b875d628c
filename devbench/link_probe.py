"""Probe tunnel link: up/down MB/s vs chunk count, zeros vs noise."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp
from ako_tpu.runtime.transfer import device_put_parallel, device_get_parallel

MB = 5 * 2**20
noise = np.random.default_rng(0).integers(0, 256, size=(40, MB // 8), dtype=np.uint8)
zeros = np.zeros((40, MB // 8), np.uint8)

dev = jnp.zeros((40, MB // 8), jnp.uint8) + 1
np.asarray(dev[:1, :1])

for name, arr in [("noise", noise), ("zeros", zeros)]:
    for ch in (1, 2, 4, 8):
        t0 = time.perf_counter()
        d = device_put_parallel(arr, chunks=ch)
        np.asarray(d[:1, :1])  # force
        dt = time.perf_counter() - t0
        print(f"up   {name} chunks={ch}: {arr.nbytes/1e6/dt:.1f} MB/s")

for ch in (1, 4, 8, 16):
    t0 = time.perf_counter()
    out = device_get_parallel(dev, chunks=ch)
    dt = time.perf_counter() - t0
    print(f"down chunks={ch}: {out.nbytes/1e6/dt:.1f} MB/s")
