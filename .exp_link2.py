"""Sustained mixed up/down throughput: the codec's steady-state link
pattern (5.24 MB up + 5.24 MB down per 'image', pipelined)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np
import concurrent.futures as cf
import jax
import jax.numpy as jnp

MB = 1e6
N = 8
host = np.random.default_rng(0).integers(0, 255, size=(80, 128, 128, 4), dtype=np.uint8)
dev0 = jnp.asarray(host)

@jax.jit
def bump(x):
    return x + np.uint8(1)

srcs = [bump(dev0) for _ in range(N)]
for s in srcs:
    np.asarray(s[:1])

def fetch(src, chunks=8):
    bounds = np.array_split(np.arange(src.shape[0]), chunks)
    slices = [slice(int(b[0]), int(b[-1]) + 1) for b in bounds if len(b)]
    with cf.ThreadPoolExecutor(max_workers=chunks) as p:
        return [f.result() for f in [p.submit(lambda s=s: np.asarray(src[s])) for s in slices]]

up_pool = cf.ThreadPoolExecutor(max_workers=2)
down_pool = cf.ThreadPoolExecutor(max_workers=2)

# pattern 1: alternating (half-duplex usage), sequential
t0 = time.perf_counter()
for i in range(N):
    d = jax.device_put(host)
    np.asarray(bump(d)[:1])
    fetch(srcs[i])
dt = time.perf_counter() - t0
print(f"alternating: {2*N*host.nbytes/MB/dt:.1f} MB/s aggregate ({dt/N*1e3:.0f} ms per up+down pair)")

# pattern 2: concurrent up and down streams
t0 = time.perf_counter()
fu = up_pool.submit(lambda: [np.asarray(bump(jax.device_put(host))[:1]) for _ in range(N)])
fd = down_pool.submit(lambda: [fetch(s) for s in srcs])
fu.result(); fd.result()
dt = time.perf_counter() - t0
print(f"concurrent streams: {2*N*host.nbytes/MB/dt:.1f} MB/s aggregate")
