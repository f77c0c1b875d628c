"""Per-transfer latency of tiny arrays over the tunnel."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

small = np.arange(64, dtype=np.int32)
d = jnp.asarray(small); np.asarray(d)  # warm

for n in (1, 8):
    t0 = time.perf_counter()
    for k in range(n):
        dd = jax.device_put(small + k)
    outs = [np.asarray(x) for x in [dd]]
    t = time.perf_counter() - t0
    print(f"{n} seq tiny up+1 down: {t*1e3:.1f} ms total, {t/n*1e3:.1f} ms/up")

# pure down latency: tiny slices of an existing device array
big = jnp.zeros((1024, 1024), jnp.uint8) + 3
np.asarray(big[:1, :1])
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    np.asarray(big[:1, :1])  # enqueues a slice program + fetch
    ts.append(time.perf_counter() - t0)
print("tiny slice fetch: median", sorted(ts)[5]*1e3, "ms")

# plain tiny array fetch (no program)
tiny = jnp.asarray(small); np.asarray(tiny)
ts = []
for k in range(10):
    t2 = jnp.asarray(small + k)
    t0 = time.perf_counter()
    np.asarray(t2)
    ts.append(time.perf_counter() - t0)
print("tiny fetch: median", sorted(ts)[5]*1e3, "ms")

ts = []
for k in range(10):
    t0 = time.perf_counter()
    x = jax.device_put(small + 100 + k)
    x.block_until_ready()
    ts.append(time.perf_counter() - t0)
print("tiny put (block): median", sorted(ts)[5]*1e3, "ms")
