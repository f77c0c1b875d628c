"""Link characterization round 2: forced-sync uploads (tiny reduction
fetch), repeated interleaved runs. Serialized TPU experiment."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np
import concurrent.futures as cf
import jax
import jax.numpy as jnp

MB = 1e6
host = np.random.default_rng(0).integers(0, 255, size=(80, 128, 128, 4), dtype=np.uint8)  # 5.24 MB
dev = jnp.asarray(host)

@jax.jit
def tiny(x):
    return x.reshape(-1)[:: 65536].astype(jnp.int32).sum()

np.asarray(tiny(dev))  # warm compile

pool = cf.ThreadPoolExecutor(max_workers=16)

def up(chunks):
    t0 = time.perf_counter()
    if chunks == 1:
        d = jax.device_put(host)
    else:
        parts = np.array_split(host, chunks, axis=0)
        futs = [pool.submit(jax.device_put, p) for p in parts]
        d = jnp.concatenate([f.result() for f in futs], axis=0)
    np.asarray(tiny(d))  # forced sync through the tunnel
    return host.nbytes / MB / (time.perf_counter() - t0)

def down(chunks):
    src = dev + np.int32(0)  # fresh array each call: defeat host cache
    np.asarray(tiny(src))
    t0 = time.perf_counter()
    if chunks == 1:
        out = np.asarray(src)
    else:
        bounds = np.array_split(np.arange(host.shape[0]), chunks)
        slices = [slice(int(b[0]), int(b[-1]) + 1) for b in bounds if len(b)]
        futs = [pool.submit(lambda s=s: np.asarray(src[s])) for s in slices]
        out = [f.result() for f in futs]
    return host.nbytes / MB / (time.perf_counter() - t0)

res = {}
for rep in range(4):
    for c in (1, 2, 4, 8):
        res.setdefault(("up", c), []).append(up(c))
        res.setdefault(("down", c), []).append(down(c))
for (kind, c), v in sorted(res.items()):
    v = sorted(v)
    print(f"{kind:4s} chunks {c:2d}: median {v[len(v)//2]:5.1f} MB/s  {[f'{x:.0f}' for x in v]}")
