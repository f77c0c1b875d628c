"""Is the tunnel full-duplex? Concurrent 16 MB up + 16 MB down vs the
two sequentially. If aggregate >> sequential, the overlapped
encode->decode round-trip stream (runtime.executor.roundtrip_iter)
halves link time; if they share one pipe, it only hides compute.
"""
import os, sys, time
import concurrent.futures as cf
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp
from ako_tpu.runtime.transfer import device_put_parallel, device_get_parallel

MB16 = 16 * 2**20
rng = np.random.default_rng(0)
up_host = rng.integers(0, 256, size=(64, MB16 // 64), dtype=np.uint8)  # noise: no in-flight compression
down_dev = jnp.asarray(rng.integers(0, 256, size=(64, MB16 // 64), dtype=np.uint8))
np.asarray(down_dev[:1, :1])

def up(rep):
    d = device_put_parallel(up_host + rep, chunks=2)
    np.asarray(d.ravel()[:1])

def down():
    device_get_parallel(down_dev, chunks=2)

# warm
up(9); down()

for rep in range(4):
    t0 = time.perf_counter(); up(rep); t_up = time.perf_counter() - t0
    t0 = time.perf_counter(); down(); t_down = time.perf_counter() - t0
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(2) as ex:
        f1 = ex.submit(up, rep + 4); f2 = ex.submit(down)
        f1.result(); f2.result()
    t_both = time.perf_counter() - t0
    mb = MB16 / 1e6
    print(
        f"rep {rep}: up {mb/t_up:.1f} MB/s, down {mb/t_down:.1f} MB/s, "
        f"concurrent {2*mb/t_both:.1f} MB/s agg "
        f"(duplex gain {(t_up+t_down)/t_both:.2f}x)"
    )
