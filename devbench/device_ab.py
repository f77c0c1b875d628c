"""Device-compute A/B: XLA vs Pallas lift kernels, per program.

Times each jitted program by slope: fetch-after-k runs for k in
{1, 5}; per-run cost = (t5 - t1) / 4 — cancels RTT and fetch cost.
Usage: python .bench_device_ab.py [pallas]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
if len(sys.argv) > 1 and sys.argv[1] == "pallas":
    os.environ["AKO_TPU_PALLAS"] = "1"
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import synth_images, TILES
import ako_tpu
from ako_tpu.encode import checked_settings, _tile_encoder_fused
from ako_tpu.core import geometry

rng = np.random.default_rng(42)
img = synth_images(rng, 1)[0]
s = checked_settings(ako_tpu.Settings(quantization=16, tiles_dimension=TILES))
h, w, ch = img.shape
grid = geometry.tile_grid(w, h, s.tiles_dimension)
tiles = [t for t in grid if (t.w, t.h) == (TILES, TILES)]
batch = np.stack([img[t.y:t.y+TILES, t.x:t.x+TILES, :] for t in tiles], axis=0)

fwd, pack, capacity, budget = _tile_encoder_fused(
    TILES, TILES, ch, s.wavelet, s.wrap, s.color, bool(s.discard_non_visible),
    s.quantization, s.gate, s.chroma_loss)

batch_dev = jnp.asarray(batch)
stream_dev = fwd(batch_dev)
np.asarray(stream_dev[0, :4])  # settle upload + compile

def slope(f, arg):
    """per-run device time via fetch-after-k slope"""
    out = f(arg); np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # warm
    ts = {}
    for k in (1, 5):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _i in range(k):
                out = f(arg)
            np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[5] - ts[1]) / 4

print(f"fwd lift+format ({len(tiles)} tiles): {slope(fwd, batch_dev)*1e3:.1f} ms/img")
print(f"entropy pack:                        {slope(pack, stream_dev)*1e3:.1f} ms/img")

# decode side: unlift+format program on the coefficient stream
from ako_tpu.decode import _tile_decoder
dfn = _tile_decoder(TILES, TILES, ch, s.wavelet, s.wrap, s.color)
print(f"unlift+format:                       {slope(dfn, stream_dev)*1e3:.1f} ms/img")
