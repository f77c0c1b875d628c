"""A/B micro-benchmark: device Kagari pack with dense vs sort rank.

Times ONLY the pack program (tokenize + pack_bits) on device, with a
forced fetch, over a realistic coefficient stream (the bench workload's
own forward lift output at q=16, 128-px tiles)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synth_images, W, H, CH, TILES
import ako_tpu
from ako_tpu.encode import checked_settings, _tile_encoder_fused_raw
from ako_tpu.ops import kagari_device

rng = np.random.default_rng(42)
img = synth_images(rng, 1)[0]
s = checked_settings(ako_tpu.Settings(quantization=16, tiles_dimension=TILES))

from ako_tpu.core import geometry
grid = geometry.tile_grid(W, H, s.tiles_dimension)
full = [t for t in grid if (t.w, t.h) == (TILES, TILES)]
print(f"{len(full)} full tiles of {len(grid)}")
raw, capacity, budget = _tile_encoder_fused_raw(
    TILES, TILES, CH, s.wavelet, s.wrap, s.color,
    bool(s.discard_non_visible), s.quantization, s.gate, s.chroma_loss)
batch = np.stack([img[t.y:t.y+TILES, t.x:t.x+TILES, :] for t in full])
fwd_jit = jax.jit(raw.fwd)
stream = jax.block_until_ready(fwd_jit(jnp.asarray(batch)))
print("stream", stream.shape, "capacity", capacity, "budget", budget)

def run(impl, reps=5):
    kagari_device._RANK_IMPL = impl
    pack = jax.jit(lambda st: jax.vmap(
        lambda v: kagari_device.kagari_encode_device(v, capacity, budget))(st))
    by, tot = pack(stream)  # compile
    tot_h = np.asarray(tot)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        by, tot = pack(stream)
        np.asarray(tot)
        float(np.asarray(by[:, :8]).sum())  # forced fetch (tiny)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times)//2], tot_h

m_dense, tot_d = run("dense")
m_sort, tot_s = run("sort")
assert np.array_equal(tot_d, tot_s), "byte counts diverge!"
print(f"pack median per image ({len(full)} tiles): dense {m_dense*1e3:.1f} ms, sort {m_sort*1e3:.1f} ms")
