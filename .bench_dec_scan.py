"""Decode-scan block-size sweep on TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synth_images, W, H, TILES
import ako_tpu
from ako_tpu.core import container, geometry
from ako_tpu.ops.kagari_device import kagari_decode_device
from ako_tpu.runtime.kagari import kagari_sync

rng = np.random.default_rng(42)
img = synth_images(rng, 1)[0]
settings = ako_tpu.Settings(quantization=16, tiles_dimension=TILES)
blob = ako_tpu.encode(img, settings)
view = memoryview(blob)
channels, w, h, s = container.head_read(view)
grid = geometry.tile_grid(w, h, s.tiles_dimension)
full = [t for t in grid if (t.w, t.h) == (TILES, TILES)]

# slice payloads
payloads = []
cursor = container.HEAD_SIZE
for t in grid:
    bs = int.from_bytes(view[cursor:cursor+4], "little")
    payloads.append(bytes(view[cursor+4:cursor+4+bs]))
    cursor += 4 + bs

tds = geometry.tile_data_size(TILES, TILES) * channels
count = tds // 2
spacing = geometry.planes_spacing(TILES, TILES)

def words_of(p, wcap):
    buf = np.zeros(wcap * 4, np.uint8)
    buf[:len(p)] = np.frombuffer(p, np.uint8)
    return buf.view(">u4").astype(np.uint32)

wcap = 256
while wcap < max((len(p)+3)//4 + 2 for p in payloads): wcap *= 2

triv = jax.jit(lambda x: x + 1); xs = jnp.zeros((4,), jnp.int32); np.asarray(triv(xs))
rtts = []
for _ in range(7):
    t0=time.perf_counter(); np.asarray(triv(xs)); rtts.append(time.perf_counter()-t0)
rtt = sorted(rtts)[3]
print(f"RTT {rtt*1e3:.1f} ms  wcap {wcap}")

for block in (64, 128, 256):
    syncs = [kagari_sync(count, p, tds + spacing, block) for p in payloads]
    assert all(sy is not None and sy[5] <= 31 for sy in syncs)
    words = jnp.asarray(np.stack([words_of(p, wcap) for p in payloads]))
    b_off = jnp.asarray(np.stack([sy[0] for sy in syncs]))
    prev = jnp.asarray(np.stack([sy[1] for sy in syncs]))
    cons = jnp.asarray(np.stack([sy[2] for sy in syncs]))
    run = jnp.asarray(np.stack([sy[3] for sy in syncs]))
    fn = jax.jit(lambda w_, b_, p_, c_, r_: jax.vmap(
        lambda w2, b2, p2, c2, r2: kagari_decode_device(w2, b2, p2, c2, r2, count, block)
    )(w_, b_, p_, c_, r_))
    out = fn(words, b_off, prev, cons, run)
    jax.block_until_ready(out); np.asarray(out[:1, :4])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(6):
            out = fn(words, b_off, prev, cons, run)
        np.asarray(out[:1, :4])
        ts.append((time.perf_counter() - t0 - rtt) / 6)
    sync_b = sum(sy[0].nbytes + sy[1].nbytes + sy[2].nbytes + sy[3].nbytes for sy in syncs)
    print(f"block={block}: scan {sorted(ts)[1]*1e3:.1f} ms/img, sync {sync_b/1e3:.0f} KB")
