"""Isolate decode device program parts: entropy scan vs unlift+format."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synth_images, TILES
import ako_tpu
from ako_tpu.core import container, geometry
from ako_tpu.runtime.kagari import kagari_sync
from ako_tpu.decode import (
    _entropy_decode_fn, _tile_decoder, _bucket_words, _bucket_span,
    _payload_words, tile_block_sizes,
)
from ako_tpu.ops.kagari_device import DECODE_BLOCK, DECODE_SLACK_WORDS, decode_span_words

rng = np.random.default_rng(42)
img = synth_images(rng, 1)[0]
settings = ako_tpu.Settings(quantization=16, tiles_dimension=TILES)
blob = ako_tpu.encode(img, settings)
view = memoryview(blob)
channels, w, h, s = container.head_read(view)
grid = geometry.tile_grid(w, h, s.tiles_dimension)

items = []
cursor = container.HEAD_SIZE
for t in grid:
    bs = int.from_bytes(view[cursor:cursor+4], "little")
    payload = view[cursor+4:cursor+4+bs]
    tds, spacing = tile_block_sizes(t, s, channels)
    sy = kagari_sync(tds // 2, payload, tds + spacing, DECODE_BLOCK)
    assert sy is not None and sy[5] <= 31
    items.append((t, bytes(payload), sy))
    cursor += 4 + bs
items = [(t, p, sy) for t, p, sy in items if (t.w, t.h) == (TILES, TILES)]
print("tiles:", len(items))

count = tile_block_sizes(items[0][0], s, channels)[0] // 2
wcap = _bucket_words(max((len(p)+3)//4 + DECODE_SLACK_WORDS for _, p, _ in items))
span = _bucket_span(max(decode_span_words(sy[0], len(p)*8) for _, p, sy in items))
print("wcap", wcap, "span", span, "count", count)

words = jnp.asarray(np.stack([_payload_words(p, wcap) for _, p, _ in items]))
b_off = jnp.asarray(np.stack([sy[0] for _, _, sy in items]))
prev = jnp.asarray(np.stack([sy[1] for _, _, sy in items]))
cons = jnp.asarray(np.stack([sy[2] for _, _, sy in items]))
run = jnp.asarray(np.stack([sy[3] for _, _, sy in items]))

efn = _entropy_decode_fn(count, DECODE_BLOCK, wcap, min(span, wcap))
dfn = _tile_decoder(TILES, TILES, channels, s.wavelet, s.wrap, s.color)

streams = efn(words, b_off, prev, cons, run)
jax.block_until_ready(streams)
px = dfn(streams)
jax.block_until_ready(px)

triv = jax.jit(lambda x: x + 1); xs = jnp.zeros((4,), jnp.int32); np.asarray(triv(xs))
rtts = []
for _ in range(7):
    t0=time.perf_counter(); np.asarray(triv(xs)); rtts.append(time.perf_counter()-t0)
rtt = sorted(rtts)[3]
print(f"RTT {rtt*1e3:.1f} ms")

def timeit(name, f):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(6):
            out = f()
        np.asarray(out).reshape(-1)[:4]
        ts.append((time.perf_counter() - t0 - rtt) / 6)
    print(f"{name}: {sorted(ts)[1]*1e3:.1f} ms/img")

timeit("entropy scan", lambda: efn(words, b_off, prev, cons, run))
timeit("unlift+format", lambda: dfn(streams))
timeit("fused chain", lambda: dfn(efn(words, b_off, prev, cons, run)))
