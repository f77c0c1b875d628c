"""Decompose the pack cost: tokenize, rank (by impl), and the rest."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synth_images, W, H, CH, TILES
import ako_tpu
from ako_tpu.encode import checked_settings, _tile_encoder_fused_raw
from ako_tpu.ops import kagari_device as kd

rng = np.random.default_rng(42)
img = synth_images(rng, 1)[0]
s = checked_settings(ako_tpu.Settings(quantization=16, tiles_dimension=TILES))
from ako_tpu.core import geometry
grid = geometry.tile_grid(W, H, s.tiles_dimension)
full = [t for t in grid if (t.w, t.h) == (TILES, TILES)]
raw, capacity, budget = _tile_encoder_fused_raw(
    TILES, TILES, CH, s.wavelet, s.wrap, s.color,
    bool(s.discard_non_visible), s.quantization, s.gate, s.chroma_loss)
batch = np.stack([img[t.y:t.y+TILES, t.x:t.x+TILES, :] for t in full])
stream = jax.block_until_ready(jax.jit(raw.fwd)(jnp.asarray(batch)))
cap_words = (budget + 3) // 4
print("n values", stream.shape, "cap_words", cap_words)

def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:4])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        for l in jax.tree_util.tree_leaves(out):
            np.asarray(l.reshape(-1)[:4])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts)//2]

tok_jit = jax.jit(jax.vmap(kd.tokenize))
t_tok = timeit(tok_jit, stream)
vals, nbits = jax.block_until_ready(tok_jit(stream))
print(f"tokenize: {t_tok*1e3:.1f} ms")

# rank-only benchmarks over the real word arrays
def words_of(nbits):
    offs = jnp.cumsum(nbits, axis=-1) - nbits
    return (offs >> 5).astype(jnp.int32)
word = jax.block_until_ready(jax.jit(words_of)(nbits))

rank_dense = jax.jit(jax.vmap(lambda w: kd._rank_dense(w, cap_words)))
rank_sort = jax.jit(jax.vmap(lambda w: jnp.searchsorted(
    w, jnp.arange(cap_words, dtype=jnp.int32), side="right", method="sort").astype(jnp.int32)))
t_d = timeit(rank_dense, word)
t_s = timeit(rank_sort, word)
print(f"rank dense: {t_d*1e3:.1f} ms   rank sort: {t_s*1e3:.1f} ms")
a = np.asarray(rank_dense(word)); b = np.asarray(rank_sort(word))
print("rank equal:", np.array_equal(a, b))

# full pack with a FAKE (free) rank to measure everything-else
orig = kd._rank_dense
kd._RANK_IMPL = "dense"
kd._rank_dense = lambda w, q: jnp.arange(q, dtype=jnp.int32)
pack_fake = jax.jit(lambda st: jax.vmap(lambda v: kd.kagari_encode_device(v, capacity, budget))(st))
t_fake = timeit(pack_fake, stream)
kd._rank_dense = orig
print(f"pack with free rank: {t_fake*1e3:.1f} ms")
