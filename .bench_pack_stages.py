"""Pack-stage profile on chip, noise-hardened: slope between k=2 and
k=10 executions, 5 reps, min; full drain before each timing."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synth_images, TILES
import ako_tpu
from ako_tpu.encode import checked_settings, _tile_encoder_fused
from ako_tpu.core import geometry
from ako_tpu.ops import kagari_device as kd

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
stream_dev = fwd(jnp.asarray(batch))
np.asarray(stream_dev[0, :4])
cap_words = (budget + 3) // 4

tok = jax.jit(jax.vmap(kd.tokenize))
toks = tok(stream_dev)
nbits_dev = toks[1]
offs_mxu = jax.jit(jax.vmap(kd._excl_cumsum_mxu_small))
offs_ref = jax.jit(jax.vmap(lambda nb: jnp.cumsum(nb) - nb))
offs = offs_mxu(nbits_dev)
word_dev = jax.jit(jax.vmap(lambda o: (o >> 5).astype(jnp.int32)))(offs)
rank_j = jax.jit(jax.vmap(lambda wv: kd._rank_dense(wv, cap_words)))
u32 = jax.jit(jax.vmap(lambda o: o.astype(jnp.uint32)))(offs)
csu_mxu = jax.jit(jax.vmap(kd._cumsum_mxu_u32))
csu_ref = jax.jit(jax.vmap(lambda x: jnp.cumsum(x, dtype=jnp.uint32)))

def slope(name, f, *args):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]  # drain
    ts = {}
    for k in (2, 10):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            for _i in range(k):
                out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    print(f"{name:22s} {(ts[10]-ts[2])/8*1e3:7.1f} ms")

slope("full pack", pack, stream_dev)
slope("tokenize", tok, stream_dev)
slope("offs mxu", offs_mxu, nbits_dev)
slope("offs jnp.cumsum", offs_ref, nbits_dev)
slope("rank_dense", rank_j, word_dev)
slope("u32 cumsum mxu", csu_mxu, u32)
slope("u32 cumsum jnp", csu_ref, u32)
