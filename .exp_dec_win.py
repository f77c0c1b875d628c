"""Decode-scan formulation A/B on TPU: gather-based (current) vs
windowed (per-block word windows carried through the scan, refill =
front word + shift; no gathers). Windows built on device (one gather)
or on host (upload inflation)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synth_images, TILES
import ako_tpu
from ako_tpu.core import container, geometry
from ako_tpu.ops.kagari_device import (
    kagari_decode_device, _gamma_at, _unzigzag, RLE_TRIGGER, SYNC_FIRST,
)
from ako_tpu.runtime.kagari import kagari_sync

rng = np.random.default_rng(42)
img = synth_images(rng, 1)[0]
settings = ako_tpu.Settings(quantization=16, tiles_dimension=TILES)
blob = ako_tpu.encode(img, settings)
view = memoryview(blob)
channels, w, h, s = container.head_read(view)
grid = geometry.tile_grid(w, h, s.tiles_dimension)

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
print(f"RTT {rtt*1e3:.1f} ms  wcap {wcap}  tiles {len(grid)}")


def decode_windowed(hi0, lo0, rest0, cur0, prev0, consec0, run0, n_outputs, block):
    """Windowed scan: per-block word window in the carry; refill =
    take rest[:,0], shift rest left. No gathers anywhere."""
    prev = prev0.astype(jnp.int32)
    consec = consec0.astype(jnp.uint16).astype(jnp.int32)
    runrem = run0.astype(jnp.uint16).astype(jnp.int32)
    cur = cur0.astype(jnp.uint32)

    def refill(hi, lo, cur, rest):
        need = cur >= 32
        hi2 = jnp.where(need, lo, hi)
        lo2 = jnp.where(need, rest[:, 0], lo)
        rest2 = jnp.where(need[:, None],
                          jnp.concatenate([rest[:, 1:], rest[:, :1] * 0], axis=1),
                          rest)
        return hi2, lo2, jnp.where(need, cur - 32, cur), rest2

    def step(state, _):
        hi, lo, cur, rest, prev, consec, runrem = state
        in_run = runrem > 0
        u, ln = _gamma_at(hi, lo, cur)
        v = _unzigzag(u)
        cur = cur + jnp.where(in_run, 0, ln).astype(jnp.uint32)
        hi, lo, cur, rest = refill(hi, lo, cur, rest)

        first = consec == SYNC_FIRST
        eq = (~first) & (~in_run) & (v == prev)
        consec_lit = jnp.where(first, 0, jnp.where(eq, consec + 1, 0))
        trigger = (~in_run) & (consec_lit == RLE_TRIGGER)
        u2, ln2 = _gamma_at(hi, lo, cur)
        cur = cur + jnp.where(trigger, ln2, 0).astype(jnp.uint32)
        hi, lo, cur, rest = refill(hi, lo, cur, rest)
        rle_len = ((u2 - jnp.uint32(1)) & jnp.uint32(0xFFFF)).astype(jnp.int32)

        out = jnp.where(in_run, prev, v)
        prev_n = jnp.where(in_run | eq, prev, v)
        runrem_n = jnp.where(in_run, runrem - 1, jnp.where(trigger, rle_len, 0))
        consec_n = jnp.where(in_run, consec, jnp.where(trigger, 0, consec_lit))
        return (hi, lo, cur, rest, prev_n, consec_n, runrem_n), out.astype(jnp.int16)

    state0 = (hi0, lo0, cur, rest0, prev, consec, runrem)
    _, ys = jax.lax.scan(step, state0, None, length=block)
    return ys.T.reshape(-1)[:n_outputs]


def windows_device(words, bit_off, span):
    """(wcap,) words + (B,) bit offsets -> (hi, lo, rest(B, span-2), cur)
    via one gather."""
    word0 = (bit_off >> 5).astype(jnp.int32)
    cur = (bit_off & 31).astype(jnp.uint32)
    idx = jnp.clip(word0[:, None] + jnp.arange(span, dtype=jnp.int32)[None, :],
                   0, words.shape[0] - 1)
    win = words[idx]  # (B, span) one gather
    return win[:, 0], win[:, 1], win[:, 2:], cur


def span_of(syncs_boff, total_bits_list, slack=3):
    m = 0
    for boff, tb in zip(syncs_boff, total_bits_list):
        ends = np.concatenate([boff[1:], [tb]])
        m = max(m, int(np.max((ends - 1) // 32 - boff // 32 + 1)) + slack)
    b = 8
    while b < m:
        b *= 2
    return m, b


for block in (64, 128):
    syncs = [kagari_sync(count, p, tds + spacing, block) for p in payloads]
    assert all(sy is not None and sy[5] <= 31 for sy in syncs)
    words_np = np.stack([words_of(p, wcap) for p in payloads])
    boffs = [sy[0].astype(np.int64) for sy in syncs]
    total_bits = [len(p) * 8 for p in payloads]
    span_true, span = span_of(boffs, total_bits)
    print(f"block={block}: true max span {span_true} words -> bucket {span}")

    words = jnp.asarray(words_np)
    b_off = jnp.asarray(np.stack([sy[0] for sy in syncs]))
    prev = jnp.asarray(np.stack([sy[1] for sy in syncs]))
    cons = jnp.asarray(np.stack([sy[2] for sy in syncs]))
    run = jnp.asarray(np.stack([sy[3] for sy in syncs]))

    # A: current gather-based
    fnA = jax.jit(lambda w_, b_, p_, c_, r_: jax.vmap(
        lambda w2, b2, p2, c2, r2: kagari_decode_device(w2, b2, p2, c2, r2, count, block)
    )(w_, b_, p_, c_, r_))
    outA = fnA(words, b_off, prev, cons, run)
    jax.block_until_ready(outA)
    ref = np.asarray(outA)

    # B: windowed, device-built windows
    def fB(w_, b_, p_, c_, r_):
        def one(w2, b2, p2, c2, r2):
            hi, lo, rest, cur = windows_device(w2, b2, span)
            return decode_windowed(hi, lo, rest, cur, p2, c2, r2, count, block)
        return jax.vmap(one)(w_, b_, p_, c_, r_)
    fnB = jax.jit(fB)
    outB = fnB(words, b_off, prev, cons, run)
    jax.block_until_ready(outB)
    print("  B matches:", np.array_equal(np.asarray(outB), ref))

    # C: windowed, host-built windows
    def host_windows(words_row, boff, span):
        word0 = (boff >> 5).astype(np.int64)
        pad = np.pad(words_row, (0, span))
        win = pad[np.add.outer(word0, np.arange(span))]
        return win.astype(np.uint32), (boff & 31).astype(np.uint32)
    wins, curs = [], []
    t0 = time.perf_counter()
    for i in range(len(payloads)):
        wn, cu = host_windows(words_np[i], boffs[i], span)
        wins.append(wn); curs.append(cu)
    t_build = time.perf_counter() - t0
    wins_np = np.stack(wins); curs_np = np.stack(curs)
    print(f"  host window build {t_build*1e3:.1f} ms, upload {wins_np.nbytes/1e6:.2f} MB vs words {words_np.nbytes/1e6:.2f} MB")
    def fC(win_, cur_, p_, c_, r_):
        def one(w2, cu2, p2, c2, r2):
            return decode_windowed(w2[:, 0], w2[:, 1], w2[:, 2:], cu2, p2, c2, r2, count, block)
        return jax.vmap(one)(win_, cur_, p_, c_, r_)
    fnC = jax.jit(fC)
    winsd = jnp.asarray(wins_np); cursd = jnp.asarray(curs_np)
    outC = fnC(winsd, cursd, prev, cons, run)
    jax.block_until_ready(outC)
    print("  C matches:", np.array_equal(np.asarray(outC), ref))

    for name, fn, args in (("A gather", fnA, (words, b_off, prev, cons, run)),
                           ("B dev-win", fnB, (words, b_off, prev, cons, run)),
                           ("C host-win", fnC, (winsd, cursd, prev, cons, run))):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(6):
                out = fn(*args)
            np.asarray(out[:1, :4])
            ts.append((time.perf_counter() - t0 - rtt) / 6)
        print(f"  {name}: {sorted(ts)[1]*1e3:.1f} ms/img")
