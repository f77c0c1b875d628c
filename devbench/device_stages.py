"""Per-stage device-compute profile of the fused encode path on the
real chip: forward (format+lift) vs entropy pack, on the north-star
80-tile batch. The single-chip MFU ceiling lives here (VERDICT r3
weak-2: the pack dominated at ~17 ms/img).

Timing through the tunnel: block_until_ready does not wait, so each
stage is timed by a forced tiny fetch (a scalar reduction) — the ~40 ms
RPC latency rides on every sample identically, so stage comparisons
subtract it out via the `fetch_only` floor measured the same way.

Sweeps AKO_PACK_CHUNK (the place-packer chunk width) in subprocesses —
the constant is baked at import — and writes
devbench/DEVICE_STAGES_r04.json.

Usage: python devbench/device_stages.py          # sweep + artifact
       python devbench/device_stages.py --one    # this env only
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
OUT = os.path.join(HERE, "DEVICE_STAGES_r04.json")

REPS = 7


def measure_one() -> dict:
    import numpy as np

    from bench import synth_images, TILES
    import ako_tpu
    from ako_tpu.encode import _tile_encoder_fused, checked_settings
    from ako_tpu.core import geometry
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    img = synth_images(rng, 1)[0]
    s = checked_settings(ako_tpu.Settings(quantization=16, tiles_dimension=TILES))
    h, w, channels = img.shape
    grid = geometry.tile_grid(w, h, s.tiles_dimension)
    tiles = [t for t in grid if (t.w, t.h) == (TILES, TILES)]
    batch = np.stack(
        [img[t.y : t.y + TILES, t.x : t.x + TILES, :] for t in tiles]
    )
    fwd, pack, capacity, budget = _tile_encoder_fused(
        TILES, TILES, channels, s.wavelet, s.wrap, s.color,
        bool(s.discard_non_visible), s.quantization, s.gate, s.chroma_loss,
        None,
    )
    tiles_dev = jnp.asarray(batch)
    np.asarray(tiles_dev[0, 0, 0, 0])  # settle the upload

    stream = fwd(tiles_dev)
    comp, totals = pack(stream)
    np.asarray(totals)  # warm both compiles

    def timed(fn):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return 1e3 * ts[len(ts) // 2]

    # fetch floor: a fresh trivial program each rep (a repeatedly
    # fetched array caches its host copy and reads 0 ms)
    import jax

    trivial = jax.jit(lambda x: x + 1)
    one = jnp.float32(1.0)
    np.asarray(trivial(one))  # warm
    fetch_only = timed(lambda: np.asarray(trivial(one)))
    t_fwd = timed(lambda: np.asarray(jnp.sum(fwd(tiles_dev)[:, ::4097])))
    t_pack = timed(lambda: np.asarray(jnp.sum(pack(stream)[1])))
    t_both = timed(
        lambda: np.asarray(jnp.sum(pack(fwd(tiles_dev))[1]))
    )
    return {
        "chunk": int(os.environ.get("AKO_PACK_CHUNK", "32")),
        "tiles": len(tiles),
        "budget_bytes": budget,
        "fetch_floor_ms": round(fetch_only, 1),
        "fwd_ms": round(t_fwd - fetch_only, 1),
        "pack_ms": round(t_pack - fetch_only, 1),
        "fwd_plus_pack_ms": round(t_both - fetch_only, 1),
    }


def main() -> int:
    if "--one" in sys.argv:
        print(json.dumps(measure_one()))
        return 0
    results = []
    for chunk in ("32", "64", "128"):
        env = dict(os.environ, AKO_PACK_CHUNK=chunk)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            env=env, capture_output=True, text=True, cwd=REPO, timeout=1200,
        )
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            return 1
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        print(f"chunk {chunk}: {rec}")
        results.append(rec)
    best = min(results, key=lambda r: r["pack_ms"])
    record = {
        "metric": "device encode stages, ms per 80-tile 1024x1280 image (median of %d, fetch floor subtracted)" % REPS,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "sweep": results,
        "best_chunk": best["chunk"],
    }
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    main()
