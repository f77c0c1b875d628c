"""Extended differential campaign: run test_differential's full
contract over a fresh seed range. Usage: diff_campaign.py START COUNT [big]

"big" switches the case generator to bench-scale shapes (100-400 px,
tile dims up to 128) that test_differential's 3-80 px generator never
reaches; seeds are disjoint from the small generator's by construction
(different rng stream via the +2**32 offset)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8").strip()
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import ako_tpu
from tests import oracle
from tests.test_differential import _random_case, COLORS, WAVELETS, WRAPS
from ako_tpu.core.settings import Settings


def _big_case(rng):
    h = int(rng.integers(100, 400))
    w = int(rng.integers(100, 400))
    channels = int(rng.choice([1, 3, 4]))
    if os.environ.get("AKO_CAMPAIGN_CORPUS") == "fbm":
        from ako_tpu.utils.corpus import photo

        img = photo(rng, h, w, channels)
    else:
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        base = 120 + 60 * np.sin(x / 29.0) + 50 * np.cos(y / 17.0)
        img = np.clip(
            base[..., None] + rng.normal(0, 4, size=(h, w, channels)), 0, 255
        ).astype(np.uint8)
    s = Settings(
        quantization=int(rng.choice([0, 16, 64])),
        gate=int(rng.choice([0, 16])),
        wavelet=WAVELETS[rng.integers(0, len(WAVELETS))],
        wrap=WRAPS[rng.integers(0, len(WRAPS))],
        color=COLORS[rng.integers(0, len(COLORS))],
        tiles_dimension=int(rng.choice([0, 32, 64, 128])),
        chroma_loss=int(rng.choice([0, 1, 3])),
        discard_non_visible=bool(rng.integers(0, 2)),
    )
    return img, s


start, count = int(sys.argv[1]), int(sys.argv[2])
big = len(sys.argv) > 3 and sys.argv[3] == "big"
fails = 0
for seed in range(start, start + count):
    if seed % 20 == 0 and seed > start:
        # every random case compiles fresh tile-shape programs; LLVM's
        # JIT mappings accumulate until mmap fails (SIGSEGV) — drop the
        # executable caches periodically to bound them
        jax.clear_caches()
        nmaps = sum(1 for _ in open(f"/proc/{os.getpid()}/maps"))
        print(f"seed {seed}: {nmaps} maps", flush=True)
    rng = np.random.default_rng(seed + (2**32 if big else 0))
    img, s = _big_case(rng) if big else _random_case(rng)
    try:
        ref_blob = oracle.ref_encode(img, s)
        try:
            ours = ako_tpu.encode(img, s, device_entropy=False)
        except ako_tpu.AkoError:
            assert ref_blob is None, (seed, s)
            continue
        if ref_blob is None:
            ref_dec = oracle.ref_decode(ours)
            assert ref_dec is not None, (seed, s)
            got = ako_tpu.decode(ours, device_entropy=False)[0]
            assert np.array_equal(np.asarray(ref_dec[0]).reshape(got.shape), got), (seed, s)
            continue
        from tests import refquirks
        assert refquirks.expected_ref_blob(img, s, ours) == ref_blob, (seed, s, "encode blob mismatch")
        ours_dev = ako_tpu.encode(img, s, device_entropy=True)
        assert ours_dev == ours, (seed, s, "device-entropy blob mismatch")
        ref_img, _ = oracle.ref_decode(ref_blob)[:2]
        got = ako_tpu.decode(ref_blob, device_entropy=False)[0]
        assert np.array_equal(got, np.asarray(ref_img).reshape(got.shape)), (seed, s, "host decode mismatch")
        got_dev = ako_tpu.decode(ref_blob, device_entropy=True)[0]
        assert np.array_equal(got_dev, got), (seed, s, "device decode mismatch")
        if ours != ref_blob:  # quirk blobs: both decoders must agree on OURS too
            mine = ako_tpu.decode(ours, device_entropy=False)[0]
            refm = oracle.ref_decode(ours)
            assert refm is not None and np.array_equal(mine, np.asarray(refm[0]).reshape(mine.shape)), (seed, s, "quirk self decode mismatch")
    except AssertionError as e:
        fails += 1
        print("FAIL", e, flush=True)
print(f"range {start}..{start+count}: {count - fails} ok, {fails} fail", flush=True)
sys.exit(1 if fails else 0)
