"""Extended differential campaign: run test_differential's full
contract over a fresh seed range. Usage: diff_campaign.py START COUNT"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8").strip()
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import ako_tpu
from tests import oracle
from tests.test_differential import _random_case

start, count = int(sys.argv[1]), int(sys.argv[2])
fails = 0
for seed in range(start, start + count):
    if seed % 20 == 0 and seed > start:
        # every random case compiles fresh tile-shape programs; LLVM's
        # JIT mappings accumulate until mmap fails (SIGSEGV) — drop the
        # executable caches periodically to bound them
        jax.clear_caches()
        nmaps = sum(1 for _ in open(f"/proc/{os.getpid()}/maps"))
        print(f"seed {seed}: {nmaps} maps", flush=True)
    rng = np.random.default_rng(seed)
    img, s = _random_case(rng)
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
