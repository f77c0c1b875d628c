"""Interleaved A/B of the coalesced device-entropy encode
(AKO_ENC_COALESCE) on the live tunnel: the round-4 best device config
(roundtrip+hostdec+enctr) at group sizes 1/4/6, vs the single-core
reference on the same stream. CLAUDE.md: configs compare ONLY via
interleaved repeated medians.

Usage: python devbench/coalesce_ab.py [rounds]
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    os.environ.setdefault("AKO_TPU_DECODE", "host")
    os.environ.setdefault("AKO_TPU_TRANSPORT_ENC", "1")
    os.environ.setdefault("AKO_TPU_TRANSPORT", "0")

    from bench import (
        STREAM_N,
        bench_ours,
        bench_ours_roundtrip,
        bench_ref,
        synth_images,
    )
    import ako_tpu

    mode = os.environ.get("AKO_AB_MODE", "roundtrip")
    bench_ours_roundtrip = (
        bench_ours if mode == "seq" else bench_ours_roundtrip
    )
    rng = np.random.default_rng(42)
    images = synth_images(rng, STREAM_N)
    settings = ako_tpu.Settings(quantization=16, tiles_dimension=128)

    configs = os.environ.get("AKO_AB_KS", "1,4,6").split(",")
    times = {c: [] for c in configs}
    ref_times = []

    # warm all program shapes + caches once per config
    for c in configs:
        os.environ["AKO_ENC_COALESCE"] = c
        t0 = time.perf_counter()
        bench_ours_roundtrip(images, settings, warm=False)
        print(f"warm k={c}: {time.perf_counter() - t0:.2f}s", flush=True)
    bench_ref(images, settings, warm=True)

    for r in range(rounds):
        for c in configs:
            os.environ["AKO_ENC_COALESCE"] = c
            t, blobs, outs = bench_ours_roundtrip(images, settings, warm=False)
            times[c].append(t)
            print(f"round {r} k={c}: {t:.3f}s", flush=True)
        t, _, _ = bench_ref(images, settings, warm=False)
        ref_times.append(t)
        print(f"round {r} ref: {t:.3f}s", flush=True)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    print("--- medians ---")
    for c in configs:
        print(f"k={c}: {med(times[c]):.3f}s")
    print(f"ref: {med(ref_times):.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
