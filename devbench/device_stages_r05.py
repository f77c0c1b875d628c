"""Round-5 device-compute stage artifact: BOTH directions' fused
device program timings on the real chip (bench.measure_device_compute
— the same block bench.py embeds as `device_compute` in its JSON each
run). Writes devbench/DEVICE_STAGES_r05.json.

Usage: python devbench/device_stages_r05.py
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
OUT = os.path.join(HERE, "DEVICE_STAGES_r05.json")


def main() -> int:
    import numpy as np

    from bench import TILES, measure_device_compute, synth_images
    import ako_tpu

    rng = np.random.default_rng(42)
    img = synth_images(rng, 1)[0]
    settings = ako_tpu.Settings(quantization=16, tiles_dimension=TILES)
    rec = measure_device_compute(img, settings, reps=15)
    record = {
        "metric": (
            "single-chip device program stages, ms per 1024x1280 image "
            "(both directions, fetch floor subtracted, min of 15 — "
            "tunnel RPC noise is one-sided)"
        ),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "corpus": os.environ.get("AKO_BENCH_CORPUS", "fbm"),
        **rec,
    }
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record))
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
