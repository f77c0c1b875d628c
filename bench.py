"""Benchmark: encode+decode megapixels/s on the north-star workload
(1024x1280 RGBA, q=16), bit-exact vs the reference, with the reference
C library (same image, single CPU core) as the baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent XLA compile cache: first bench run per program pays the
# (tunneled) compile; later runs start warm.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
)

W, H, CH = 1024, 1280, 4
MEGAPIXELS = W * H / 1e6
REPEATS = 5
# 256x256 tiles: the codec's natural TPU mapping (one compiled program,
# tiles batched; entropy blocks independent). Identical settings are
# passed to the reference, so output remains byte-comparable.
TILES = 256


def synth_image(rng) -> np.ndarray:
    """Photograph-like content: smooth gradients + structure + noise,
    so quantized coefficient statistics (and Kagari run lengths) are
    realistic rather than pathological."""
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (
        110
        + 70 * np.sin(x / 97.0)
        + 60 * np.cos(y / 61.0)
        + 40 * np.sin((x + y) / 151.0)
    )
    img = np.zeros((H, W, CH), np.float32)
    img[..., 0] = base
    img[..., 1] = base * 0.8 + 30 * np.cos(x / 41.0)
    img[..., 2] = base * 0.6 + 50 * np.sin(y / 83.0)
    img[..., 3] = 255.0
    img += rng.normal(0, 6.0, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


def bench_ours(image, settings) -> tuple[float, bytes]:
    import ako_tpu

    blob = ako_tpu.encode(image, settings)  # warm-up / compile
    out, _, _ = ako_tpu.decode(blob)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        blob = ako_tpu.encode(image, settings)
        out, _, _ = ako_tpu.decode(blob)
        best = min(best, time.perf_counter() - t0)
    return best, blob, out


def bench_ref(image, settings) -> tuple[float, bytes]:
    from tests import oracle
    from ako_tpu.encode import checked_settings

    s = checked_settings(settings)
    blob = oracle.ref_encode(image, s)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        blob = oracle.ref_encode(image, s)
        img, _ = oracle.ref_decode(blob)
        best = min(best, time.perf_counter() - t0)
    return best, blob, img


def main() -> int:
    import ako_tpu

    rng = np.random.default_rng(42)
    image = synth_image(rng)
    settings = ako_tpu.Settings(quantization=16, tiles_dimension=TILES)

    t_ours, blob_ours, img_ours = bench_ours(image, settings)
    mps = MEGAPIXELS / t_ours

    vs_baseline = 0.0
    try:
        t_ref, blob_ref, img_ref = bench_ref(image, settings)
        if blob_ours != blob_ref or not np.array_equal(img_ours, img_ref):
            print(
                json.dumps(
                    {
                        "metric": "encode+decode MP/s (1024x1280 RGBA q16)",
                        "value": 0.0,
                        "unit": "MP/s",
                        "vs_baseline": 0.0,
                        "error": "NOT bit-exact vs reference",
                    }
                )
            )
            return 1
        vs_baseline = (MEGAPIXELS / t_ours) / (MEGAPIXELS / t_ref)
    except Exception:
        pass  # reference unavailable: report absolute number only

    print(
        json.dumps(
            {
                "metric": "encode+decode MP/s (1024x1280 RGBA q16, bit-exact)",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
