"""Stream profile: encode vs decode stream time, plus stage costs."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import synth_images, STREAM_N, W, H, TILES, MEGAPIXELS
import ako_tpu
from ako_tpu.runtime.executor import PipelineDecoder, PipelineEncoder

rng = np.random.default_rng(42)
images = synth_images(rng, STREAM_N)
settings = ako_tpu.Settings(quantization=16, tiles_dimension=TILES)
enc = PipelineEncoder(settings, workers=4)
dec = PipelineDecoder(workers=4)

blobs = enc.encode_batch(images)
outs = list(dec.decode_iter(blobs))
print("compressed MB/img:", sum(len(b) for b in blobs) / len(blobs) / 1e6)

for r in range(3):
    t0 = time.perf_counter(); blobs = enc.encode_batch(images); t_enc = time.perf_counter() - t0
    t0 = time.perf_counter(); outs = list(dec.decode_iter(blobs)); t_dec = time.perf_counter() - t0
    n = STREAM_N
    print(f"run {r}: enc {t_enc/n*1e3:.0f} ms/img ({n*MEGAPIXELS/t_enc:.2f} MP/s)  "
          f"dec {t_dec/n*1e3:.0f} ms/img ({n*MEGAPIXELS/t_dec:.2f} MP/s)  "
          f"e2e {n*MEGAPIXELS/(t_enc+t_dec):.2f} MP/s")
