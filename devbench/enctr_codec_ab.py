"""Interleaved A/B of the encode-transport uplink codec (rANS vs
Kagari): times upload_tiles_packed (native pack + uplink + device
entropy decode + unlift) end-to-end on the bench tile batch, plus the
packed byte volume. Run on the real TPU."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
import numpy as np
from bench import synth_images
from ako_tpu.runtime import transport

img = synth_images(np.random.default_rng(42), 1)[0]
# bench shape: 80 tiles of 128x128, alpha elided -> 3 channels
tiles = np.stack([img[y:y+128, x:x+128, :3]
                  for y in range(0, 1280, 128) for x in range(0, 1024, 128)])
print("batch:", tiles.shape)

def run(codec):
    os.environ["AKO_TPU_TRANSPORT_ENC_CODEC"] = codec
    t0 = time.perf_counter()
    dev = transport.upload_tiles_packed(tiles)
    assert dev is not None
    out = np.asarray(dev[:1, :1, :1])  # force completion through the tunnel
    return time.perf_counter() - t0

for codec in ("rans", "kagari"):
    run(codec)  # warm compiles
times = {"rans": [], "kagari": []}
for rep in range(5):
    for codec in ("rans", "kagari"):
        times[codec].append(run(codec))
for codec, ts in times.items():
    ts = sorted(ts)
    print(f"{codec}: median {ts[len(ts)//2]*1e3:.0f} ms  all {[f'{t*1e3:.0f}' for t in ts]}")
# byte volumes
from ako_tpu.ops.quantization import level_qg
from ako_tpu.core import geometry
from ako_tpu.runtime.hostcodec import tile_encode_stream
from ako_tpu.runtime.kagari import kagari_encode, manba_encode
from ako_tpu.runtime.transport import _WAVELET, _WRAP, _COLOR
qg = level_qg(geometry.lift_schedule(128,128), 3, 0, 0, 1)
tds = geometry.tile_data_size(128,128)*3
k = m = 0
for t in tiles:
    v = tile_encode_stream(t, _WAVELET, _WRAP, _COLOR, qg)
    k += len(kagari_encode(v, tds)); m += len(manba_encode(v, tds))
print(f"uplink bytes/img: kagari={k} rans={m} ({m/k:.3f})")
