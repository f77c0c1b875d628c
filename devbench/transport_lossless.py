"""Cost model for lossless transport-compression of the decode-side
pixel DOWNLOAD (the tunnel compresses uploads in flight but downloads
not at all — CLAUDE.md). Candidate: the device re-encodes decoded
pixels losslessly (forward lift + Kagari pack, both already on device),
the host fetches ~2x fewer bytes and unpacks with the CPU decoder.

CPU-measurable halves (run anywhere):
  - transport ratio: lossless blob size of a q16-DECODED bench image
  - host unpack cost: full host-path decode of that lossless blob

Measured 2026-08-18 (4-core host): ratio 2.17:1 (3.93 -> 1.81 MB),
host unpack 131 ms/img. At 40 MB/s shared link that trades 53 ms of
link for 131 ms of overlappable host work => ~+20% stream throughput
IF the link is NOT full-duplex and host cores are free. If the link IS
full-duplex (roundtrip_iter overlapping encode-up with decode-down),
the uplink becomes binding and this gains nothing unless uploads are
also self-compressed (only ~0.6 MB effective there — the tunnel
already zstd's uploads ~1.6x). Decide after devbench/link_duplex.py.

IMPLEMENTED (opt-in) as runtime/transport.py: AKO_TPU_TRANSPORT=1
re-encodes decoded tiles at CDF53/q0 on device and unpacks on a
CPU-pinned program. A wavelet sweep on the same image picked CDF53
(2.34 MB, ~190 ms loaded-host unpack) over DD137 (2.21 MB, 464 ms)
and Haar (2.92 MB, 90 ms). This script remains the cost-model
measurement for re-deciding the default.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("AKO_CPU"):
    jax.config.update("jax_platforms", "cpu")

import bench
import ako_tpu

rng = np.random.default_rng(42)
img = bench.synth_images(rng, 1)[0]
s = ako_tpu.Settings(quantization=16, tiles_dimension=bench.TILES)
blob = ako_tpu.encode(img, s)
dec, _, _ = ako_tpu.decode(blob)
print(f"q16 blob {len(blob)/1e6:.2f} MB; raw RGB {img[:, :, :3].nbytes/1e6:.2f} MB")

s0 = ako_tpu.Settings(quantization=0, tiles_dimension=bench.TILES)
blob0 = ako_tpu.encode(dec[:, :, :3], s0)
print(
    f"lossless transport blob {len(blob0)/1e6:.2f} MB "
    f"(ratio {img[:, :, :3].nbytes/len(blob0):.2f}:1)"
)

for rep in range(3):
    t0 = time.perf_counter()
    back, _, _ = ako_tpu.decode(blob0, device_entropy=False)
    print(f"host unpack rep {rep}: {(time.perf_counter()-t0)*1e3:.1f} ms")
assert np.array_equal(back, dec[:, :, :3])
