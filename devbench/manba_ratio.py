"""Compression-ratio comparison of the MANBAVARAN rANS extension vs
Kagari on the bench workload (per-settings blob sizes). Run on CPU:
python devbench/manba_ratio.py"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from bench import synth_images
import ako_tpu
from ako_tpu.core.settings import Compression, Settings

imgs = synth_images(np.random.default_rng(42), 3)
os.environ["AKO_TPU_MANBAVARAN"] = "1"
for q in (0, 16, 32):
    k = m = 0
    for img in imgs:
        k += len(ako_tpu.encode(img, Settings(quantization=q, tiles_dimension=128),
                                device_entropy=False))
        m += len(ako_tpu.encode(
            img, Settings(quantization=q, tiles_dimension=128,
                          compression=Compression.MANBAVARAN),
            device_entropy=False))
    print(f"q={q}: kagari={k}B manba={m}B manba/kagari={m/k:.4f} "
          f"(saves {100*(1-m/k):.1f}%)")
