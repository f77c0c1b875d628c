"""Rate-control differential campaign: random images x random ratios/
gates/wavelets, our encode_with_ratio blob vs the reference akoenc
binary's --dev-ratio output. Usage: rate_campaign.py START COUNT"""
import os, subprocess, sys, tempfile
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))); sys.path.insert(0, REPO)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from PIL import Image
import ako_tpu
from ako_tpu.tools.rate import encode_with_ratio

AKOENC = os.path.join(REPO, ".refbuild", "akoenc")
start, count = int(sys.argv[1]), int(sys.argv[2])
fails = 0
for seed in range(start, start + count):
    if seed % 10 == 0 and seed > start:
        jax.clear_caches()
    rng = np.random.default_rng(seed)
    w = int(rng.integers(16, 160)); h = int(rng.integers(16, 160))
    ch = int(rng.choice([1, 2, 3, 4]))
    if os.environ.get("AKO_CAMPAIGN_CORPUS") == "fbm":
        from ako_tpu.utils.corpus import photo
        img = photo(rng, h, w, ch)
    else:
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([
            np.clip(120 + 80*np.sin(x/float(rng.integers(5, 40)))
                    + 60*np.cos(y/float(rng.integers(5, 40)))
                    + rng.normal(0, 3, size=(h, w)), 0, 255)
            for _ in range(ch)], axis=-1).astype(np.uint8)
    ratio = int(rng.choice([2, 4, 8, 12, 24]))
    gate = int(rng.choice([0, 0, 8, 16]))
    wav = ako_tpu.Wavelet(int(rng.choice([0, 1, 2])))
    s = ako_tpu.Settings(gate=gate, wavelet=wav)
    with tempfile.TemporaryDirectory() as td:
        png = os.path.join(td, "t.png")
        mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[ch]
        Image.fromarray(img.squeeze() if ch == 1 else img, mode).save(png)
        out = os.path.join(td, "r.ako")
        wflag = {0: "dd137", 1: "cdf53", 2: "haar"}[int(wav)]
        r = subprocess.run([AKOENC, "-i", png, "-o", out, "-dev-r", str(ratio),
                            "-g", str(gate), "-w", wflag, "-quiet"],
                           capture_output=True)
        ref = open(out, "rb").read() if r.returncode == 0 else None
    try:
        ours, _q = encode_with_ratio(img, s, ratio)
    except ako_tpu.AkoError:
        ours = None
    if (ref is None) != (ours is None) or (ref is not None and ours != ref):
        fails += 1
        print(f"FAIL seed={seed} w={w} h={h} ch={ch} ratio={ratio} gate={gate} wav={wav}"
              f" ref={'None' if ref is None else len(ref)} ours={'None' if ours is None else len(ours)}",
              flush=True)
print(f"range {start}..{start+count}: {count - fails} ok, {fails} fail", flush=True)
sys.exit(1 if fails else 0)
