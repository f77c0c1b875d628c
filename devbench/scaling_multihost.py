"""Weak-scaling efficiency of the multihost (DCN-tier) pipeline:
BASELINE configs[4]'s >=0.9 target, measured on CPU processes here and
runnable unchanged against real multi-host TPU pods.

Spawns N jax.distributed processes, each encoding+decoding its
round-robin shard of a FIXED-PER-PROCESS image stream (weak scaling:
total work = N * per-process work), and reports aggregate MP/s and
efficiency vs the 1-process run. Images are independent so the layout
is efficient by construction — the measurement validates the plumbing
overhead (coordinator bring-up excluded; only the steady-state stream
is timed in-process).

Usage: python devbench/scaling_multihost.py [max_procs] [--json OUT]
  --json writes the measurement record (per-N aggregate MP/s and
  efficiency vs the core-pinned 1-process baseline) as one JSON
  object — the committed SCALING.json artifact backing PARITY.md's
  efficiency claim (BASELINE's >=0.9 target, SURVEY.md §6).
"""
import json
import os
import pickle
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import os, pickle, sys, time
sys.path.insert(0, %(repo)r)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
coord, nproc, pid, outfile = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
import numpy as np
from ako_tpu.parallel import multihost
import ako_tpu

multihost.initialize(coordinator_address=coord, num_processes=nproc, process_id=pid)
rng = np.random.default_rng(7)
# weak scaling: nproc * PER_PROC images total, round-robin shard -> each
# process encodes PER_PROC images regardless of nproc
PER_PROC = 6
images = [(rng.integers(0, 256, size=(256, 256, 3)) // 4 * 4).astype(np.uint8)
          for _ in range(nproc * PER_PROC)]
settings = ako_tpu.Settings(quantization=16, tiles_dimension=64)
pipe = multihost.HostShardedPipeline(settings, workers=2)

dict(pipe.encode_shard(images))  # warm-up / compile
t0 = time.perf_counter()
blobs = dict(pipe.encode_shard(images))
outs = dict(pipe.decode_shard([b for _, b in sorted(blobs.items())]))
t = time.perf_counter() - t0
mp = sum(images[g].shape[0] * images[g].shape[1] for g in blobs) / 1e6
with open(outfile, "wb") as f:
    pickle.dump({"pid": pid, "t": t, "mp": mp, "n": len(blobs)}, f)
""" % {"repo": REPO}


def _cores_for(pid: int, per: int) -> str:
    """Disjoint core set per process — and the SAME budget for the
    1-process baseline: on one physical machine the processes
    otherwise contend for cores (or the baseline gets them all) and
    the measurement reads as pipeline inefficiency. Real multi-host
    pods have per-host cores."""
    ncores = os.cpu_count() or 1
    lo = (pid * per) % ncores
    return ",".join(str((lo + i) % ncores) for i in range(per))


def run(nproc: int, per_cores: int) -> float:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    import shutil

    taskset = shutil.which("taskset")
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "worker.py")
        open(script, "w").write(WORKER)
        outs = [os.path.join(td, f"o{p}.pkl") for p in range(nproc)]
        procs = [
            subprocess.Popen(
                ([taskset, "-c", _cores_for(p, per_cores)] if taskset else [])
                + [sys.executable, script, coord, str(nproc), str(p), outs[p]],
                env=env, cwd=REPO,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            for p in range(nproc)
        ]
        for p in procs:
            assert p.wait(timeout=600) == 0, f"worker rc={p.returncode}"
        recs = [pickle.load(open(o, "rb")) for o in outs]
    total_mp = sum(r["mp"] for r in recs)
    wall = max(r["t"] for r in recs)  # slowest process bounds the pod
    return total_mp / wall


#: repetitions per point, interleaved across N; best-of wins. Wall
#: time is max-over-processes, so a single OS-jitter stall in any one
#: process drags the whole point — best-of-REPS reads through it.
REPS = 3


def run_best(nproc: int, per_cores: int) -> float:
    return max(run(nproc, per_cores) for _ in range(REPS))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
        args = [a for a in args if a != json_out]
    max_procs = int(args[0]) if args else 2
    per_cores = max(1, (os.cpu_count() or 1) // max_procs)
    base = run_best(1, per_cores)
    print(f"1 proc ({per_cores} cores): {base:.2f} MP/s")
    record = {
        "metric": "multihost weak-scaling efficiency (jax.distributed, core-pinned)",
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "cores_per_process": per_cores,
        "per_process_images": 6,
        "reps_best_of": REPS,
        "baseline_1proc_mps": round(base, 3),
        "points": [],
    }
    n = 2
    while n <= max_procs:
        mps = run_best(n, per_cores)
        eff = mps / (base * n)
        print(f"{n} procs: {mps:.2f} MP/s aggregate, efficiency {eff:.2f}")
        record["points"].append(
            {"processes": n, "aggregate_mps": round(mps, 3), "efficiency": round(eff, 3)}
        )
        n *= 2
    if json_out:
        record["target_efficiency"] = 0.9
        record["meets_target"] = all(
            p["efficiency"] >= 0.9 for p in record["points"]
        )
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {json_out}")
        if not record["meets_target"]:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
