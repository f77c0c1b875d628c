"""Weak-scaling efficiency of the multihost (DCN-tier) pipeline:
BASELINE configs[4]'s >=0.9 target, measured on CPU processes here and
runnable unchanged against real multi-host TPU pods.

Spawns N jax.distributed processes, each encoding+decoding its
round-robin shard of a FIXED-PER-PROCESS image stream (weak scaling:
total work = N * per-process work), timing the two directions
separately, and reports aggregate MP/s and efficiency vs the
1-process run per direction. Images are independent so the layout is
efficient by construction — the measurement validates the plumbing
overhead (coordinator bring-up excluded; only the steady-state stream
is timed in-process).

Core accounting: each process is pinned to a disjoint core set. When
N exceeds the physical cores (the 8-process point on this 4-core
host), processes share cores 2:1 and the point is marked
`oversubscribed`; its efficiency is computed against the CORE-LIMITED
ideal (baseline x physical cores) — i.e. it asserts the
jax.distributed plumbing loses nothing the cores could give, which is
the only honest weak-scaling claim a 4-core box can make about 8
processes. Real multi-host pods have per-host cores.

Usage: python devbench/scaling_multihost.py [max_procs] [--json OUT]
  --json writes the measurement record — the committed SCALING.json
  artifact backing PARITY.md's efficiency claim (BASELINE's >=0.9
  target, SURVEY.md §6).
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

#: images per process per pass (weak scaling unit)
PER_PROC = 12

WORKER = r"""
import os, pickle, sys, time
sys.path.insert(0, %(repo)r)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
coord, nproc, pid, outfile, mode = sys.argv[1:6]
nproc, pid = int(nproc), int(pid)
import numpy as np
from ako_tpu.parallel import multihost
import ako_tpu

if mode == "dist":
    multihost.initialize(coordinator_address=coord, num_processes=nproc,
                         process_id=pid)
rng = np.random.default_rng(7)
# weak scaling: nproc * PER_PROC images total, round-robin shard -> each
# process encodes PER_PROC images regardless of nproc. 12 keeps the
# steady-state stream long enough that the coordinator service's
# cycle-stealing (process 0 hosts it, and every core is pinned busy)
# amortizes the way it does on real pods
PER_PROC = %(per_proc)d
images = [(rng.integers(0, 256, size=(256, 256, 3)) // 4 * 4).astype(np.uint8)
          for _ in range(nproc * PER_PROC)]
settings = ako_tpu.Settings(quantization=16, tiles_dimension=64)

if mode == "dist":
    pipe = multihost.HostShardedPipeline(settings, workers=2)
    enc_pass = lambda: dict(pipe.encode_shard(images))

    def dec_pass(blobs):
        # decode_shard takes the GLOBALLY-indexed blob list and picks
        # this process's round-robin share — place our blobs at their
        # global positions (the earlier form handed it our own shard,
        # which it re-sharded: each process decoded only 1/nproc of
        # its blobs and the decode direction read superlinear)
        glist = [b""] * len(images)
        for g, b in blobs.items():
            glist[g] = b
        return dict(pipe.decode_shard(glist))
else:
    # control: the same per-process work WITHOUT jax.distributed —
    # the contention baseline that separates plumbing overhead from
    # shared-box effects (cores/LLC/memory bandwidth, turbo)
    from ako_tpu.runtime.executor import PipelineDecoder, PipelineEncoder

    mine = images[pid::nproc]
    enc_pass = lambda: dict(
        zip(range(pid, len(images), nproc),
            PipelineEncoder(settings, workers=2).encode_iter(iter(mine)))
    )
    dec_pass = lambda blobs: dict(
        zip(sorted(blobs),
            PipelineDecoder(workers=2).decode_iter(
                iter([blobs[g] for g in sorted(blobs)])))
    )

# warm-up / compile, both directions
dec_pass(enc_pass())
t0 = time.perf_counter()
blobs = enc_pass()
t_enc = time.perf_counter() - t0
t0 = time.perf_counter()
outs = dec_pass(blobs)
t_dec = time.perf_counter() - t0
assert len(outs) == len(blobs) == PER_PROC
mp = sum(images[g].shape[0] * images[g].shape[1] for g in blobs) / 1e6
with open(outfile, "wb") as f:
    pickle.dump({"pid": pid, "t_enc": t_enc, "t_dec": t_dec, "mp": mp,
                 "n": len(blobs)}, f)
""" % {"repo": REPO, "per_proc": PER_PROC}


def _cores_for(pid: int, per: int) -> str:
    """Disjoint core set per process — and the SAME budget for the
    1-process baseline: on one physical machine the processes
    otherwise contend for cores (or the baseline gets them all) and
    the measurement reads as pipeline inefficiency. With
    nproc * per > cpu_count the modulo wraps and cores are shared
    (the oversubscribed point). Real multi-host pods have per-host
    cores."""
    ncores = os.cpu_count() or 1
    lo = (pid * per) % ncores
    return ",".join(str((lo + i) % ncores) for i in range(per))


def run(nproc: int, per_cores: int, mode: str = "dist") -> dict:
    """One pod run; returns aggregate MP/s per direction. Wall time is
    max-over-processes (the slowest process bounds the pod). mode
    "ctl" runs the same per-process work without jax.distributed (the
    contention control)."""
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
                + [sys.executable, script, coord, str(nproc), str(p),
                   outs[p], mode],
                env=env, cwd=REPO,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            for p in range(nproc)
        ]
        for p in procs:
            assert p.wait(timeout=900) == 0, f"worker rc={p.returncode}"
        recs = [pickle.load(open(o, "rb")) for o in outs]
    total_mp = sum(r["mp"] for r in recs)
    return {
        "enc": total_mp / max(r["t_enc"] for r in recs),
        "dec": total_mp / max(r["t_dec"] for r in recs),
        "tot": total_mp / max(r["t_enc"] + r["t_dec"] for r in recs),
    }


#: repetitions per point; best-of per direction. Wall time is
#: max-over-processes, so a single OS-jitter stall in any one process
#: drags the whole point — best-of-REPS reads through it.
REPS = 3


def run_best_pair(nproc: int, per_cores: int) -> tuple:
    """(dist, ctl) best-of-REPS, the reps INTERLEAVED between the two
    modes — host thermal/cache state drifts on minute scales, and a
    block of dist reps followed by a block of ctl reps reads that
    drift as plumbing (in)efficiency (CLAUDE.md: compare configs only
    via interleaved repeats)."""
    runs = {"dist": [], "ctl": []}
    for _ in range(REPS):
        for mode in ("dist", "ctl"):
            runs[mode].append(run(nproc, per_cores, mode))
    best = lambda mode: {
        k: max(r[k] for r in runs[mode]) for k in ("enc", "dec", "tot")
    }
    return best("dist"), best("ctl")


def run_best(nproc: int, per_cores: int, mode: str = "dist") -> dict:
    runs = [run(nproc, per_cores, mode) for _ in range(REPS)]
    return {k: max(r[k] for r in runs) for k in ("enc", "dec", "tot")}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
        args = [a for a in args if a != json_out]
    max_procs = int(args[0]) if args else 2
    ncores = os.cpu_count() or 1
    per_cores = max(1, ncores // min(max_procs, ncores))
    base = run_best(1, per_cores)
    print(
        f"1 proc ({per_cores} cores): enc {base['enc']:.2f} "
        f"dec {base['dec']:.2f} MP/s"
    )
    over_any = max_procs * per_cores > ncores
    record = {
        # the caveat lives in the metric string itself (VERDICT r4
        # weak-3): this box has `ncores` physical cores, so any point
        # beyond that runs 2+ processes per core and its RAW efficiency
        # measures core sharing, not plumbing — the honest raw claim is
        # the headline (largest non-oversubscribed) row below
        "metric": (
            "multihost weak-scaling efficiency (jax.distributed, core-pinned"
            + (
                "; points beyond %d processes are OVERSUBSCRIBED on %d "
                "physical cores — raw efficiency there measures core "
                "sharing, judge those rows by plumbing efficiency only"
                % (ncores // per_cores, ncores)
                if over_any
                else ""
            )
            + ")"
        ),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "physical_cores": ncores,
        "cores_per_process": per_cores,
        "per_process_images": PER_PROC,
        "reps_best_of": REPS,
        "baseline_1proc_mps": {k: round(v, 3) for k, v in base.items()},
        "points": [],
    }
    meets = True
    meets_raw = True  # raw >=0.9 gate over NON-oversubscribed points
    n = 2
    while n <= max_procs:
        res, ctl = run_best_pair(n, per_cores)
        over = n * per_cores > ncores
        # an oversubscribed point cannot beat the cores it shares:
        # judge it against the core-limited ideal instead of n x base
        ideal_procs = min(n, ncores // per_cores) if over else n
        point = {"processes": n, "oversubscribed": over}
        for k in ("enc", "dec", "tot"):
            eff = res[k] / (base[k] * ideal_procs)
            # plumbing efficiency: distributed vs the SAME N processes
            # running independently on the same cores — isolates the
            # jax.distributed/pipeline overhead from this single box's
            # shared-resource contention (LLC/memory bandwidth/turbo),
            # which real per-host pods don't have. The >=0.9 gate
            # applies to this ratio; raw end-to-end is reported too.
            peff = res[k] / ctl[k] if ctl[k] > 0 else 0.0
            point[f"{k}_mps"] = round(res[k], 3)
            point[f"{k}_independent_mps"] = round(ctl[k], 3)
            point[f"{k}_efficiency"] = round(eff, 3)
            point[f"{k}_plumbing_efficiency"] = round(peff, 3)
            if k in ("enc", "dec"):
                meets = meets and peff >= 0.9
                if not over:
                    meets_raw = meets_raw and eff >= 0.9
        print(
            f"{n} procs{' (oversubscribed)' if over else ''}: "
            f"enc {res['enc']:.2f} MP/s (eff {point['enc_efficiency']:.2f}, "
            f"plumbing {point['enc_plumbing_efficiency']:.2f}), "
            f"dec {res['dec']:.2f} MP/s (eff {point['dec_efficiency']:.2f}, "
            f"plumbing {point['dec_plumbing_efficiency']:.2f})"
        )
        record["points"].append(point)
        n *= 2
    if json_out:
        record["target_efficiency"] = 0.9
        # headline: the largest point whose RAW numbers are a fair
        # weak-scaling measurement on this box (no core sharing)
        non_over = [p for p in record["points"] if not p["oversubscribed"]]
        if non_over:
            record["headline"] = non_over[-1]
        record["meets_target_raw_non_oversubscribed"] = meets_raw
        record["meets_target_plumbing"] = meets
        record["meets_target"] = meets and meets_raw
        with open(json_out, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
        print(f"wrote {json_out}")
        if not meets:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
