"""Build akort.c under ASan+UBSan and fuzz its untrusted-input parsers.

Writes devbench/ASAN_r04.json. See asan_fuzz.c for the corpus design
(the C driver mirrors tests/campaigns/fuzz_campaign.py's classes:
valid encoder output, truncations, bit flips, garbage — plus hostile
count/capacity combinations against redzone-exact buffers).

Usage: python devbench/asan_fuzz.py [iters]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SRC = os.path.join(REPO, "ako_tpu", "runtime", "native", "akort.c")
DRIVER = os.path.join(HERE, "asan_fuzz.c")
BIN = os.path.join(HERE, ".asan_fuzz")
OUT = os.path.join(HERE, os.environ.get("AKO_ASAN_OUT", "ASAN_r05.json"))


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    cc = os.environ.get("CC", "cc")
    build = subprocess.run(
        [
            cc,
            "-O1",
            "-g",
            "-fsanitize=address,undefined",
            "-fno-sanitize-recover=all",
            "-fno-omit-frame-pointer",
            SRC,
            DRIVER,
            "-lm",
            "-o",
            BIN,
        ],
        capture_output=True,
        text=True,
    )
    if build.returncode != 0:
        print(build.stderr, file=sys.stderr)
        return 1
    env = dict(os.environ, ASAN_OPTIONS="abort_on_error=1:detect_leaks=1")
    run = subprocess.run(
        [BIN, str(iters)], capture_output=True, text=True, env=env
    )
    record = {
        "tool": "asan+ubsan (-fno-sanitize-recover=all, leaks on)",
        "source": "ako_tpu/runtime/native/akort.c + devbench/asan_fuzz.c",
        "returncode": run.returncode,
        "clean": run.returncode == 0,
    }
    if run.returncode == 0:
        record.update(json.loads(run.stdout.strip().splitlines()[-1]))
    else:
        record["stderr_tail"] = run.stderr[-4000:]
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record))
    return run.returncode


if __name__ == "__main__":
    sys.exit(main())
