#!/usr/bin/env python
"""Per-shape TRAIN benchmark sweep (VERDICT r4 item 8): run bench.py at the
2500 / 4096 / 16384 flagship train shapes and record the FULL emitted line —
bags/s/chip, mfu_total (XLA-visible + hand-counted Pallas FLOPs), mfu_xla,
and the A100-roofline ratios — into benchmarks/train_shapes.json, so the
training MFU/roofline numbers exist per shape in an artifact the way
serving_bench.json's already do.

One bench.py subprocess per shape (fresh TPU client each; remote compiles are
1-5 min per program shape, so failures/timeouts are recorded and the sweep
continues).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNS = [
    ("deformpathomic_2500_b8", ["--fixdim", "2500", "--batch_size", "8"]),
    ("deformpathomic_4096_b8", ["--fixdim", "4096", "--batch_size", "8"]),
    ("deformpathomic_16384_b2", ["--fixdim", "16384", "--batch_size", "2"]),
]


def main():
    out_path = os.path.join(REPO, "benchmarks", "train_shapes.json")
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    only = set(sys.argv[1:])
    for tag, extra in RUNS:
        if only and tag not in only:
            continue
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--steps", "20"] + extra
        print(f"== {tag}: {' '.join(cmd[1:])}", flush=True)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  cwd=REPO, timeout=3000)
        except subprocess.TimeoutExpired as e:
            print(f"  TIMEOUT after {e.timeout}s — skipping {tag}", flush=True)
            results[tag] = {"error": f"timeout after {e.timeout}s"}
            json.dump(results, open(out_path, "w"), indent=2)
            continue
        line = None
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = json.loads(ln)
        if line is None:
            print(f"  FAILED rc={proc.returncode}:\n{proc.stderr[-800:]}",
                  flush=True)
            results[tag] = {"error": f"rc={proc.returncode}"}
        else:
            print(f"  {json.dumps(line)}", flush=True)
            results[tag] = line
        json.dump(results, open(out_path, "w"), indent=2)


if __name__ == "__main__":
    main()
