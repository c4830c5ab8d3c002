#!/usr/bin/env python
"""Serving-path benchmark sweep (VERDICT r3 item 9): jitted batched eval
forward for every mode, plus B=1 single-slide latency for the flagship.

Runs bench.py in sequential subprocesses (one TPU client at a time through the
axon tunnel), collects the JSON lines into benchmarks/serving_bench.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNS = [
    # (tag, extra bench.py args)
    ("deformpathomic_2500_B8", ["--mode", "deformpathomic", "--fixdim", "2500"]),
    ("deformpathomic_4096_B8", ["--mode", "deformpathomic", "--fixdim", "4096"]),
    ("deformpathomic_2500_B1", ["--mode", "deformpathomic", "--fixdim", "2500",
                                "--batch_size", "1"]),
    ("deformpathomic_4096_B1", ["--mode", "deformpathomic", "--fixdim", "4096",
                                "--batch_size", "1"]),
    ("cmta_2500_B8", ["--mode", "cmta", "--fixdim", "2500"]),
    ("mcat_2500_B8", ["--mode", "mcat", "--fixdim", "2500"]),
    ("transmil_2500_B8", ["--mode", "path", "--path_arch", "transmil",
                          "--fixdim", "2500"]),
    ("abmil_2500_B8", ["--mode", "path", "--fixdim", "2500"]),
    ("pathomic_2500_B8", ["--mode", "pathomic", "--fixdim", "2500"]),
    ("omic_B8", ["--mode", "omic", "--fixdim", "64"]),
]


def main():
    out_path = os.path.join(REPO, "benchmarks", "serving_bench.json")
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    only = set(sys.argv[1:])
    for tag, extra in RUNS:
        if only and tag not in only:
            continue
        cmd = [sys.executable, os.path.join(REPO, "bench.py"), "--eval",
               "--steps", "30"] + extra
        print(f"== {tag}: {' '.join(cmd[1:])}", flush=True)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                                  timeout=3000)
        except subprocess.TimeoutExpired as e:
            # remote compiles are 1-5 min per shape; record the timeout and keep
            # sweeping instead of aborting the remaining tags
            print(f"  TIMEOUT after {e.timeout}s — skipping {tag}", flush=True)
            results[tag] = {"error": f"timeout after {e.timeout}s"}
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)
            continue
        line = None
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = json.loads(ln)
        if line is None:
            print(f"  FAILED rc={proc.returncode}:\n{proc.stderr[-800:]}",
                  flush=True)
            continue
        line["batch_ms"] = round(1000.0 * line_batch(extra) / line["value"], 2) \
            if line["value"] else None
        results[tag] = line
        print("  " + json.dumps(line), flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    print("FINAL " + json.dumps(results, indent=1))


def line_batch(extra):
    return int(extra[extra.index("--batch_size") + 1]) \
        if "--batch_size" in extra else 8


if __name__ == "__main__":
    main()
