#!/usr/bin/env python
"""B=16 @ 4k batch-scaling probe (one targeted sweep, then stop).

BENCH.md records B=16@4k = 121.4 bags/s < B=8's 134.2 — sublinear.  Hypotheses
worth one experiment each (VERDICT r3 item 6): the bwd grid order picked from
per-program HBM traffic may flip at B=16's scheduling pressure; the 13 MB bwd
soft-VMEM budget may erode double-buffering slack when 2x the programs contend;
and XLA's latency-hiding scheduler flag may re-order the dispatch stream.

Each variant is a fresh subprocess (one TPU client at a time through the
tunnel) running ``bench.py --fixdim 4096 --batch_size {8,16}`` with the env
overrides honored by ``sml_tpu/ops/pallas/deform_attn.py``.  Appends to
benchmarks/batch_scaling.json after every run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    # (tag, batch, env)
    ("B8_tuned", 8, {}),
    ("B16_tuned", 16, {}),
    ("B16_order_rs", 16, {"SML_TPU_CPB_BWD_ORDER": "rs"}),
    ("B16_vmem10", 16, {"SML_TPU_VMEM_BWD_MB": "10"}),
    ("B16_vmem14", 16, {"SML_TPU_VMEM_BWD_MB": "14"}),
    ("B16_lhs", 16, {"XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=true"}),
    # r5: the local jaxlib rejects the flag at XLA_FLAGS parse time, but
    # per-compile compiler_options ride the compile RPC to the REMOTE
    # compiler (bench.py SML_TPU_XLA_OPTS) — probe both polarities to learn
    # the default AND the effect.
    ("B16_lhs_on", 16, {"SML_TPU_XLA_OPTS":
                        '{"xla_tpu_enable_latency_hiding_scheduler": "true"}'}),
    ("B16_lhs_off", 16, {"SML_TPU_XLA_OPTS":
                         '{"xla_tpu_enable_latency_hiding_scheduler": "false"}'}),
    ("B8_lhs_on", 8, {"SML_TPU_XLA_OPTS":
                      '{"xla_tpu_enable_latency_hiding_scheduler": "true"}'}),
]


def main():
    out_path = os.path.join(REPO, "benchmarks", "batch_scaling.json")
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    only = set(sys.argv[1:])
    for tag, batch, env in VARIANTS:
        if only and tag not in only:
            continue
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--fixdim", "4096", "--batch_size", str(batch), "--steps", "20"]
        print(f"== {tag}: env={env}", flush=True)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  cwd=REPO, timeout=3000,
                                  env={**os.environ, **env})
        except subprocess.TimeoutExpired:
            print("  TIMEOUT", flush=True)
            continue
        line = None
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = json.loads(ln)
        if line is None:
            print(f"  FAILED rc={proc.returncode}:\n{proc.stderr[-600:]}",
                  flush=True)
            results[tag] = {"error": proc.stderr[-300:]}
        else:
            results[tag] = {"bags_per_sec": line["value"], "env": env,
                            "batch": batch}
            print(f"  {line['value']} bags/s", flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    print("FINAL " + json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
