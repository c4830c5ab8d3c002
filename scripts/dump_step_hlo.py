#!/usr/bin/env python
"""Compile the flagship train step on the live device and dump the optimized
HLO (post-XLA-fusion) plus cost analysis.  Used to locate the non-Pallas
milliseconds of the 4k step: large fusions, scatters, transposes, f32
materializations that component bisects can't see.

Writes <out>.hlo.txt (optimized module) and prints a summary: every fusion /
custom-call sorted by output bytes, with opcode histogram.
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--fixdim", type=int, default=4096)
    ap.add_argument("--out", default="/tmp/step4k")
    ap.add_argument("--platform", default=None,
                    help="cpu to dump the CPU lowering instead of the device")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from __graft_entry__ import _example_batch
    from sml_tpu.config import Config
    from sml_tpu.models.factory import define_net, define_optimizer, init_model
    from sml_tpu.train.state import TrainState
    from sml_tpu.train.steps import make_train_step

    config = Config(mode="deformpathomic", task_type="diag2021",
                    fixdim=args.fixdim, batch_size=args.batch_size,
                    use_pallas=True, compute_dtype="bfloat16",
                    gradient_modulate=True, return_vgrid=True)
    model = define_net(config)
    batch = _example_batch(config, args.batch_size)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    tx = define_optimizer(config, steps_per_epoch=100)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(config, model, tx, jit=False))

    lowered = step.lower(state, batch)
    compiled = lowered.compile()

    txt = compiled.as_text()
    hlo_path = args.out + ".hlo.txt"
    with open(hlo_path, "w") as f:
        f.write(txt)
    print("optimized HLO ->", hlo_path, f"({len(txt) / 1e6:.1f} MB)")

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        with open(args.out + ".cost.json", "w") as f:
            json.dump({k: float(v) for k, v in ca.items()}, f, indent=1,
                      sort_keys=True)
        print("cost analysis:", {k: float(v) for k, v in sorted(ca.items())
                                 if "bytes" in k or "flops" in k})
    except Exception as e:  # noqa: BLE001 - informational
        print("cost_analysis unavailable:", e)

    try:
        ma = compiled.memory_analysis()
        print("memory:", {k: getattr(ma, k) for k in dir(ma)
                          if k.endswith("size_in_bytes")})
    except Exception as e:  # noqa: BLE001
        print("memory_analysis unavailable:", e)

    # ---- summary: top allocations by shape, opcode histogram ----
    shape_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                   "f16": 2, "s8": 1, "u8": 1, "s64": 8, "u64": 8, "f64": 8}
    entries = []
    hist = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(\w+)\[([\d,]*)\][^ ]*\s+(\w+)",
                     line)
        if not m:
            continue
        name, dt, dims, opcode = m.groups()
        hist[opcode] += 1
        if dt not in shape_bytes:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * shape_bytes[dt]
        if b >= 8 << 20:  # >= 8 MB outputs
            entries.append((b, opcode, dt, dims, name, line.strip()[:160]))
    entries.sort(reverse=True)
    print("\n== outputs >= 8 MB (bytes, opcode, dtype, dims, name) ==")
    for b, opcode, dt, dims, name, _ in entries[:60]:
        print(f"{b / 1e6:9.1f} MB  {opcode:14s} {dt}[{dims}]  {name}")
    print("\n== opcode histogram (top 25) ==")
    for op, k in hist.most_common(25):
        print(f"{k:6d}  {op}")


if __name__ == "__main__":
    main()
