#!/usr/bin/env python
"""Pack a dataset into the binary format consumed by the native prefetch loader.

Usage:
    python scripts/pack_data.py --dataset both --dataDir /path/to/data/ \
        --out ./packed --fixdim 2500
    python main.py --packed_dir ./packed ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from sml_tpu.config import Config
    from sml_tpu.data.loader import build_datasets
    from sml_tpu.data.packed import pack_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--dataDir", default="./data/")
    ap.add_argument("--out", default="./packed")
    ap.add_argument("--fixdim", type=int, default=2500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--synthetic_size", type=int, default=256)
    ap.add_argument("--novalset", action="store_true")
    args = ap.parse_args()

    config = Config(dataset=args.dataset, dataDir=args.dataDir, fixdim=args.fixdim,
                    seed=args.seed, synthetic_size=args.synthetic_size,
                    novalset=args.novalset)
    os.makedirs(args.out, exist_ok=True)
    phases = ["Train", "Test"] + ([] if args.novalset else ["Val"])
    for phase in phases:
        ds = build_datasets(config, phase)
        path = os.path.join(args.out, f"{phase}.bin")
        meta = pack_dataset(ds, path)
        print(f"{phase}: {meta['n_records']} records x {meta['record_bytes']} B "
              f"-> {path}")


if __name__ == "__main__":
    main()
