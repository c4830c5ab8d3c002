#!/usr/bin/env python
"""Measure the PyTorch reference's deformpathomic train-step rate on this host (CPU).

There is no CUDA device in this environment, so the only runnable reference baseline is
torch-CPU.  The reference code is IMPORTED from /root/reference (never copied); missing
optional deps (lifelines/sksurv/imblearn/nystrom_attention/torchvision/wandb) are
stubbed since the deformpathomic forward path doesn't use them.

Writes benchmarks/baseline_reference.json consumed by bench.py for ``vs_baseline``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _stub_modules():
    import torch.nn as nn

    def mk(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    lifelines_utils = mk("lifelines.utils", concordance_index=lambda *a, **k: 0.5)
    lifelines = mk("lifelines")
    lifelines.utils = lifelines_utils
    sksurv_metrics = mk("sksurv.metrics",
                        concordance_index_censored=lambda *a, **k: (0.5,))
    sksurv = mk("sksurv")
    sksurv.metrics = sksurv_metrics
    mk("imblearn")
    mk("imblearn.over_sampling", RandomOverSampler=object)
    mk("imblearn.metrics", sensitivity_score=lambda *a, **k: 0.0,
       specificity_score=lambda *a, **k: 0.0)
    mk("wandb", init=lambda *a, **k: None, login=lambda *a, **k: None)
    mk("torchvision")
    mk("cv2")
    mk("skimage", io=None, transform=None)
    mk("skimage.io")
    mk("skimage.transform")

    # the pip nystrom_attention package: reuse the reference's own vendored copy.
    # APPEND (not prepend) the reference dir: its top-level main.py/inference.py
    # collide with the repo's, and pytest imports test modules at collection time —
    # a prepended path would make a later `import main` resolve to the reference
    # (its models/utils/data packages don't collide with the repo's sml_tpu layout)
    if REFERENCE not in sys.path:
        sys.path.append(REFERENCE)
    import importlib

    na = importlib.import_module("models.NystromAttention")
    mk("nystrom_attention", NystromAttention=na.NystromAttention)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--fixdim", type=int, default=2500)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--threads", type=int, default=0, help="0 = all cores")
    args = ap.parse_args()

    import torch

    if args.threads > 0:
        torch.set_num_threads(args.threads)
    else:
        torch.set_num_threads(os.cpu_count() or 1)

    _stub_modules()

    from types import SimpleNamespace

    ref_args = SimpleNamespace(
        mode="deformpathomic", attn_dim=2, return_vgrid=True, return_grad="False",
        task_type="diag2021", label_dim=4, init_type="max", init_gain=0.02,
        fusion_type="concat", cut_fuse_grad=False, skip=0, use_bilinear=1,
        path_gate=1, omic_gate=1, path_dim=128, omic_dim=128, path_scale=1,
        omic_scale=1, mmhid=128, dropout_rate=0.1, input_size_omic=431,
        input_size_omic_tumor=59, input_size_omic_immune=361, input_path_dim=1024,
        act_type="Sigmoid", batch_size=args.batch_size, world_size=1,
    )

    from models.model import DeformPathomicNet  # imported from /root/reference
    sys.path.insert(0, REPO)  # for nothing else; keep repo importable

    torch_device = "cpu"
    model = DeformPathomicNet(ref_args).to(torch_device)
    model.train()

    import numpy as np
    import torch.nn as nn

    from utils.loss import BatchLoss  # reference loss (gather is identity at world=1)

    rng = np.random.default_rng(0)
    b, n = args.batch_size, args.fixdim
    x_path = torch.from_numpy(rng.normal(size=(b, n, 1024)).astype("float32"))
    x_omic = torch.from_numpy(rng.normal(size=(b, 431)).astype("float32"))
    x_t = torch.from_numpy(rng.normal(size=(b, 59)).astype("float32"))
    x_i = torch.from_numpy(rng.normal(size=(b, 361)).astype("float32"))
    label = torch.from_numpy((np.arange(b) % 4).astype("int64"))

    ce = nn.CrossEntropyLoss(
        weight=torch.tensor([1.0, 4.15, 2.93, 2.43]))
    bl = BatchLoss(args.batch_size, 1)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=0.1)

    def step():
        opt.zero_grad()
        _, _, _, logits, _, _, _ = model(
            x_path=x_path, x_omic=x_omic, x_omic_tumor=x_t, x_omic_immune=x_i)
        loss = ce(logits[2], label)
        loss = loss + 0.5 * torch.sum(bl(logits[3], logits[4])) \
                    + 0.5 * torch.sum(bl(logits[5], logits[6]))
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0

    steps_per_sec = args.steps / dt
    result = {
        "framework": "pytorch-cpu (reference helenypzhang/Subspace-Multimodal-Learning)",
        "mode": "deformpathomic",
        "task": "diag2021 train step (fwd+bwd+adam, task + batch-sim loss)",
        "batch_size": b,
        "fixdim": n,
        "threads": torch.get_num_threads(),
        "steps_per_sec": steps_per_sec,
        "bags_per_sec": steps_per_sec * b,
        "measured_steps": args.steps,
        "wall_sec": dt,
    }
    os.makedirs(os.path.join(REPO, "benchmarks"), exist_ok=True)
    suffix = "" if args.fixdim == 2500 else f"_{args.fixdim}"
    out = os.path.join(REPO, "benchmarks", f"baseline_reference{suffix}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
