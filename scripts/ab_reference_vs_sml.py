#!/usr/bin/env python
"""Same-data A/B: torch reference vs sml_tpu on an identical synthetic cohort.

Both sides get: the same synthetic samples, the same seeded batch order per epoch,
and the SAME INITIAL WEIGHTS (torch init transplanted into flax via
``sml_tpu.utils.torch_compat``), the same Adam(lr, torch-coupled wd) + per-epoch
cosine schedule, and the same losses (NLL-surv; CMTA +L1 alignment; deformpathomic
+batch-similarity).  Remaining nondeterminism: dropout RNG streams and f32
reduction order.  Gradient modulation is OFF on both sides (the reference's .grad
surgery lives in its DDP loop; modulation equivalence is unit-tested separately).

Writes benchmarks/ab_synthetic.json and prints a per-mode table.
Reference semantics matched: train_test.py:24-290 (losses/eval), utils/utils.py:245
(nll), utils/loss.py:7-40 (BatchLoss at world_size=1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, os.path.join(REPO, "tests"))  # helpers.ref_patch


def _dump_partial(history, tag):
    """Crash insurance for multi-hour arms: flush per-epoch history to a sidecar
    JSON (AB_PARTIAL_JSON env var names the file) after every epoch."""
    path = os.environ.get("AB_PARTIAL_JSON")
    if path:
        with open(path, "w") as f:
            json.dump({"arm": tag, "history": history}, f)


def torch_forward(mode, model, batch, torch):
    """Reference per-mode forward -> (hazards, S, extras) [train_test.py:327-348]."""
    t = lambda k: torch.from_numpy(batch[k])
    if mode == "omic":
        _, logits, _ = model(x_omic=t("x_omic"))
        hazards = torch.sigmoid(logits)
        return hazards, torch.cumprod(1 - hazards, dim=1), {}
    if mode == "path":
        _, logits, _ = model(t("x_path"))
        hazards = torch.sigmoid(logits)
        return hazards, torch.cumprod(1 - hazards, dim=1), {}
    if mode in ("pathomic", "pathomic_original"):
        _, _, _, logits, *_ = model(x_path=t("x_path"), x_omic=t("x_omic"))
        hazards = torch.sigmoid(logits[2])
        return hazards, torch.cumprod(1 - hazards, dim=1), {}
    if mode == "mcat":
        logits, hazards, s = model(x_path=t("x_path"), x_omic=t("x_omic"))
        return hazards, s, {}
    if mode == "cmta":
        logits, hazards, s, p, p_hat, g, g_hat = model(
            x_path=t("x_path"), x_omic=t("x_omic"))
        return hazards, s, {"P": p, "P_hat": p_hat, "G": g, "G_hat": g_hat}
    if mode == "deformpathomic":
        _, _, _, logits, *_ = model(
            x_path=t("x_path"), x_omic=None, x_omic_tumor=t("x_omic_tumor"),
            x_omic_immune=t("x_omic_immune"))
        hazards = logits[2]  # survival: sigmoid applied in-model (model.py:531-534)
        return hazards, torch.cumprod(1 - hazards, dim=1), {
            "omic_tumor": logits[3], "vgrid_tumor": logits[4],
            "omic_immune": logits[5], "vgrid_immune": logits[6]}
    raise ValueError(mode)


def run_torch(config, epochs_batches, test_batches, ref_model, torch):
    """Train the reference model on the pre-materialized batch stream."""
    from utils.loss import BatchLoss
    from utils.utils import nll_loss

    from sml_tpu.train.metrics import cindex

    opt = torch.optim.Adam(ref_model.parameters(), lr=config.lr,
                           weight_decay=config.weight_decay)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=config.epochs,
                                                       eta_min=0)
    bl = BatchLoss(config.batch_size, 1)
    history = []
    for epoch_batches in epochs_batches:
        ref_model.train()
        for batch in epoch_batches:
            labels = torch.from_numpy(batch["labels"])
            opt.zero_grad()
            hazards, s, extras = torch_forward(config.mode, ref_model, batch, torch)
            loss = nll_loss(hazards, s, labels[:, 8].long(), labels[:, 9], alpha=0)
            if config.mode == "cmta":
                l1 = torch.nn.L1Loss()
                loss = loss + 0.5 * (l1(extras["P"].detach(), extras["P_hat"])
                                     + l1(extras["G"].detach(), extras["G_hat"]))
            if config.mode == "deformpathomic" and config.return_vgrid:
                loss = loss + 0.5 * torch.sum(
                    bl(extras["omic_tumor"], extras["vgrid_tumor"])) \
                    + 0.5 * torch.sum(bl(extras["omic_immune"], extras["vgrid_immune"]))
            loss.backward()
            opt.step()
        sched.step()

        ref_model.eval()
        risks, censors, times = [], [], []
        with torch.no_grad():
            for batch in test_batches:
                keep = batch["sample_mask"] > 0
                hazards, s, _ = torch_forward(config.mode, ref_model, batch, torch)
                risks.append((-s.sum(dim=1)).numpy()[keep])
                censors.append(batch["labels"][keep, 9])
                times.append(batch["labels"][keep, 11])
        ci = cindex(np.concatenate(risks), np.concatenate(censors),
                    np.concatenate(times))
        history.append({"cindex": float(ci), "loss": float(loss)})
        print(f"  torch epoch {len(history)}: test cindex {ci:.4f}", flush=True)
        _dump_partial(history, "torch")
    return history


def run_jax(config, epochs_batches, test_batches, init_variables):
    import jax
    import jax.numpy as jnp

    from sml_tpu.models.factory import define_net, define_optimizer
    from sml_tpu.train.metrics import cindex
    from sml_tpu.train.state import TrainState
    from sml_tpu.train.steps import make_eval_step, make_train_step

    model = define_net(config)
    tx = define_optimizer(config, steps_per_epoch=len(epochs_batches[0]))
    state = TrainState.create(init_variables, tx, jax.random.PRNGKey(config.seed + 1))
    train_step = make_train_step(config, model, tx)
    eval_step = make_eval_step(config, model)

    history = []
    for epoch_batches in epochs_batches:
        for batch in epoch_batches:
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if k != "sample_mask"}
            state, metrics = train_step(state, dev)

        variables = state.model_variables()
        risks, censors, times = [], [], []
        for batch in test_batches:
            keep = batch["sample_mask"] > 0
            dev = {k: jnp.asarray(v) for k, v in batch.items()
                   if k != "sample_mask"}
            out = eval_step(variables, dev)
            risks.append(np.asarray(out["risk"])[keep])
            censors.append(batch["labels"][keep, 9])
            times.append(batch["labels"][keep, 11])
        ci = cindex(np.concatenate(risks), np.concatenate(censors),
                    np.concatenate(times))
        history.append({"cindex": float(ci), "loss": float(metrics["loss"])})
        print(f"  sml_tpu epoch {len(history)}: test cindex {ci:.4f}", flush=True)
        _dump_partial(history, "sml")
    return history


def ab_mode(mode, fixdim, synthetic_size, batch_size, epochs, torch,
            patch_ref=False, arm="both"):
    from types import SimpleNamespace

    import models.model as ref_model_mod
    from models.model import define_net as ref_define_net

    from sml_tpu.config import Config
    from sml_tpu.data.loader import Loader, build_datasets
    from sml_tpu.utils.torch_compat import convert_reference_state_dict

    # deformpathomic at B == 8 offset groups: use the reference's EXACT
    # view(8,N,-1) BatchLoss arithmetic on the sml side too, so the losses agree
    # bit-for-bit (see losses.batch_similarity_loss layout docs)
    layout = ("reference" if mode == "deformpathomic" and batch_size == 8
              else "group")
    config = Config(mode=mode, dataset="synthetic", synthetic_size=synthetic_size,
                    fixdim=fixdim, batch_size=batch_size, epochs=epochs,
                    task_type="survival", gradient_modulate=False,
                    return_vgrid=(mode == "deformpathomic"), num_devices=1,
                    batchloss_layout=layout,
                    dropout_rate=0.1 if mode == "deformpathomic" else 0.25)

    orig_ct = ref_model_mod.DeformCrossTransMIL
    if patch_ref:
        # powered flagship A/B: shape-patch the reference's hard-coded 2500/50x50
        # (DeformCrossTransMIL.py:104, DeformableAttention2D.py:239-240,318) so the
        # 1-core torch side can run a cohort big enough to be statistically
        # meaningful (VERDICT r2 item 4)
        from helpers.ref_patch import load_patched_deform

        grid = int(round(fixdim ** 0.5))
        ref_model_mod.DeformCrossTransMIL = load_patched_deform(n=fixdim,
                                                                grid=grid)

    # identical batch streams: materialize the seeded order once, reuse for both
    train_loader = Loader(build_datasets(config, "Train"), batch_size,
                          shuffle=True, drop_last=True, seed=config.seed)
    test_loader = Loader(build_datasets(config, "Test"), batch_size)
    epochs_batches = []
    for epoch in range(epochs):
        train_loader.set_epoch(epoch)
        epochs_batches.append([{k: v for k, v in b.items() if k != "sample_mask"}
                               for b in train_loader])
    test_batches = list(test_loader)

    # reference model, torch init; transplant the SAME init into flax
    torch.manual_seed(config.seed)
    ref_args = SimpleNamespace(
        mode=mode, attn_dim=2, return_vgrid=config.return_vgrid,
        return_grad="False", task_type="survival", label_dim=4, init_type="max",
        init_gain=0.02, fusion_type="concat", cut_fuse_grad=False, skip=0,
        use_bilinear=1, path_gate=1, omic_gate=1, path_dim=128, omic_dim=128,
        path_scale=1, omic_scale=1, mmhid=128, dropout_rate=config.dropout_rate,
        input_size_omic=431, input_size_omic_tumor=59, input_size_omic_immune=361,
        input_path_dim=1024, act_type="Sigmoid", batch_size=batch_size,
        world_size=1, fixdim=fixdim)
    try:
        ref_model = ref_define_net(ref_args)
    finally:
        ref_model_mod.DeformCrossTransMIL = orig_ct
    variables = convert_reference_state_dict(mode, ref_model.state_dict())
    variables = {k: v for k, v in variables.items()}

    print(f"== {mode} (fixdim={fixdim}, n={synthetic_size}, {epochs} epochs, "
          f"arm={arm}) ==", flush=True)
    jax_hist = torch_hist = None
    t_jax = t_torch = None
    if arm in ("both", "sml"):
        t0 = time.time()
        jax_hist = run_jax(config, epochs_batches, test_batches, variables)
        t_jax = time.time() - t0
    if arm in ("both", "torch"):
        t0 = time.time()
        torch_hist = run_torch(config, epochs_batches, test_batches, ref_model,
                               torch)
        t_torch = time.time() - t0
    result = {
        "mode": mode, "fixdim": fixdim, "cohort": synthetic_size,
        "epochs": epochs, "batch_size": batch_size,
    }
    if torch_hist is not None:
        result.update(torch_final_cindex=torch_hist[-1]["cindex"],
                      torch_best_cindex=max(h["cindex"] for h in torch_hist),
                      torch_history=torch_hist, torch_wall_sec=t_torch)
    if jax_hist is not None:
        result.update(sml_final_cindex=jax_hist[-1]["cindex"],
                      sml_best_cindex=max(h["cindex"] for h in jax_hist),
                      sml_history=jax_hist, sml_wall_sec=t_jax)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+",
                    default=["omic", "pathomic", "mcat", "cmta", "deformpathomic"])
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--deform_epochs", type=int, default=6)
    ap.add_argument("--deform_cohort", type=int, default=96)
    ap.add_argument("--deform_fixdim", type=int, default=256,
                    help="256 = shape-patched reference (powered A/B); "
                         "2500 = unpatched reference shape (tiny cohorts only)")
    ap.add_argument("--cohort", type=int, default=96)
    ap.add_argument("--deform_batch", type=int, default=0,
                    help="override deformpathomic batch size (0 = auto)")
    ap.add_argument("--arm", choices=["both", "torch", "sml"], default="both",
                    help="run only one framework's arm (batch streams and init "
                         "are deterministic, so arms can run in separate "
                         "processes and be merged)")
    ap.add_argument("--out", default=None,
                    help="output JSON (default benchmarks/ab_synthetic.json)")
    ap.add_argument("--platform", choices=["cpu", "axon"], default="cpu",
                    help="JAX backend for the sml arm (axon = real TPU; the "
                         "torch arm always runs on host CPU)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)

    from measure_reference_baseline import _stub_modules

    _stub_modules()
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.manual_seed(0)

    out = args.out or os.path.join(REPO, "benchmarks", "ab_synthetic.json")
    results = []
    if os.path.exists(out):  # merge with prior runs (keyed by mode)
        with open(out) as f:
            results = json.load(f)
    for mode in args.modes:
        if mode == "deformpathomic":
            bs = args.deform_batch or (8 if args.deform_fixdim != 2500 else 4)
            r = ab_mode(mode, args.deform_fixdim, args.deform_cohort, bs,
                        args.deform_epochs, torch,
                        patch_ref=args.deform_fixdim != 2500, arm=args.arm)
        else:
            r = ab_mode(mode, 64, args.cohort, 8, args.epochs, torch,
                        arm=args.arm)
        results = [x for x in results
                   if not (x["mode"] == mode and x["fixdim"] == r["fixdim"])] + [r]
        with open(out, "w") as f:
            json.dump(results, f, indent=2)

    print("\nmode             torch-best  sml-best   torch-final  sml-final")
    fmt = lambda r, k: (f"{r[k]:.4f}" if k in r else "  --  ")
    for r in results:
        print(f"{r['mode']:16s} {fmt(r, 'torch_best_cindex')}      "
              f"{fmt(r, 'sml_best_cindex')}     {fmt(r, 'torch_final_cindex')}"
              f"       {fmt(r, 'sml_final_cindex')}")


if __name__ == "__main__":
    main()
