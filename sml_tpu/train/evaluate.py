"""Evaluation loops (reference ``utils/metrics.py:38-196``): jitted batched forward,
host-side metric computation with exact reference semantics (risk = -sum(S), C-index
over the accumulated arrays; softmax activations for the classification metrics)."""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from sml_tpu.config import Config
from sml_tpu.train.losses import TASK_LABEL_SLOT
from sml_tpu.train.metrics import cindex, compute_avg_metrics


def evaluate(config: Config, eval_step: Callable, variables, loader,
             mesh=None) -> Dict[str, float]:
    """Run a full pass; returns {'cindex'} or the 7 classification metrics + loss.

    Quality metrics AND the per-batch loss are computed over exactly the real
    samples: the sample mask rides into the jitted eval step, so the wrap-padded
    tail rows of the final batch contribute nothing — matching the reference's
    running test loss over its smaller remainder batch (train_test.py:504-509).
    """
    from sml_tpu.parallel.mesh import fetch_global, shard_batch

    # enqueue every batch first, fetch once at the end: per-batch host fetches cost a
    # full round-trip each on tunneled TPUs.  Eval loaders hold the FULL batch on
    # every host (per_host_full) so host-side metrics see the global arrays; under
    # multi-host the sharded outputs are allgathered back by fetch_global.
    from sml_tpu.train.loop import cast_features

    outs, host_labels, host_masks = [], [], []
    for batch in loader:
        batch = cast_features(config, batch)
        mask = batch["sample_mask"]
        dev_batch = (shard_batch(mesh, batch, per_host_full=True)
                     if mesh is not None else batch)
        outs.append(eval_step(variables, dev_batch))
        host_labels.append(np.asarray(batch["labels"]))
        host_masks.append(np.asarray(mask))
    outs = fetch_global(outs)

    risks, probs, labels, losses_ = [], [], [], []
    for out, lab, mask in zip(outs, host_labels, host_masks):
        valid = mask > 0
        labels.append(lab[valid])
        if "risk" in out:
            risks.append(np.asarray(out["risk"])[valid])
        else:
            probs.append(np.asarray(out["probs"])[valid])
        losses_.append(float(out["loss"]))

    labels = np.concatenate(labels, axis=0)
    result: Dict[str, float] = {"loss": float(np.mean(losses_))}

    if config.task_type == "survival":
        risk = np.concatenate(risks, axis=0)
        result["cindex"] = float(cindex(risk, labels[:, 9], labels[:, 11]))
        return result

    act = np.concatenate(probs, axis=0)
    gt = labels[:, TASK_LABEL_SLOT[config.task_type]]
    acc, f1, auc, bac, sens, spec, prec = compute_avg_metrics(gt, act)
    result.update({"acc": float(acc), "f1": float(f1), "auc": float(auc),
                   "bac": float(bac), "sens": float(sens), "spec": float(spec),
                   "prec": float(prec)})
    return result
