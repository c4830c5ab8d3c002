"""Checkpointing: full train-state via orbax (params + opt + step + PRNG — the
reference only saved weights, ``train_test.py:263-290``) plus weights-only "best"
snapshots with metric-embedding filenames for parity with the reference's
``epoch_{e}_cindex_{c}.pth`` naming, and a ``best_modal`` weights-only reload path
(reference ``main.py:95-103``)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from sml_tpu.train.state import TrainState

LAST_STATE = "last_state"
RESUME_META = "last_state_meta.json"


def _ckptr() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_train_state(path: str, state: TrainState) -> None:
    path = os.path.abspath(path)
    ckptr = _ckptr()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: TrainState) -> TrainState:
    ckptr = _ckptr()
    return ckptr.restore(os.path.abspath(path), template)


def save_resume_meta(checkpoints_dir: str, meta: Dict[str, Any]) -> None:
    """Host-side resume metadata (epoch just finished, best-val record, plateau
    controller state) saved alongside ``last_state`` — the parts of a resumable
    run that live outside the jax pytree."""
    tmp = os.path.join(checkpoints_dir, RESUME_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(checkpoints_dir, RESUME_META))


def load_resume_meta(checkpoints_dir: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(checkpoints_dir, RESUME_META)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def has_resume_state(checkpoints_dir: str) -> bool:
    return os.path.isdir(os.path.join(checkpoints_dir, LAST_STATE))


def save_weights(path: str, variables: Any) -> None:
    """Weights-only snapshot (params [+ batch_stats])."""
    path = os.path.abspath(path)
    ckptr = _ckptr()
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()


def restore_weights(path: str, template: Any) -> Any:
    ckptr = _ckptr()
    return ckptr.restore(os.path.abspath(path), template)


def best_checkpoint_name(checkpoints_dir: str, epoch: int, task_type: str,
                         test_metrics: dict) -> str:
    """Reference filename convention (train_test.py:270-285)."""
    if task_type == "survival":
        name = f"epoch_{epoch + 1:d}_cindex_{test_metrics['cindex']:f}_"
    else:
        name = (f"epoch_{epoch + 1:d}_AUC_{test_metrics['auc']:f}"
                f"_ACC_{test_metrics['acc']:f}_Sens_{test_metrics['sens']:f}"
                f"_Spec_{test_metrics['spec']:f}_F1_{test_metrics['f1']:f}_")
    return os.path.join(checkpoints_dir, name)
