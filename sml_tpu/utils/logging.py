"""Metric logging: wandb when available (reference ``main.py:156-170``), otherwise a
JSONL file + console — the observability contract without the hard dependency."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def sigmoid_rampup(current: float, rampup_length: float) -> float:
    """Exponential rampup (reference ``utils/utils.py:21-28``)."""
    if rampup_length == 0:
        return 1.0
    current = float(np.clip(current, 0.0, rampup_length))
    phase = 1.0 - current / rampup_length
    return float(np.exp(-5.0 * phase * phase))


class MetricLogger:
    """wandb-compatible ``.log(dict)`` interface backed by JSONL (+wandb if present)."""

    def __init__(self, config=None, project: Optional[str] = None,
                 out_dir: str = ".", disabled: bool = False):
        self.disabled = disabled
        self._wandb = None
        self._file = None
        self._t0 = time.time()
        if disabled:
            return
        os.makedirs(out_dir, exist_ok=True)
        self._file = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        try:
            import wandb  # type: ignore

            cfg = config.to_dict() if config is not None else {}
            self._wandb = wandb.init(
                project=project or f"MMD_on_{getattr(config, 'dataset', 'unknown')}",
                notes="sml_tpu", tags=["tpu", "multimodal"], config=cfg)
        except Exception:
            self._wandb = None

    def log(self, metrics: Dict[str, Any]) -> None:
        if self.disabled:
            return
        flat = _flatten(metrics)
        rec = {"t": round(time.time() - self._t0, 3), **flat}
        if self._file is not None:
            self._file.write(json.dumps(rec, default=float) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._wandb is not None:
            self._wandb.finish()


def _flatten(d: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            try:
                out[key] = float(v)
            except (TypeError, ValueError):
                out[key] = str(v)
    return out
