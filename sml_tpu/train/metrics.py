"""Host-side evaluation metrics (reference ``utils/metrics.py:9-35``,
``utils/utils.py:312-317``).

sksurv / imblearn are not available in this environment, so the survival C-index
(Harrell, censored, sksurv ``concordance_index_censored`` semantics with
``tied_tol=1e-8``) and macro sensitivity/specificity are implemented natively in numpy
and oracle-tested against hand-computed cases.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from sklearn.metrics import (accuracy_score, balanced_accuracy_score, confusion_matrix,
                             f1_score, precision_score, roc_auc_score)

# jnp is imported lazily inside batch_cindex so this module stays importable host-only.


def concordance_index_censored(event_indicator: np.ndarray, event_time: np.ndarray,
                               estimate: np.ndarray, tied_tol: float = 1e-8
                               ) -> Tuple[float, int, int, int, int]:
    """sksurv-compatible Harrell's C for right-censored data.

    Comparable pairs: (i, j) with time_i < time_j and event_i = True (pairs with tied
    times are not comparable).  Concordant when estimate_i > estimate_j; risk ties
    (|diff| <= tied_tol) count 0.5.  Returns (cindex, concordant, discordant,
    tied_risk, tied_time) like sksurv.
    """
    event = np.asarray(event_indicator, dtype=bool)
    time = np.asarray(event_time, dtype=float)
    est = np.asarray(estimate, dtype=float)
    order = np.argsort(time, kind="mergesort")
    time_s, event_s, est_s = time[order], event[order], est[order]

    n = len(time_s)
    concordant = discordant = tied_risk = 0
    tied_time = 0
    numerator = denominator = 0.0

    i = 0
    while i < n:
        # group of tied times [i, end)
        end = i + 1
        while end < n and time_s[end] == time_s[i]:
            end += 1
        for idx in range(i, end):
            if not event_s[idx]:
                continue
            rest = est_s[end:]
            if rest.size == 0:
                continue
            diff = est_s[idx] - rest
            ties = np.abs(diff) <= tied_tol
            con = (diff > 0) & ~ties
            dis = (diff < 0) & ~ties
            concordant += int(con.sum())
            discordant += int(dis.sum())
            tied_risk += int(ties.sum())
            numerator += con.sum() + 0.5 * ties.sum()
            denominator += rest.size
        tied_time += (end - i - 1) * (end - i) // 2
        i = end

    if denominator == 0:
        raise ValueError("No comparable pairs available (all samples censored or tied)")
    return (numerator / denominator, concordant, discordant, tied_risk, tied_time)


def cindex(all_risk_scores: np.ndarray, all_censorships: np.ndarray,
           all_event_times: np.ndarray) -> float:
    """Reference ``CIndex_sksurv`` (``utils/utils.py:315-317``): events = 1 - censorship."""
    return concordance_index_censored(
        (1 - np.asarray(all_censorships)).astype(bool), all_event_times,
        all_risk_scores, tied_tol=1e-8)[0]


def cindex_lifeline(hazards: np.ndarray, event_all: np.ndarray,
                    survtime_all: np.ndarray) -> float:
    """Reference ``CIndex_lifeline`` (``utils/utils.py:312-313``): lifelines-style
    concordance with predicted_scores = -hazards (higher hazard = shorter survival).

    lifelines' estimator equals Harrell's C on event/censored pairs; implemented
    natively (lifelines is not installed here).
    """
    return concordance_index_censored(np.asarray(event_all).astype(bool),
                                      np.asarray(survtime_all),
                                      np.asarray(hazards), tied_tol=1e-8)[0]


def sensitivity_specificity_macro(y_true: np.ndarray, y_pred: np.ndarray
                                  ) -> Tuple[float, float]:
    """imblearn macro sensitivity (= recall) / specificity from the confusion matrix."""
    classes = np.unique(y_true)
    cm = confusion_matrix(y_true, y_pred, labels=classes)
    total = cm.sum()
    sens, spec = [], []
    for k in range(len(classes)):
        tp = cm[k, k]
        fn = cm[k].sum() - tp
        fp = cm[:, k].sum() - tp
        tn = total - tp - fn - fp
        sens.append(tp / (tp + fn) if (tp + fn) > 0 else 0.0)
        spec.append(tn / (tn + fp) if (tn + fp) > 0 else 0.0)
    return float(np.mean(sens)), float(np.mean(spec))


def compute_avg_metrics(ground_truth: np.ndarray, activations: np.ndarray
                        ) -> Tuple[float, float, float, float, float, float, float]:
    """acc, macro-F1, OvR-AUC, balanced acc, macro sens/spec/precision
    (reference ``utils/metrics.py:9-25``; AUC errors swallowed to 0)."""
    gt = np.asarray(ground_truth)
    act = np.asarray(activations)
    pred = np.argmax(act, -1)
    acc = accuracy_score(gt, pred)
    f1 = f1_score(gt, pred, average="macro")
    try:
        auc = roc_auc_score(gt, act, multi_class="ovr")
    except ValueError as err:
        print(f"Error in computing AUC. Error msg:{err}")
        auc = 0
    bac = balanced_accuracy_score(gt, pred)
    sens, spec = sensitivity_specificity_macro(gt, pred)
    prec = precision_score(gt, pred, average="macro", zero_division=0)
    return acc, f1, auc, bac, sens, spec, prec


def compute_confusion_matrix(ground_truth: np.ndarray, activations: np.ndarray,
                             labels) -> np.ndarray:
    pred = np.argmax(np.asarray(activations), -1)
    return confusion_matrix(np.asarray(ground_truth), pred, labels=labels)


def batch_cindex(risk, censor, time, tied_tol: float = 1e-8):
    """In-graph (jnp) batch concordance for gradient modulation: returns (cindex,
    valid) where valid=False when no comparable pairs exist.

    Replaces the reference's mid-step device->host numpy C-index
    (``train_test.py:123-134``) with an O(B^2) pairwise computation that stays on-chip.
    """
    import jax.numpy as jnp

    event_i = (1.0 - censor)[:, None]                      # 1 when sample i had event
    comparable = (time[:, None] < time[None, :]) & (event_i > 0)
    diff = risk[:, None] - risk[None, :]
    ties = jnp.abs(diff) <= tied_tol
    concordant = (diff > 0) & ~ties
    num = jnp.sum(jnp.where(comparable, concordant + 0.5 * ties, 0.0))
    den = jnp.sum(comparable)
    valid = den > 0
    return jnp.where(valid, num / jnp.maximum(den, 1), 0.5), valid
