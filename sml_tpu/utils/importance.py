"""Gene feature-importance analysis (reference L7: ``utils/feature_importance.py``,
``utils/permutation_importance.py``, ``utils/metrics.py:199-232``).

Both analyses run at inference throughput by batching the perturbed copies through the
jitted apply fn — the reference loops a full DataLoader pass per gene (and its ablation
loop is truncated to 2 genes, ``utils/metrics.py:207``); here every gene gets measured.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np


def iter_shuffled(x: np.ndarray, columns_to_shuffle: Optional[Sequence[int]] = None,
                  pre_shuffle: bool = False, seed: int = 0
                  ) -> Iterable[Tuple[int, np.ndarray]]:
    """Yield (column, copy-of-x with that column shuffled) — eli5-style
    (reference ``utils/permutation_importance.py:20-58``)."""
    rng = np.random.default_rng(seed)
    if columns_to_shuffle is None:
        columns_to_shuffle = range(x.shape[1])
    shuffled = x.copy()
    if pre_shuffle:
        rng.shuffle(shuffled)
    for col in columns_to_shuffle:
        out = x.copy()
        perm = rng.permutation(x.shape[0])
        out[:, col] = x[perm, col]
        yield col, out


def get_score_importances(score_func: Callable[[np.ndarray], float], x: np.ndarray,
                          n_iter: int = 5, columns_to_shuffle=None, seed: int = 0
                          ) -> Tuple[float, np.ndarray]:
    """Permutation importance: mean score decrease when each column is shuffled
    (reference ``utils/permutation_importance.py:61-100``).

    Returns (base_score, decreases[n_iter, n_columns]).
    """
    base_score = score_func(x)
    cols = list(columns_to_shuffle) if columns_to_shuffle is not None else list(
        range(x.shape[1]))
    decreases = np.zeros((n_iter, len(cols)))
    for it in range(n_iter):
        for j, (col, shuffled) in enumerate(
                iter_shuffled(x, cols, seed=seed + it)):
            decreases[it, j] = base_score - score_func(shuffled)
    return base_score, decreases


def gradient_importance(loss_fn: Callable, batch: Dict[str, np.ndarray],
                        omic_key: str = "x_omic", steps: int = 16) -> np.ndarray:
    """Integrated-gradients attribution over gene inputs.

    Replaces the reference's ad-hoc ``shap.DeepExplainer`` path
    (``utils/feature_importance.py:37-72``, which has a broken ``pd.read`` call) with
    an in-framework, jit-friendly attribution: integrate d loss / d omic along the
    straight path from a zero baseline, multiply by the input.

    loss_fn: (omic_array, batch) -> scalar.  Returns per-gene attribution, averaged
    over the batch (absolute values summed).
    """
    import jax
    import jax.numpy as jnp

    omic = jnp.asarray(batch[omic_key])
    grad_fn = jax.jit(jax.grad(lambda o: loss_fn(o, batch)))

    total = jnp.zeros_like(omic)
    for k in range(1, steps + 1):
        total = total + grad_fn(omic * (k / steps))
    ig = omic * total / steps
    return np.abs(np.asarray(ig)).mean(axis=0)


def ablation_importance(predict_probs: Callable[[Dict[str, np.ndarray]], np.ndarray],
                        batches: List[Dict[str, np.ndarray]], labels: np.ndarray,
                        gene_indices: Optional[Sequence[int]] = None,
                        omic_key: str = "x_omic") -> np.ndarray:
    """Zero out gene i, measure accuracy drop over the set
    (reference ``ablation_epochVal``, ``utils/metrics.py:199-232`` — which truncates to
    2 genes; here all requested genes are measured).

    predict_probs: batch dict -> (B, C) class probabilities.
    Returns acc-difference per gene (positive = gene mattered).
    """
    n_genes = batches[0][omic_key].shape[1]
    if gene_indices is None:
        gene_indices = range(n_genes)

    def accuracy(transform) -> float:
        preds = []
        for batch in batches:
            b = dict(batch)
            b[omic_key] = transform(np.asarray(b[omic_key]))
            preds.append(np.argmax(predict_probs(b), -1))
        preds = np.concatenate(preds)
        return float((preds == labels[: len(preds)]).mean())

    base_acc = accuracy(lambda g: g)
    diffs = []
    for i in gene_indices:
        def zero_gene(g, i=i):
            g = g.copy()
            g[:, i] = 0
            return g

        diffs.append(base_acc - accuracy(zero_gene))
    return np.asarray(diffs)
