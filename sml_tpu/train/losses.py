"""Loss zoo (reference ``utils/utils.py:245-308``, ``utils/loss.py:7-40``,
``models/cmta_utils.py:1091-1228``, ``train_test.py:25-27``).

All pure jnp functions usable inside jit.  The subspace batch-similarity loss
(BatchLoss) operates on the jit-visible GLOBAL batch: under data-parallel sharding XLA
inserts the all-gather the reference implements by hand with GatherLayer; the gradient
here is the exact global-batch gradient (the reference's GatherLayer+DDP construction
under-weights it by 1/world_size — see utils/gather.py:16-20 — controlled by
``batchloss_grad_scale`` in the config).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# class weights, reference train_test.py:25-27 (train) and :465,533 (test)
TASK_WEIGHTS_TRAIN = {
    "diag2021": (1.0, 4.15, 2.93, 2.43),
    "grade": (1.47, 1.51, 1.0),
    "subtype": (1.0, 1.72, 2.43),
}
TASK_WEIGHTS_TEST = {
    "diag2021": (1.0, 4.56, 3.21, 2.65),
    "grade": None,
    "subtype": None,
}
# label-vector slot per task (reference data/dataset.py:523)
TASK_LABEL_SLOT = {"diag2021": 5, "grade": 4, "subtype": 7}


def _masked_mean(x: jnp.ndarray, sample_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over valid samples (axis 0); equals ``x.mean()`` when mask is None.

    Pad-row exactness for eval: the reference's final test batch is simply smaller
    (torch keeps the remainder batch), whereas ours is wrap-padded to the static
    shape — masking out pad rows reproduces the reference's small-batch mean.
    """
    if sample_mask is None:
        return x.mean()
    per_row = x.reshape(x.shape[0], -1).mean(axis=1)
    m = sample_mask.astype(per_row.dtype)
    return (per_row * m).sum() / jnp.maximum(m.sum(), 1.0)


def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           weights: Optional[jnp.ndarray] = None,
                           sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch ``nn.CrossEntropyLoss`` semantics: weighted mean normalized by the sum of
    the per-target weights."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    if weights is None:
        return _masked_mean(nll, sample_mask)
    w = jnp.asarray(weights, logits.dtype)[labels.astype(jnp.int32)]
    if sample_mask is not None:
        w = w * sample_mask.astype(w.dtype)
    return (w * nll).sum() / jnp.maximum(w.sum(), 1e-12)


def nll_surv_loss(hazards: jnp.ndarray, s: Optional[jnp.ndarray], y: jnp.ndarray,
                  c: jnp.ndarray, alpha: float = 0.4, eps: float = 1e-7,
                  sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Discrete-hazard NLL with censoring (reference ``utils/utils.py:245-261``).

    hazards (B, K) in (0,1); y (B,) int bin; c (B,) censorship (1 = alive/censored).
    """
    y = y.astype(jnp.int32)[:, None]
    c = c.astype(hazards.dtype)[:, None]
    if s is None:
        s = jnp.cumprod(1.0 - hazards, axis=1)
    s_padded = jnp.concatenate([jnp.ones_like(c), s], axis=1)

    gather = lambda t, idx: jnp.take_along_axis(t, idx, axis=1)
    uncensored = -(1.0 - c) * (
        jnp.log(jnp.clip(gather(s_padded, y), min=eps))
        + jnp.log(jnp.clip(gather(hazards, y), min=eps)))
    censored = -c * jnp.log(jnp.clip(gather(s_padded, y + 1), min=eps))
    neg_l = censored + uncensored
    loss = (1.0 - alpha) * neg_l + alpha * uncensored
    return _masked_mean(loss, sample_mask)


def ce_surv_loss(hazards: jnp.ndarray, s: jnp.ndarray, y: jnp.ndarray,
                 c: jnp.ndarray, alpha: float = 0.4, eps: float = 1e-7,
                 sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Cross-entropy survival loss (reference ``models/cmta_utils.py:1160-1177``)."""
    y = y.astype(jnp.int32)[:, None]
    c = c.astype(hazards.dtype)[:, None]
    if s is None:
        s = jnp.cumprod(1.0 - hazards, axis=1)
    s_padded = jnp.concatenate([jnp.ones_like(c), s], axis=1)
    gather = lambda t, idx: jnp.take_along_axis(t, idx, axis=1)
    reg = -(1.0 - c) * (jnp.log(gather(s_padded, y) + eps)
                        + jnp.log(jnp.clip(gather(hazards, y), min=eps)))
    ce_l = (-c * jnp.log(jnp.clip(gather(s, y), min=eps))
            - (1.0 - c) * jnp.log(jnp.clip(1.0 - gather(s, y), min=eps)))
    return _masked_mean((1.0 - alpha) * ce_l + alpha * reg, sample_mask)


def define_loss(survival_loss: str):
    """Loss-zoo dispatch (reference ``models/cmta_utils.py:1091-1118``): returns a
    callable or [survival_loss, auxiliary_loss] pair."""
    table = {
        "ce_surv": lambda h, s, y, c: ce_surv_loss(h, s, y, c, alpha=0.0),
        "nll_surv": lambda h, s, y, c: nll_surv_loss(h, s, y, c, alpha=0.0),
        "cox_surv": cox_loss,
    }
    if survival_loss in table:
        return table[survival_loss]
    aux = {
        "nll_surv_kl": kl_loss,
        "nll_surv_mse": lambda a, b: jnp.mean((a - b) ** 2),
        "nll_surv_l1": l1_loss,
        "nll_surv_cos": cosine_loss,
        "nll_surv_ol": lambda p, ph, g, gh: orthogonal_loss(p, ph, g, gh, gamma=0.5),
    }
    if survival_loss in aux:
        return [table["nll_surv"], aux[survival_loss]]
    raise NotImplementedError(survival_loss)


def cox_loss(survtime: jnp.ndarray, censor: jnp.ndarray,
             hazard_pred: jnp.ndarray,
             sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Cox partial likelihood (reference ``utils/utils.py:293-308``; unused by active
    modes but kept for inventory parity)."""
    r_mat = (survtime[None, :] >= survtime[:, None]).astype(hazard_pred.dtype)
    theta = hazard_pred.reshape(-1)
    exp_theta = jnp.exp(theta)
    if sample_mask is not None:
        r_mat = r_mat * sample_mask.astype(r_mat.dtype)[None, :]
    ll = (theta - jnp.log(jnp.maximum(jnp.sum(exp_theta * r_mat, axis=1), 1e-30))) \
        * censor
    return -_masked_mean(ll, sample_mask)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray,
            sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return _masked_mean(jnp.abs(a - b), sample_mask)


def kl_loss(y: jnp.ndarray, y_hat: jnp.ndarray,
            sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch ``F.kl_div(y_hat.softmax().log(), y.softmax(), reduction='sum')``."""
    p = jax.nn.softmax(y, axis=-1)
    logq = jax.nn.log_softmax(y_hat, axis=-1)
    per_row = jnp.sum(p * (jnp.log(jnp.clip(p, min=1e-12)) - logq), axis=-1)
    if sample_mask is not None:
        per_row = per_row * sample_mask.astype(per_row.dtype)
    return jnp.sum(per_row)


def cosine_loss(y: jnp.ndarray, y_hat: jnp.ndarray) -> jnp.ndarray:
    sim = _cos(y, y_hat)
    return 1.0 - sim


def orthogonal_loss(p: jnp.ndarray, p_hat: jnp.ndarray, g: jnp.ndarray,
                    g_hat: jnp.ndarray, gamma: float = 0.5) -> jnp.ndarray:
    """Subspace orthogonality loss (reference ``models/cmta_utils.py:1210-1228``)."""
    sg = jax.lax.stop_gradient
    pos = (1.0 - jnp.abs(_cos(sg(p), p_hat))) + (1.0 - jnp.abs(_cos(sg(g), g_hat)))
    neg = (jnp.abs(_cos(p, g)) + jnp.abs(_cos(sg(p), g_hat))
           + jnp.abs(_cos(sg(g), p_hat)))
    return pos + gamma * neg


def _cos(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    num = jnp.sum(a * b, axis=1)
    den = jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(b, axis=1)
    return num / jnp.maximum(den, eps)


def batch_similarity_loss(omic: jnp.ndarray, vgrid: jnp.ndarray,
                          sample_mask: Optional[jnp.ndarray] = None,
                          layout: str = "group") -> jnp.ndarray:
    """Subspace batch-similarity loss (reference ``utils/loss.py:7-40``), summed.

    omic: (N, F) global-batch omic vectors (the reference passes the (N, T, F)
    broadcast; its row-normalized similarity is identical).
    vgrid: (N, g, ...) per-sample offset grids.

    ``layout='group'`` (default): similarity is computed per offset GROUP over
    the batch and averaged over groups — the documented intent of the loss.
    ``layout='reference'``: the reference's arithmetic verbatim — its
    ``vgrid.view(8, N, -1)`` (``utils/loss.py:23``) reinterprets the batch-major
    ``(N*g, ...)`` tensor as 8 row-blocks of N consecutive rows, which at
    N == g == 8 makes each "group" matrix actually one SAMPLE's 8 offset-group
    rows.  Exposed (as with ``modulation_style='reference'``) so training and
    the gradient-parity harness can match the reference bit-for-bit.  With a
    ``sample_mask`` (eval attaches one to every batch, all-valid or not) the
    masked extension below zeroes the rows whose UNDERLYING sample is padded
    (flat row k*n+j belongs to sample (k*n+j)//g) — for an all-valid mask it
    reduces to the verbatim reference arithmetic.
    """
    n = omic.shape[0]
    omic2 = omic.reshape(n, -1)
    g = vgrid.shape[1]
    if layout == "reference":
        if g != 8:
            # the reference literally writes view(8, N, -1); any other group
            # count would silently pair rows from unrelated samples/groups
            raise ValueError(
                f"batchloss_layout='reference' replicates the reference's "
                f"hard-coded vgrid.view(8, N, -1) and requires offset_groups "
                f"== 8 (got {g}); use layout='group'")
        v = vgrid.reshape(n * g, -1).reshape(8, n, -1)   # ref view(8, N, -1)
    elif layout == "group":
        v = jnp.moveaxis(vgrid.reshape(n, g, -1), 1, 0)  # (g, N, F)
    else:
        raise ValueError(f"unknown batchloss layout {layout!r}")

    if sample_mask is None:
        sim = omic2 @ omic2.T
        sim = sim / jnp.linalg.norm(sim, axis=1, keepdims=True)
        vsim = jnp.einsum("gif,gjf->gij", v, v)
        vsim = vsim / jnp.linalg.norm(vsim, axis=2, keepdims=True)
        return jnp.sum((sim - vsim.mean(axis=0)) ** 2 / n)

    # masked: identical to computing on the valid-rows submatrix (zeroed pad rows
    # contribute nothing to row norms; pad rows/cols excluded from the sum)
    m = sample_mask.astype(omic2.dtype)
    omic2 = omic2 * m[:, None]
    sim = omic2 @ omic2.T
    sim = sim / jnp.maximum(jnp.linalg.norm(sim, axis=1, keepdims=True), 1e-30)
    if layout == "reference":
        # flat row k*n+j of the reference's (8, N) view belongs to sample
        # (k*n+j)//g; zero rows whose sample is padded
        rmask = m[jnp.arange(8 * n) // g].reshape(8, n)
        v = v * rmask[:, :, None]
    else:
        v = v * m[None, :, None]
    vsim = jnp.einsum("gif,gjf->gij", v, v)
    vsim = vsim / jnp.maximum(jnp.linalg.norm(vsim, axis=2, keepdims=True), 1e-30)
    diff = (sim - vsim.mean(axis=0)) ** 2 * (m[:, None] * m[None, :])
    return jnp.sum(diff) / jnp.maximum(m.sum(), 1.0)


def task_loss(logits: jnp.ndarray, labels: jnp.ndarray, task_type: str,
              hazards: Optional[jnp.ndarray] = None, s: Optional[jnp.ndarray] = None,
              train: bool = True,
              sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dispatch the reference's per-task loss (train vs test class weights)."""
    if task_type == "survival":
        h = hazards if hazards is not None else jax.nn.sigmoid(logits)
        return nll_surv_loss(h, s, labels[:, 8], labels[:, 9], alpha=0.0,
                             sample_mask=sample_mask)
    slot = TASK_LABEL_SLOT[task_type]
    weights = (TASK_WEIGHTS_TRAIN if train else TASK_WEIGHTS_TEST)[task_type]
    return weighted_cross_entropy(logits, labels[:, slot], weights,
                                  sample_mask=sample_mask)
