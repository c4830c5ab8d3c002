"""Jitted functional train/eval steps for every mode (reference ``train_test.py``).

One program, global batch: under a data-parallel mesh the batch arrives sharded on the
'data' axis and XLA inserts the gradient all-reduce and the BatchLoss all-gather that
the reference implements with DDP + GatherLayer.  Gradient modulation runs in-graph
(including the per-batch survival C-index the reference computes in numpy mid-step,
``train_test.py:123-134``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from sml_tpu.config import Config
from sml_tpu.models.factory import model_inputs
from sml_tpu.train import losses
from sml_tpu.train.metrics import batch_cindex
from sml_tpu.train.state import TrainState


def _forward(config: Config, model, variables, batch, rng, train: bool):
    """Apply the model; returns (out, new_batch_stats)."""
    kwargs = model_inputs(config, batch)
    mutable = ["batch_stats"] if "batch_stats" in variables else False
    if train:
        result = model.apply(variables, **kwargs, deterministic=False,
                             rngs={"dropout": rng}, mutable=mutable)
    else:
        result = model.apply(variables, **kwargs, deterministic=True,
                             mutable=False)
        return result, None
    if mutable:
        out, mutated = result
        return out, mutated.get("batch_stats", None)
    return result, None


def _survival_loss(config: Config, hazards: jnp.ndarray, s: jnp.ndarray,
                   labels: jnp.ndarray, sample_mask=None) -> jnp.ndarray:
    """Config-selected survival loss (reference ``models/cmta_utils.py:1091-1118``).

    ``nll_surv`` (+ its ``nll_surv_*`` aux variants) and ``ce_surv`` are
    discrete-hazard losses; ``cox_surv`` ranks the aggregate risk ``-sum(S)``.
    """
    name = config.survival_loss
    y, c = labels[:, 8], labels[:, 9]
    if name == "ce_surv":
        return losses.ce_surv_loss(hazards, s, y, c, alpha=0.0,
                                   sample_mask=sample_mask)
    if name == "cox_surv":
        risk = -jnp.sum(s, axis=1)
        return losses.cox_loss(labels[:, 11], 1.0 - c, risk,
                               sample_mask=sample_mask)
    if name == "nll_surv" or name.startswith("nll_surv_"):
        return losses.nll_surv_loss(hazards, s, y, c, alpha=0.0,
                                    sample_mask=sample_mask)
    raise NotImplementedError(f"survival_loss [{name}]")


def _cmta_alignment(config: Config, out: Dict[str, Any],
                    sample_mask=None) -> jnp.ndarray:
    """CMTA alignment term.  Default = the reference's ACTIVE behavior
    (plain L1 on detached cls tokens, ``train_test.py:370-373``); a
    ``survival_loss`` zoo variant (``nll_surv_{kl,mse,l1,cos,ol}``) swaps in the
    corresponding auxiliary loss (``models/cmta_utils.py:1098-1117``)."""
    sg = jax.lax.stop_gradient
    p, p_hat, g, g_hat = out["P"], out["P_hat"], out["G"], out["G_hat"]
    name = config.survival_loss if config.task_type == "survival" else "nll_surv"
    if name == "nll_surv_ol":
        return losses._masked_mean(
            losses.orthogonal_loss(p, p_hat, g, g_hat, gamma=0.5), sample_mask)
    pair = {
        "nll_surv_kl": lambda a, b: losses.kl_loss(a, b, sample_mask=sample_mask),
        "nll_surv_mse": lambda a, b: losses._masked_mean((a - b) ** 2, sample_mask),
        "nll_surv_l1": lambda a, b: losses.l1_loss(a, b, sample_mask=sample_mask),
        "nll_surv_cos": lambda a, b: losses._masked_mean(
            losses.cosine_loss(a, b), sample_mask),
    }.get(name, lambda a, b: losses.l1_loss(a, b, sample_mask=sample_mask))
    return 0.5 * (pair(sg(p), p_hat) + pair(sg(g), g_hat))


def compute_mode_loss(config: Config, out: Dict[str, Any], labels: jnp.ndarray,
                      train: bool = True, sample_mask=None
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-mode total loss (reference ``train_test.py:60-77, 349-375``).

    ``sample_mask`` (eval only): excludes wrap-padded tail rows so the final
    batch's loss matches the reference's smaller remainder batch exactly."""
    mode, task = config.mode, config.task_type
    aux: Dict[str, jnp.ndarray] = {}

    if mode == "deformpathomic":
        main = out["logits"]
        if task == "survival":
            # model already applied sigmoid: logits ARE hazards
            s = jnp.cumprod(1.0 - main, axis=1)
            loss3 = _survival_loss(config, main, s, labels, sample_mask)
        else:
            loss3 = losses.task_loss(main, labels, task, train=train,
                                     sample_mask=sample_mask)
        total = loss3
        if config.return_vgrid:
            layout = getattr(config, "batchloss_layout", "group")
            bs_t = losses.batch_similarity_loss(out["omic_tumor"], out["vgrid_tumor"],
                                                sample_mask=sample_mask,
                                                layout=layout)
            bs_i = losses.batch_similarity_loss(out["omic_immune"],
                                                out["vgrid_immune"],
                                                sample_mask=sample_mask,
                                                layout=layout)
            batch_sim = 0.5 * bs_t + 0.5 * bs_i
            if config.batchloss_grad_scale == "ddp":
                # reference GatherLayer semantics: full VALUE, 1/world-scaled GRADIENT
                w = max(config.num_devices or len(jax.devices()), 1)
                batch_sim = (batch_sim / w
                             + jax.lax.stop_gradient(batch_sim * (1.0 - 1.0 / w)))
            total = loss3 + batch_sim
            aux["batch_sim_loss"] = batch_sim
        aux["loss3"] = loss3
        return total, aux

    if mode in ("path", "omic", "mcat", "cmta"):
        logits = out["logits"]
        if task == "survival":
            hazards = out.get("hazards", jax.nn.sigmoid(logits))
            s = out.get("S", jnp.cumprod(1.0 - hazards, axis=1))
            loss3 = _survival_loss(config, hazards, s, labels, sample_mask)
        else:
            loss3 = losses.task_loss(logits, labels, task, train=train,
                                     sample_mask=sample_mask)
        total = loss3
        if mode == "cmta":
            sim = _cmta_alignment(config, out, sample_mask)
            total = loss3 + sim
            aux["alignment_loss"] = sim
        aux["loss3"] = loss3
        return total, aux

    if mode in ("pathomic", "pathomic_original"):
        logits = out["logits"]
        if task == "survival":
            hazards = jax.nn.sigmoid(logits)
            s = jnp.cumprod(1.0 - hazards, axis=1)
            loss3 = _survival_loss(config, hazards, s, labels, sample_mask)
        else:
            loss3 = losses.task_loss(logits, labels, task, train=train,
                                     sample_mask=sample_mask)
        aux["loss3"] = loss3
        return loss3, aux

    raise NotImplementedError(mode)


# ---------------------------------------------------------------------------
# gradient modulation (reference train_test.py:87-184)
# ---------------------------------------------------------------------------

def _branch_ratios(config: Config, params, out, labels):
    """Per-branch performance ratios from the classifier-weight halves."""
    hs = config.mmhid
    kernel = params["classifier"]["kernel"]       # (2*hs, L)
    bias = params["classifier"]["bias"]
    out_t = out["vec_tumor"] @ kernel[:hs, :] + bias / 2.0
    out_i = out["vec_immune"] @ kernel[hs:, :] + bias / 2.0

    if config.task_type == "survival":
        s_t = jnp.cumprod(1.0 - jax.nn.sigmoid(out_t), axis=1)
        s_i = jnp.cumprod(1.0 - jax.nn.sigmoid(out_i), axis=1)
        risk_t = -jnp.sum(s_t, axis=1)
        risk_i = -jnp.sum(s_i, axis=1)
        censor, survtime = labels[:, 9], labels[:, 11]
        c_t, valid_t = batch_cindex(risk_t, censor, survtime)
        c_i, valid_i = batch_cindex(risk_i, censor, survtime)
        valid = valid_t & valid_i & (c_i > 0)
        ratio_t = jnp.where(valid, c_t / jnp.maximum(c_i, 1e-8), 1.0)
    else:
        slot = losses.TASK_LABEL_SLOT[config.task_type]
        y = labels[:, slot].astype(jnp.int32)
        score = lambda o: jnp.take_along_axis(
            jax.nn.softmax(o, axis=1), y[:, None], axis=1).sum()
        score_t, score_i = score(out_t), score(out_i)
        valid = jnp.asarray(True)
        ratio_t = score_t / jnp.maximum(score_i, 1e-12)
    ratio_i = 1.0 / jnp.maximum(ratio_t, 1e-12)
    return ratio_t, ratio_i, valid


def modulate_classifier_grads(config: Config, grads, params, out, labels):
    """Project conflicting per-class gradients of the fused classifier.

    ``modulation_style='reference'`` reproduces the reference's exact arithmetic
    (``train_test.py:156-184``: the projection component is subtracted twice before
    renormalizing to the once-projected norm); ``'orthogonal'`` is the clean PCGrad
    projection.
    """
    ratio_t, ratio_i, valid = _branch_ratios(config, params, out, labels)
    hs = config.mmhid
    gk = grads["classifier"]["kernel"]            # (2*hs, L)
    g_t, g_i = gk[:hs, :], gk[hs:, :]

    def project(g, onto):                          # both (hs, L); per-column math
        dot = jnp.sum(g * onto, axis=0)                       # (L,)
        onto_sq = jnp.maximum(jnp.sum(onto * onto, axis=0), 1e-12)
        proj = (dot / onto_sq)[None, :] * onto                # projection component
        a = g - proj
        if config.modulation_style == "reference":
            perpen = a - proj
            norm_p = jnp.maximum(jnp.linalg.norm(perpen, axis=0), 1e-12)
            norm_a = jnp.linalg.norm(a, axis=0)
            return (norm_a / norm_p)[None, :] * perpen
        return a

    sim = jnp.sum(g_t * g_i, axis=0) / jnp.maximum(
        jnp.linalg.norm(g_t, axis=0) * jnp.linalg.norm(g_i, axis=0), 1e-12)
    conflict = (sim < 0) & valid

    mod_t = conflict & (ratio_t < 1)
    mod_i = conflict & ~(ratio_t < 1) & (ratio_i < 1)

    new_g_t = jnp.where(mod_t[None, :], project(g_t, g_i), g_t)
    new_g_i = jnp.where(mod_i[None, :], project(g_i, g_t), g_i)

    new_kernel = jnp.concatenate([new_g_t, new_g_i], axis=0)
    new_grads = dict(grads)
    new_grads["classifier"] = dict(grads["classifier"], kernel=new_kernel)
    return new_grads


# ---------------------------------------------------------------------------
# step builders
# ---------------------------------------------------------------------------

def make_train_step(config: Config, model, tx: optax.GradientTransformation,
                    jit: bool = True
                    ) -> Callable[[TrainState, Dict[str, Any]],
                                  Tuple[TrainState, Dict[str, Any]]]:
    def train_step(state: TrainState, batch: Dict[str, Any]):
        rng, step_rng = jax.random.split(state.rng)
        labels = batch["labels"]

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, new_bs = _forward(config, model, variables, batch, step_rng,
                                   train=True)
            total, aux = compute_mode_loss(config, out, labels, train=True)
            return total, (out, new_bs, aux)

        (loss, (out, new_bs, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        if (config.mode == "deformpathomic" and config.gradient_modulate
                and config.fusion_type == "concat"):
            # modulation splits the fused classifier kernel into tumor/immune halves,
            # which only exists under concat fusion (reference assumes the same:
            # train_test.py:90-93 slices weight[:, :mmhid] / [:, mmhid:])
            grads = modulate_classifier_grads(config, grads, state.params, out, labels)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, rng=rng,
                                  batch_stats=new_bs if new_bs is not None
                                  else state.batch_stats)
        metrics = {"loss": loss, **aux}
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_epoch_scan(config: Config, model, tx: optax.GradientTransformation,
                    num_steps: int):
    """Device-loop trainer: ONE dispatch runs ``num_steps`` train steps via lax.scan
    over stacked device-resident batches (B-leading axis num_steps).

    Amortizes per-dispatch host/tunnel overhead; use when an epoch (or a chunk of it)
    fits on device — e.g. packed/synthetic data.  Returns jitted
    (state, batches) -> (state, stacked metrics).  Batch buffers are donated so a
    streamed caller (train/loop.py chunked device loop) keeps at most two chunks
    resident in HBM.
    """
    step = make_train_step(config, model, tx, jit=False)

    def epoch(state: TrainState, batches: Dict[str, Any]):
        def body(s, batch):
            s, m = step(s, batch)
            return s, m

        return jax.lax.scan(body, state, batches, length=num_steps)

    return jax.jit(epoch, donate_argnums=(0, 1))


def make_eval_step(config: Config, model) -> Callable[..., Dict[str, jnp.ndarray]]:
    """Returns a jitted fn (variables, batch) -> per-sample eval quantities."""

    def eval_step(variables, batch):
        sample_mask = batch.get("sample_mask")
        batch = {k: v for k, v in batch.items() if k != "sample_mask"}
        out, _ = _forward(config, model, variables, batch, None, train=False)
        logits = out["logits"]
        result: Dict[str, jnp.ndarray] = {}
        if config.task_type == "survival":
            if config.mode == "deformpathomic":
                hazards = logits                      # sigmoided in-model
            else:
                hazards = out.get("hazards", jax.nn.sigmoid(logits))
            s = out.get("S", jnp.cumprod(1.0 - hazards, axis=1))
            result["risk"] = -jnp.sum(s, axis=1)
        else:
            result["probs"] = jax.nn.softmax(logits, axis=1)
        loss, _ = compute_mode_loss(config, out, batch["labels"], train=False,
                                    sample_mask=sample_mask)
        result["loss"] = loss
        return result

    return jax.jit(eval_step)
