#!/usr/bin/env python
"""Inference CLI (reference ``inference.py``): load a checkpoint, evaluate on Test.

Usage:
    python inference.py --model_fp ./checkpoints/best_modal --mode deformpathomic
"""

from __future__ import annotations

import os
import sys


def main(argv=None) -> int:
    from sml_tpu.config import Config, build_parser, full_cli_config, yaml_config_hook

    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "config", "config_mine.yaml")
    yaml_cfg = full_cli_config(yaml_config_hook(cfg_path))
    parser = build_parser(yaml_cfg)
    parser.add_argument("--model_fp", default="", type=str,
                        help="checkpoint path (weights-only, e.g. .../best_modal)")
    parser.add_argument("--attribution", default="", type=str,
                        choices=["", "mcat_groups", "ablation", "permutation",
                                 "gradient_shap", "deep_shap"],
                        help="post-eval gene attribution: 'mcat_groups' = per-"
                             "signature-group IG through the co-attention stack "
                             "(reference MCAT_Surv.captum, model.py:669-705); "
                             "'ablation' = zero-gene accuracy drop (reference "
                             "utils/metrics.py:199-232, all genes not 2); "
                             "'permutation' = eli5-style column-shuffle score drop "
                             "(utils/permutation_importance.py); 'gradient_shap' = "
                             "expected-gradients SHAP (replaces the broken "
                             "shap.DeepExplainer path, utils/feature_importance.py)")
    args = parser.parse_args(argv)
    model_fp = args.model_fp
    attribution = args.attribution
    d = vars(args)
    d.pop("model_fp")
    d.pop("attribution")
    config = Config(**d)

    if not model_fp or not os.path.exists(model_fp):
        raise FileNotFoundError(
            f"checkpoint not found: {model_fp!r} — pass --model_fp")

    from sml_tpu.parallel import distributed

    distributed.initialize(config)  # multi-host bootstrap; no-op single-host

    import jax

    from sml_tpu.data.loader import Loader, build_datasets
    from sml_tpu.models.factory import define_net, init_model
    from sml_tpu.parallel.mesh import make_mesh, replicate_tree
    from sml_tpu.train import checkpoint as ckpt
    from sml_tpu.train.evaluate import evaluate
    from sml_tpu.train.steps import make_eval_step
    from sml_tpu.utils.logging import MetricLogger

    mesh = make_mesh(config)
    test_ds = build_datasets(config, "Test")
    test_loader = Loader(test_ds, config.batch_size)

    model = define_net(config)
    init_batch = next(iter(test_loader))
    init_batch.pop("sample_mask", None)
    variables = init_model(config, model, jax.random.PRNGKey(config.seed),
                           init_batch)
    variables = ckpt.restore_weights(model_fp, variables)
    variables = replicate_tree(mesh, variables)

    eval_step = make_eval_step(config, model)
    metrics = evaluate(config, eval_step, variables, test_loader, mesh)
    print(f"test metrics: {metrics}")

    logger = MetricLogger(config, out_dir=config.checkpoints, disabled=config.debug)
    logger.log({"test": metrics})

    if attribution == "mcat_groups":
        if config.mode != "mcat":
            raise ValueError("--attribution mcat_groups requires --mode mcat")
        import numpy as np

        from sml_tpu.utils.importance import mcat_group_attribution

        sizes = getattr(model, "omic_sizes", None)
        per_gene, per_group = mcat_group_attribution(
            model, variables, list(test_loader), omic_sizes=sizes)
        out_csv = _write_gene_csv(config.checkpoints, "gene_importance.csv",
                                  per_gene)
        print("per-signature-group |IG| attribution of survival risk "
              f"(groups of {tuple(sizes or (100, 100, 100, 131))} genes): "
              f"{np.array2string(per_group, precision=6)}")
        print(f"per-gene attribution written to {out_csv}")
        logger.log({"attribution": {"groups": [float(v) for v in per_group]}})
    elif attribution:
        per_gene = _gene_attribution(config, model, variables, eval_step,
                                     test_loader, attribution)
        name = ("difference_acc_list.csv" if attribution == "ablation"
                else "gene_importance.csv")  # reference filenames
        out_csv = _write_gene_csv(config.checkpoints, name, per_gene)
        print(f"{attribution} attribution over {len(per_gene)} genes "
              f"written to {out_csv} (top gene: {int(per_gene.argmax())})")
        logger.log({"attribution": {attribution: float(per_gene.max())}})

    logger.close()
    return 0


def _write_gene_csv(out_dir, name, values):
    os.makedirs(out_dir, exist_ok=True)  # --debug skips MetricLogger's makedirs
    path = os.path.join(out_dir, name)
    with open(path, "w") as f:
        f.write("gene_index,importance\n")
        for i, v in enumerate(values):
            f.write(f"{i},{v}\n")
    return path


def _gene_attribution(config, model, variables, eval_step, test_loader, kind):
    """Whole-omic-vector gene attribution (reference L7 surface).

    ablation    -> per-gene accuracy drop when zeroed (``utils/metrics.py:199-232``;
                   classification tasks, ALL genes instead of the reference's 2)
    permutation -> eli5-style mean score decrease over shuffled columns
                   (``utils/permutation_importance.py:61-100``); score is accuracy
                   (classification) or C-index (survival)
    gradient_shap -> expected-gradients SHAP vs the test-set background
                   (replacing ``utils/feature_importance.py:37-72``)
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from sml_tpu.models.factory import model_inputs
    from sml_tpu.train.losses import TASK_LABEL_SLOT
    from sml_tpu.train.metrics import cindex
    from sml_tpu.utils import importance as imp

    if config.mode == "deformpathomic" or config.mode == "path":
        raise ValueError(f"--attribution {kind} needs a whole-omic-vector mode "
                         "(omic/pathomic/pathomic_original/mcat/cmta)")

    batches, labels = [], []
    for b in test_loader:
        mask = np.asarray(b["sample_mask"]) > 0
        hb = {k: np.asarray(v)[mask] for k, v in b.items() if k != "sample_mask"}
        if len(hb["labels"]):
            batches.append(hb)
            labels.append(hb["labels"])
    labels = np.concatenate(labels)

    if kind == "ablation":
        if config.task_type == "survival":
            raise ValueError("--attribution ablation scores accuracy; use a "
                             "classification task (reference semantics)")

        def predict_probs(b):
            return np.asarray(eval_step(variables, b)["probs"])

        gt = labels[:, TASK_LABEL_SLOT[config.task_type]].astype(int)
        return imp.ablation_importance(predict_probs, batches, gt)

    if kind == "permutation":
        omic = np.concatenate([b["x_omic"] for b in batches])
        sizes = [len(b["x_omic"]) for b in batches]

        def score(x):
            outs, off = [], 0
            for b, n in zip(batches, sizes):
                bb = dict(b)
                bb["x_omic"] = x[off:off + n].astype(np.float32)
                off += n
                outs.append(eval_step(variables, bb))
            if config.task_type == "survival":
                risk = np.concatenate([np.asarray(o["risk"]) for o in outs])
                return float(cindex(risk, labels[:, 9], labels[:, 11]))
            preds = np.concatenate([np.argmax(np.asarray(o["probs"]), -1)
                                    for o in outs])
            gt = labels[:, TASK_LABEL_SLOT[config.task_type]]
            return float((preds == gt).mean())

        _, decreases = imp.get_score_importances(score, omic, n_iter=3,
                                                 seed=config.seed)
        return decreases.mean(axis=0)

    if kind == "gradient_shap":
        background = np.concatenate([b["x_omic"] for b in batches])
        slot = TASK_LABEL_SLOT.get(config.task_type)

        def loss_fn(omic, batch):
            kwargs = model_inputs(config, {**batch, "x_omic": omic})
            out = model.apply(variables, **kwargs, deterministic=True)
            logits = out["logits"]
            if config.task_type == "survival":
                hazards = out.get("hazards", jax.nn.sigmoid(logits))
                s = out.get("S", jnp.cumprod(1.0 - hazards, axis=1))
                return jnp.sum(-jnp.sum(s, axis=1))   # summed risk
            logp = jax.nn.log_softmax(logits, axis=1)
            y = jnp.asarray(batch["labels"][:, slot]).astype(jnp.int32)
            return jnp.sum(jnp.take_along_axis(logp, y[:, None], axis=1))

        attrs = [imp.gradient_shap(loss_fn, b, background, seed=config.seed)
                 for b in batches]
        return np.abs(np.concatenate(attrs)).mean(axis=0)

    if kind == "deep_shap":
        # exact DeepLIFT-rescale estimator (the reference's shap.DeepExplainer
        # slot, utils/feature_importance.py:37-72): MaxNet MLP (omic mode) or
        # the full fused head (pathomic modes — rescale chain through the
        # gated BilinearFusion, utils/importance.py:deep_shap_pathomic)
        if config.mode not in ("omic", "pathomic", "pathomic_original"):
            raise ValueError("--attribution deep_shap runs the exact DeepLIFT "
                             "chain through MaxNet (--mode omic) or the fused "
                             "PathomicNet head (--mode pathomic[_original]); "
                             "gradient_shap covers the other modes")
        background = np.concatenate([b["x_omic"] for b in batches])
        per_class = []
        for c in range(config.label_dim):
            attrs = []
            for b in batches:
                if config.mode == "omic":
                    attrs.append(imp.deep_shap_maxnet(
                        variables["params"], b["x_omic"], background,
                        class_index=c))
                else:
                    out = model.apply(variables,
                                      x_path=jnp.asarray(b["x_path"]),
                                      x_omic=jnp.asarray(b["x_omic"]),
                                      deterministic=True)
                    attrs.append(imp.deep_shap_pathomic(
                        variables, b["x_omic"], background,
                        np.asarray(out["path_vec"]), class_index=c,
                        fusion_type=config.fusion_type, skip=config.skip))
            per_class.append(np.abs(np.concatenate(attrs)).mean(axis=0))
        return np.mean(per_class, axis=0)

    raise ValueError(kind)


if __name__ == "__main__":
    sys.exit(main())
