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
                        choices=["", "mcat_groups"],
                        help="post-eval attribution: 'mcat_groups' = per-signature-"
                             "group integrated gradients through the co-attention "
                             "stack (reference MCAT_Surv.captum, model.py:669-705)")
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

        per_gene, per_group = mcat_group_attribution(
            model, variables, list(test_loader))
        out_csv = os.path.join(config.checkpoints, "gene_importance.csv")
        with open(out_csv, "w") as f:
            f.write("gene_index,importance\n")
            for i, v in enumerate(per_gene):
                f.write(f"{i},{v}\n")
        print("per-signature-group |IG| attribution of survival risk "
              f"(groups of {(100, 100, 100, 131)} genes): "
              f"{np.array2string(per_group, precision=6)}")
        print(f"per-gene attribution written to {out_csv}")
        logger.log({"attribution": {"groups": [float(v) for v in per_group]}})

    logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
