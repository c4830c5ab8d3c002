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
    args = parser.parse_args(argv)
    model_fp = args.model_fp
    d = vars(args)
    d.pop("model_fp")
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
    logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
