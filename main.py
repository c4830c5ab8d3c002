#!/usr/bin/env python
"""Train CLI (reference ``main.py``): YAML -> auto-flags -> single-program SPMD training.

Usage:
    python main.py --mode deformpathomic --task_type survival --epochs 20
Any key in config/config_mine.yaml is a flag.
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
    args = parser.parse_args(argv)
    config = Config(**vars(args))

    os.makedirs(config.checkpoints, exist_ok=True)

    # multi-host bootstrap BEFORE any backend touch (no-op single-host) —
    # the reference's mp.spawn + init_process_group (main.py:26-28,148-149)
    from sml_tpu.parallel import distributed

    distributed.initialize(config)

    from sml_tpu.train.loop import train
    from sml_tpu.utils.logging import MetricLogger

    logger = MetricLogger(config, out_dir=config.checkpoints,
                          disabled=config.debug or not distributed.is_primary())
    try:
        _, best = train(config, logger)
        print(f"\nbest (val): {best}")
    finally:
        logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
