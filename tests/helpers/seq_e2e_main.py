"""Subprocess body for the data+seq-parallel e2e equivalence check.

Run by tests/test_seq_parallel.py::test_seq_parallel_train_step_matches_data_parallel
in its own interpreter: XLA's CPU in-process collectives SIGABRT the whole process on
a (hardcoded 40 s) rendezvous timeout when device threads are starved on a loaded
host — isolation keeps that environment flake from killing the pytest session.

Prints one JSON line: {"loss_dp": ..., "loss_sp": ..., "max_abs": ..., "max_rel": ...}
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))

    import numpy as np
    import jax.numpy as jnp

    from sml_tpu.config import Config
    from sml_tpu.models.factory import define_net, define_optimizer, init_model
    from sml_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from sml_tpu.train.state import TrainState
    from sml_tpu.train.steps import make_train_step

    # sgd (not adam): adam's first-step update is +-lr for ANY nonzero grad, so it
    # amplifies reduction-order noise in near-zero grads into +-2*lr param diffs;
    # sgd keeps param deltas proportional to the grads being compared
    kw = dict(mode="path", path_arch="transmil", fixdim=64, batch_size=8,
              task_type="survival", gradient_modulate=False, return_vgrid=False,
              dropout_rate=0.0, optimizer="sgd")
    cfg_dp = Config(num_devices=8, **kw)
    cfg_sp = Config(num_devices=8, seq_devices=4, **kw)

    rng = np.random.default_rng(3)
    labels = np.zeros((8, 12), np.float32)
    labels[:, 8] = np.arange(8) % 4
    labels[:, 9] = (np.arange(8) // 4) % 2
    labels[:, 11] = np.arange(8) + 1.0
    batch = {
        "x_path": jnp.asarray(rng.normal(size=(8, 64, 1024)).astype(np.float32)),
        "labels": jnp.asarray(labels),
    }

    model_dp = define_net(cfg_dp)
    variables = init_model(cfg_dp, model_dp, jax.random.PRNGKey(0), batch)
    # host copy: the donated train-step state would otherwise delete the buffers
    # aliased by device_put between the two runs below
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))

    def two_steps(cfg, model):
        mesh = make_mesh(cfg)
        tx = define_optimizer(cfg, steps_per_epoch=4)
        state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
        state = replicate_tree(mesh, state)
        dev = shard_batch(mesh, batch)
        step = make_train_step(cfg, model, tx)
        state, m1 = step(state, dev)          # loss1: forward parity
        state, m2 = step(state, dev)          # loss2: gradient/update parity
        return float(m1["loss"]), float(m2["loss"]), jax.device_get(state.params)

    l1_dp, l2_dp, params_dp = two_steps(cfg_dp, model_dp)
    l1_sp, l2_sp, params_sp = two_steps(cfg_sp, define_net(cfg_sp))

    assert (jax.tree_util.tree_structure(params_dp)
            == jax.tree_util.tree_structure(params_sp)), "param trees differ"

    max_abs = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(params_dp),
                    jax.tree_util.tree_leaves(params_sp)):
        max_abs = max(max_abs, float(np.abs(np.asarray(a) - np.asarray(b)).max()))

    print(json.dumps({"loss1_dp": l1_dp, "loss1_sp": l1_sp,
                      "loss2_dp": l2_dp, "loss2_sp": l2_sp,
                      "max_abs_param_diff": max_abs}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
