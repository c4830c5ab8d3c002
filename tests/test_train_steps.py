"""Train-step tests: loss decreases on synthetic signal, gradient modulation math,
8-device data-parallel sharding equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.config import Config
from sml_tpu.data.loader import Loader
from sml_tpu.data.synthetic import SyntheticDataset
from sml_tpu.models.factory import define_net, define_optimizer, init_model
from sml_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from sml_tpu.train.state import TrainState
from sml_tpu.train.steps import (compute_mode_loss, make_eval_step, make_train_step,
                                 modulate_classifier_grads)

from tests.test_models import make_batch, small_config


def _setup(config):
    model = define_net(config)
    batch = make_batch(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    tx = define_optimizer(config, steps_per_epoch=10)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    return model, state, tx, batch


@pytest.mark.parametrize("mode", ["omic", "deformpathomic", "cmta"])
def test_train_step_runs_and_updates(mode):
    config = small_config(mode=mode, batch_size=4)
    model, state, tx, batch = _setup(config)
    step = make_train_step(config, model, tx)
    labels = np.zeros((4, 12), np.float32)
    labels[:, 5] = np.arange(4) % 4
    batch["labels"] = jnp.asarray(labels)

    old_params = jax.device_get(state.params)  # state is donated by the step
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params actually changed
    new_params = jax.device_get(new_state.params)
    diff = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).sum()),
                                  new_params, old_params)
    assert sum(jax.tree_util.tree_leaves(diff)) > 0
    assert int(new_state.step) == 1


def test_omic_loss_decreases_on_synthetic_signal():
    config = Config(mode="omic", dataset="synthetic", synthetic_size=64,
                    batch_size=16, fixdim=64, task_type="diag2021", label_dim=4,
                    lr=1e-3, lr_policy="none", gradient_modulate=False,
                    return_vgrid=False)
    ds = SyntheticDataset("Train", config)
    loader = Loader(ds, config.batch_size, shuffle=True, drop_last=True,
                    seed=0)
    model, state, tx, _ = _setup(config.replace(fixdim=64))
    step = make_train_step(config, model, tx)

    losses = []
    for epoch in range(8):
        loader.set_epoch(epoch)
        for batch in loader:
            batch.pop("sample_mask")
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.9


def test_gradient_modulation_changes_only_conflicting_columns():
    config = small_config(mode="deformpathomic", batch_size=4, mmhid=2, label_dim=3)
    hs = 2
    rng = np.random.default_rng(7)
    params = {"classifier": {"kernel": jnp.asarray(
        rng.normal(size=(2 * hs, 3)), jnp.float32), "bias": jnp.zeros(3)}}
    out = {"vec_tumor": jnp.asarray(rng.normal(size=(4, hs)), jnp.float32),
           "vec_immune": jnp.asarray(rng.normal(size=(4, hs)), jnp.float32)}
    labels = np.zeros((4, 12), np.float32)
    labels[:, 5] = [0, 1, 2, 0]
    labels = jnp.asarray(labels)

    # column 0: conflicting grads (opposite), column 1: aligned, column 2: orthogonal-ish
    g_t = jnp.asarray([[1.0, 1.0, 1.0], [0.0, 1.0, 0.0]])
    g_i = jnp.asarray([[-1.0, 1.0, 0.0], [0.0, 1.0, 0.5]])
    grads = {"classifier": {"kernel": jnp.concatenate([g_t, g_i], axis=0),
                            "bias": jnp.zeros(3)}}

    new = modulate_classifier_grads(config, grads, params, out, labels)
    nk = np.asarray(new["classifier"]["kernel"])
    ok = np.asarray(grads["classifier"]["kernel"])
    # aligned column unchanged
    np.testing.assert_allclose(nk[:, 1], ok[:, 1])
    # conflicting column 0: exactly one half modified
    changed_t = not np.allclose(nk[:hs, 0], ok[:hs, 0])
    changed_i = not np.allclose(nk[hs:, 0], ok[hs:, 0])
    assert changed_t != changed_i


def test_modulation_orthogonal_style_projects():
    config = small_config(mode="deformpathomic", batch_size=2, mmhid=2, label_dim=2,
                          modulation_style="orthogonal", task_type="diag2021")
    # ratio_t < 1: tumor branch gives low prob on the true class (0), immune high
    kernel = jnp.asarray([[2.0, 0.0], [2.0, 0.0], [2.0, 0.0], [2.0, 0.0]])
    params = {"classifier": {"kernel": kernel, "bias": jnp.zeros(2)}}
    out = {"vec_tumor": jnp.asarray([[-1.0, -1.0], [-1.0, -1.0]]),
           "vec_immune": jnp.asarray([[1.0, 1.0], [1.0, 1.0]])}
    labels = jnp.zeros((2, 12))  # class 0 in slot 5

    g_t = jnp.asarray([[1.0, 0.3], [0.5, 0.3]])
    g_i = jnp.asarray([[-1.0, 0.3], [0.0, 0.3]])
    grads = {"classifier": {"kernel": jnp.concatenate([g_t, g_i], axis=0),
                            "bias": jnp.zeros(2)}}
    new = modulate_classifier_grads(config, grads, params, out, labels)
    nk = np.asarray(new["classifier"]["kernel"])
    # column 0 conflicts (cos<0) -> tumor half projected orthogonal to g_i[:,0]
    new_gt0 = nk[:2, 0]
    assert abs(float(new_gt0 @ np.asarray([-1.0, 0.0]))) < 1e-6
    # immune half of column 0 untouched; aligned column 1 untouched everywhere
    np.testing.assert_allclose(nk[2:, 0], np.asarray(g_i)[:, 0])
    np.testing.assert_allclose(nk[:, 1],
                               np.asarray(grads["classifier"]["kernel"])[:, 1])


def test_data_parallel_matches_single_device():
    """jit-of-global-batch on an 8-device mesh == single-device math."""
    assert len(jax.devices()) == 8
    config = small_config(mode="omic", batch_size=8, gradient_modulate=False,
                          return_vgrid=False)
    model, state, tx, batch = _setup(config)
    step = make_train_step(config, model, tx)
    labels = np.zeros((8, 12), np.float32)
    labels[:, 5] = np.arange(8) % 4
    batch["labels"] = jnp.asarray(labels)

    # single device
    s1, m1 = step(state, batch)
    p1 = jax.tree_util.tree_leaves(jax.device_get(s1.params))

    # 8-device mesh
    model2, state2, tx2, _ = _setup(config)
    mesh = make_mesh(config)
    state2 = replicate_tree(mesh, state2)
    dev_batch = shard_batch(mesh, batch)
    step2 = make_train_step(config, model2, tx2)
    s2, m2 = step2(state2, dev_batch)

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    p2 = jax.tree_util.tree_leaves(jax.device_get(s2.params))
    for a, b in zip(p1, p2):
        # sharded reductions reorder float sums; Adam amplifies tiny-grad deltas
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_deformpathomic_batchloss_in_graph():
    config = small_config(mode="deformpathomic", batch_size=4, return_vgrid=True,
                          gradient_modulate=True)
    model, state, tx, batch = _setup(config)
    step = make_train_step(config, model, tx)
    labels = np.zeros((4, 12), np.float32)
    labels[:, 5] = [0, 1, 2, 3]
    batch["labels"] = jnp.asarray(labels)
    _, metrics = step(state, batch)
    assert "batch_sim_loss" in metrics
    assert np.isfinite(float(metrics["batch_sim_loss"]))


def test_survival_mode_train_and_eval_step():
    config = small_config(mode="deformpathomic", task_type="survival",
                          batch_size=4)
    model, state, tx, batch = _setup(config)
    step = make_train_step(config, model, tx)
    labels = np.zeros((4, 12), np.float32)
    labels[:, 8] = [0, 1, 2, 3]        # bins
    labels[:, 9] = [0, 0, 1, 0]        # censor
    labels[:, 11] = [100, 400, 800, 1500]
    batch["labels"] = jnp.asarray(labels)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    eval_step = make_eval_step(config, model)
    out = eval_step(new_state.model_variables(), batch)
    assert out["risk"].shape == (4,)
    assert np.isfinite(np.asarray(out["risk"])).all()


def test_feature_dtype_bf16_bit_exact():
    """feature_dtype=auto with bf16 compute: pre-casting x_path to bf16 on the
    host is bit-identical to handing the step f32 x_path (the branch's first
    Dense casts its input to compute_dtype either way) — the knob only moves
    WHERE the cast happens (host/loader vs in-graph), never the numerics."""
    from sml_tpu.models.factory import feature_np_dtype
    from sml_tpu.train.loop import cast_features

    config = small_config(mode="deformpathomic", batch_size=2,
                          compute_dtype="bfloat16", dropout_rate=0.0,
                          gradient_modulate=False, return_vgrid=False)
    assert feature_np_dtype(config) == jnp.bfloat16
    model, state, tx, batch = _setup(config)
    labels = np.zeros((2, 12), np.float32)
    labels[:, 5] = np.arange(2) % 4
    batch["labels"] = jnp.asarray(labels)
    step = jax.jit(make_train_step(config, model, tx, jit=False), donate_argnums=())

    host_batch = {k: np.asarray(v) for k, v in batch.items()}
    cast = cast_features(config, dict(host_batch))
    assert cast["x_path"].dtype == jnp.bfloat16

    _, m_f32 = step(state, {k: jnp.asarray(v) for k, v in host_batch.items()})
    _, m_bf16 = step(state, {k: jnp.asarray(v) for k, v in cast.items()})
    assert float(m_f32["loss"]) == float(m_bf16["loss"])

    # explicit override wins over auto
    config_f32 = small_config(mode="deformpathomic", batch_size=2,
                              compute_dtype="bfloat16", feature_dtype="float32")
    assert feature_np_dtype(config_f32) == np.float32
