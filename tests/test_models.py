"""Model-zoo smoke/shape/jit/grad tests across all seven modes (synthetic shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.config import Config
from sml_tpu.models.factory import define_net, define_optimizer, init_model, model_inputs

N_SMALL = 64  # 8x8 grid for deformpathomic


def small_config(**kw) -> Config:
    base = dict(fixdim=N_SMALL, batch_size=4, input_size_omic=431,
                input_size_omic_tumor=59, input_size_omic_immune=361,
                label_dim=4, task_type="diag2021")
    base.update(kw)
    return Config(**base)


def make_batch(config: Config, rng=None):
    rng = rng or np.random.default_rng(0)
    b = config.batch_size
    return {
        "x_path": jnp.asarray(rng.normal(size=(b, config.fixdim, 1024)).astype(np.float32)),
        "x_omic": jnp.asarray(rng.normal(size=(b, config.input_size_omic)).astype(np.float32)),
        "x_omic_tumor": jnp.asarray(
            rng.normal(size=(b, config.input_size_omic_tumor)).astype(np.float32)),
        "x_omic_immune": jnp.asarray(
            rng.normal(size=(b, config.input_size_omic_immune)).astype(np.float32)),
        "labels": jnp.zeros((b, 12), jnp.float32),
    }


ALL_MODES = ["path", "omic", "pathomic", "pathomic_original", "mcat", "cmta",
             "deformpathomic"]


@pytest.mark.parametrize("mode", ALL_MODES)
def test_forward_shapes(mode):
    config = small_config(mode=mode)
    model = define_net(config)
    batch = make_batch(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    out = model.apply(variables, **model_inputs(config, batch), deterministic=True)

    b = config.batch_size
    assert out["logits"].shape == (b, config.label_dim)
    if mode in ("pathomic", "pathomic_original"):
        assert out["logits_path"].shape == (b, config.label_dim)
        assert out["logits_omic"].shape == (b, config.label_dim)
        assert out["features"].shape[0] == b
    if mode == "cmta":
        for k in ("P", "P_hat", "G", "G_hat"):
            assert out[k].shape == (b, 256)
    if mode == "mcat":
        assert out["S"].shape == (b, config.label_dim)
    if mode == "deformpathomic":
        assert out["vec_tumor"].shape == (b, 128)
        assert out["vec_immune"].shape == (b, 128)
        assert out["logits_tumor"].shape == (b, config.label_dim)
        assert out["vgrid_tumor"].shape[0:2] == (b, 8)
        assert out["omic_tumor"].shape == (b, 128)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.parametrize("mode", ["deformpathomic", "mcat", "cmta"])
def test_jit_and_grads(mode):
    config = small_config(mode=mode, batch_size=2)
    model = define_net(config)
    batch = make_batch(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)

    @jax.jit
    def loss_fn(params):
        out = model.apply({**variables, "params": params},
                          **model_inputs(config, batch), deterministic=True)
        return (out["logits"] ** 2).sum()

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_deformpathomic_survival_sigmoids_heads():
    config = small_config(mode="deformpathomic", task_type="survival")
    model = define_net(config)
    batch = make_batch(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    out = model.apply(variables, **model_inputs(config, batch), deterministic=True)
    for k in ("logits", "logits_tumor", "logits_immune"):
        v = np.asarray(out[k])
        assert (v >= 0).all() and (v <= 1).all()


def test_deformpathomic_attn1d_path():
    config = small_config(mode="deformpathomic", attn_dim=1, return_vgrid=False)
    model = define_net(config)
    batch = make_batch(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    out = model.apply(variables, **model_inputs(config, batch), deterministic=True)
    assert out["logits"].shape == (config.batch_size, 4)
    assert "vgrid_tumor" not in out


def test_maxnet_init_max_scale():
    """init_type=max: MaxNet kernels ~ N(0, 1/fan_in)."""
    config = small_config(mode="omic", init_type="max")
    model = define_net(config)
    batch = make_batch(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    k = np.asarray(variables["params"]["encoder1"]["kernel"])  # (431, 64)
    emp_std = k.std()
    assert abs(emp_std - 1.0 / np.sqrt(431)) / (1.0 / np.sqrt(431)) < 0.15


@pytest.mark.parametrize("init_type", ["normal", "xavier", "kaiming", "orthogonal"])
def test_init_net_types(init_type):
    config = small_config(mode="omic", init_type=init_type)
    model = define_net(config)
    batch = make_batch(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    k = np.asarray(variables["params"]["encoder1"]["kernel"])
    assert np.isfinite(k).all()
    if init_type == "normal":
        assert abs(k.std() - 0.02) < 0.005
    b = np.asarray(variables["params"]["encoder1"]["bias"])
    assert (b == 0).all()


def test_optimizer_and_schedule():
    config = small_config(mode="omic", lr_policy="cosine", epochs=10)
    tx = define_optimizer(config, steps_per_epoch=5)
    params = {"w": jnp.ones((3, 3))}
    state = tx.init(params)
    grads = {"w": jnp.ones((3, 3))}
    updates, state = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()

    from sml_tpu.models.factory import make_lr_schedule
    sched = make_lr_schedule(config, steps_per_epoch=5)
    lr_start = float(sched(0))
    lr_mid = float(sched(5 * 5))   # epoch 5 of 10
    lr_end = float(sched(10 * 5))  # epoch 10
    assert abs(lr_start - config.lr) < 1e-9
    assert abs(lr_mid - 0.5 * config.lr) < 1e-9
    assert lr_end < 1e-9


def test_pofusion_mode_with_batch_stats():
    config = small_config(mode="pathomic", fusion_type="pofusion", mmhid=128,
                          path_dim=128, omic_dim=128)
    model = define_net(config)
    batch = make_batch(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    assert "batch_stats" in variables
    out, mutated = model.apply(variables, **model_inputs(config, batch),
                               deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
    assert out["logits"].shape == (config.batch_size, 4)
