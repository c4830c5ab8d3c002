"""Inventory-parity extras: Nystromformer, GatedABMIL, TransMIL-as-path, loss zoo,
regularizers, profiling timer, ce_surv oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.config import Config
from sml_tpu.models.factory import define_net, init_model, model_inputs
from sml_tpu.models.mil import GatedABMIL
from sml_tpu.ops.nystrom import Nystromformer
from sml_tpu.train.losses import ce_surv_loss, define_loss
from sml_tpu.utils.profiling import StepTimer
from sml_tpu.utils.regularize import (regularize_mm_omic, regularize_subtrees,
                                      regularize_weights)

from tests.test_models import make_batch, small_config


def test_nystromformer_encoder():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 40, 32)).astype(np.float32))
    mod = Nystromformer(dim=32, depth=2, dim_head=8, heads=4, num_landmarks=8)
    params = mod.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = mod.apply(params, x, deterministic=True)
    assert out.shape == x.shape


def test_gated_abmil():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 30, 1024)).astype(np.float32))
    mod = GatedABMIL()
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out["logits"].shape == (2, 2)


def test_transmil_path_mode():
    config = small_config(mode="path", path_arch="transmil", batch_size=2)
    model = define_net(config)
    batch = make_batch(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    out = model.apply(variables, **model_inputs(config, batch), deterministic=True)
    assert out["logits"].shape == (2, 4)


def test_define_loss_dispatch():
    single = define_loss("nll_surv")
    pair = define_loss("nll_surv_ol")
    assert callable(single)
    assert isinstance(pair, list) and len(pair) == 2
    with pytest.raises(NotImplementedError):
        define_loss("nope")


def test_ce_surv_loss_finite_and_reasonable():
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.uniform(0.1, 0.9, size=(4, 4)).astype(np.float32))
    s = jnp.cumprod(1 - h, axis=1)
    y = jnp.asarray([0, 1, 2, 3])
    c = jnp.asarray([0.0, 1.0, 0.0, 1.0])
    loss = float(ce_surv_loss(h, s, y, c, alpha=0.0))
    assert np.isfinite(loss) and loss > 0


def test_regularizers():
    params = {"omic_net_tumor": {"encoder1": {"kernel": jnp.ones((2, 2))}},
              "classifier": {"kernel": jnp.full((2, 2), 2.0)}}
    assert float(regularize_weights(params)) == 4 + 8
    assert float(regularize_mm_omic(params)) == 4
    assert float(regularize_subtrees(params, ["classifier"])) == 8


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(3):
        with t.step():
            pass
    s = t.stats()
    assert s["steps"] == 2
    assert s["mean_ms"] >= 0
