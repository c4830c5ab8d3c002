"""Config-wired loss zoo (survival_loss knob) + ReduceLROnPlateau scheduler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.config import Config
from sml_tpu.models.factory import (ReduceLROnPlateau, define_net,
                                    define_optimizer, init_model,
                                    set_learning_rate)
from sml_tpu.train.state import TrainState
from sml_tpu.train.steps import make_train_step


def _batch(config, b=4, seed=0):
    rng = np.random.default_rng(seed)
    labels = np.zeros((b, 12), np.float32)
    labels[:, 5] = np.arange(b) % 4
    labels[:, 8] = np.arange(b) % 4
    labels[:, 9] = (np.arange(b) + 1) % 2
    labels[:, 11] = 100.0 + 90.0 * np.arange(b)
    return {
        "x_path": jnp.asarray(rng.normal(
            size=(b, config.fixdim, 1024)).astype(np.float32)),
        "x_omic": jnp.asarray(rng.normal(size=(b, 431)).astype(np.float32)),
        "x_omic_tumor": jnp.asarray(rng.normal(size=(b, 59)).astype(np.float32)),
        "x_omic_immune": jnp.asarray(rng.normal(size=(b, 361)).astype(np.float32)),
        "labels": jnp.asarray(labels),
    }


def test_reduce_lr_on_plateau_semantics():
    """torch rel-threshold semantics: reduce after patience+1 non-improving epochs."""
    p = ReduceLROnPlateau(lr=1.0, factor=0.2, threshold=0.01, patience=2)
    assert p.step(10.0) == 1.0          # first metric sets best
    assert p.step(9.0) == 1.0           # improvement (>1% better)
    assert p.step(9.0) == 1.0           # bad 1
    assert p.step(8.95) == 1.0          # bad 2 (within 1% of best -> not better)
    lr = p.step(8.94)                   # bad 3 > patience -> reduce
    assert abs(lr - 0.2) < 1e-12
    assert p.step(1.0) == lr            # improvement resets counter, lr stays


def _train_loss_sequence(config, steps=6):
    batch = _batch(config)
    model = define_net(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    tx = define_optimizer(config, steps_per_epoch=4)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    step = make_train_step(config, model, tx)
    out = []
    for _ in range(steps):
        state, metrics = step(state, batch)
        out.append({k: float(v) for k, v in metrics.items()})
    return state, out


def test_plateau_policy_lr_is_mutable_and_training_runs():
    config = Config(mode="omic", fixdim=16, batch_size=4, lr_policy="plateau",
                    task_type="survival")
    batch = _batch(config)
    model = define_net(config)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    tx = define_optimizer(config, steps_per_epoch=4)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    step = make_train_step(config, model, tx)

    lrs = [float(np.asarray(e.hyperparams["learning_rate"]))
           for e in state.opt_state if hasattr(e, "hyperparams")]
    assert np.allclose(lrs, [config.lr])

    state, m1 = step(state, batch)
    state = set_learning_rate(state, 1e-5)
    lrs = [float(np.asarray(e.hyperparams["learning_rate"]))
           for e in state.opt_state if hasattr(e, "hyperparams")]
    assert np.allclose(lrs, [1e-5])
    state, m2 = step(state, batch)   # same jitted program, new lr as state
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_cmta_orthogonal_loss_selected_by_config():
    base = dict(mode="cmta", fixdim=16, batch_size=4, task_type="survival")
    _, hist_l1 = _train_loss_sequence(Config(**base), steps=3)
    _, hist_ol = _train_loss_sequence(Config(survival_loss="nll_surv_ol", **base),
                                      steps=3)
    assert all(np.isfinite(h["loss"]) for h in hist_ol)
    # OL and L1 alignment terms must actually differ
    assert abs(hist_ol[0]["alignment_loss"] - hist_l1[0]["alignment_loss"]) > 1e-6


@pytest.mark.slow
def test_survival_loss_variants_run():
    for name in ("ce_surv", "cox_surv", "nll_surv_kl", "nll_surv_cos",
                 "nll_surv_mse"):
        config = Config(mode="cmta", fixdim=16, batch_size=4,
                        task_type="survival", survival_loss=name)
        _, hist = _train_loss_sequence(config, steps=2)
        assert np.isfinite(hist[-1]["loss"]), name


def test_plateau_e2e_cli():
    """End-to-end: train CLI with --lr_policy plateau runs and checkpoints."""
    import sys
    import tempfile
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import main as main_mod

    ck = tempfile.mkdtemp()
    main_mod.main(["--dataset", "synthetic", "--synthetic_size", "24",
                   "--fixdim", "16", "--batch_size", "8", "--epochs", "2",
                   "--mode", "omic", "--task_type", "survival",
                   "--lr_policy", "plateau", "--checkpoints", ck, "--debug"])
