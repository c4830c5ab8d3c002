"""End-to-end: full train() loop on synthetic data + checkpoint save/restore parity.

This is the SURVEY.md §7 "minimum viable end-to-end" criterion: synthetic bags ->
model -> loss -> jitted steps on a data-parallel mesh -> host metrics improve ->
checkpoint saved and reloaded bit-exactly.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.config import Config
from sml_tpu.train.loop import train, setup
from sml_tpu.train import checkpoint as ckpt


def _cfg(tmp_path, **kw):
    base = dict(dataset="synthetic", synthetic_size=32, fixdim=64, batch_size=8,
                epochs=2, lr=1e-3, mode="omic", task_type="diag2021", label_dim=4,
                gradient_modulate=False, return_vgrid=False,
                checkpoints=str(tmp_path / "ckpts"), debug=True,
                eval_every_iters=0, workers=0)
    base.update(kw)
    return Config(**base)


def test_train_loop_omic_improves_and_checkpoints(tmp_path):
    config = _cfg(tmp_path, epochs=6, synthetic_size=64)
    state, best = train(config)
    assert best, "no best checkpoint recorded"
    # synthetic signal is linearly decodable: expect clearly-above-chance accuracy
    assert best["acc"] > 0.4
    assert os.path.exists(os.path.join(config.checkpoints, "best_modal"))
    assert os.path.exists(os.path.join(config.checkpoints, "last_state"))


def test_train_loop_deformpathomic_survival_smoke(tmp_path):
    config = _cfg(tmp_path, mode="deformpathomic", task_type="survival",
                  epochs=1, synthetic_size=16, batch_size=8,
                  gradient_modulate=True, return_vgrid=True)
    state, best = train(config)
    assert "cindex" in best
    assert 0.0 <= best["cindex"] <= 1.0


def test_checkpoint_roundtrip_bitexact(tmp_path):
    config = _cfg(tmp_path, epochs=1, synthetic_size=16)
    mesh, model, state, train_step, eval_step, loaders = setup(config)

    path = str(tmp_path / "state_ck")
    host_state = jax.device_get(state)
    ckpt.save_train_state(path, host_state)
    restored = ckpt.restore_train_state(path, jax.tree_util.tree_map(
        lambda x: x, host_state))

    for a, b in zip(jax.tree_util.tree_leaves(host_state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(host_state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reload_best_modal(tmp_path):
    config = _cfg(tmp_path, epochs=1, synthetic_size=16)
    train(config)
    # second run reloads best_modal weights
    config2 = _cfg(tmp_path, epochs=1, synthetic_size=16, reload=True)
    mesh, model, state, *_ = setup(config2)
    best = ckpt.restore_weights(os.path.join(config.checkpoints, "best_modal"),
                                jax.device_get(state.model_variables()))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state.params)),
                    jax.tree_util.tree_leaves(best["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_matches_uninterrupted(tmp_path, monkeypatch):
    """Kill-and-resume parity: a 3-epoch run killed right after the epoch-2 state
    save, then resumed, matches the uninterrupted 3-epoch run bit-exactly on every
    parameter (full state incl. optimizer + PRNG + LR schedule position restored)."""
    kw = dict(epochs=3, synthetic_size=32)

    cfg_a = _cfg(tmp_path / "a", **kw)
    state_a, _ = train(cfg_a)

    class SimulatedKill(Exception):
        pass

    orig_save_meta = ckpt.save_resume_meta

    def kill_after_epoch2(ckdir, meta):
        orig_save_meta(ckdir, meta)
        if meta["epoch"] == 1:  # 0-indexed: die right after epoch 2's save
            raise SimulatedKill

    cfg_b = _cfg(tmp_path / "b", **kw)
    monkeypatch.setattr(ckpt, "save_resume_meta", kill_after_epoch2)
    with pytest.raises(SimulatedKill):
        train(cfg_b)
    monkeypatch.setattr(ckpt, "save_resume_meta", orig_save_meta)

    state_b, _ = train(_cfg(tmp_path / "b", **dict(kw, resume=True)))

    assert int(jax.device_get(state_a.step)) == int(jax.device_get(state_b.step))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state_a.params)),
                    jax.tree_util.tree_leaves(jax.device_get(state_b.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state_a.opt_state)),
                    jax.tree_util.tree_leaves(jax.device_get(state_b.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_without_checkpoint_starts_fresh(tmp_path):
    config = _cfg(tmp_path, epochs=1, synthetic_size=16, resume=True)
    state, best = train(config)
    assert best  # ran from scratch without error


def test_main_cli_smoke(tmp_path):
    import main as main_mod

    rc = main_mod.main([
        "--dataset", "synthetic", "--synthetic_size", "16", "--fixdim", "64",
        "--batch_size", "8", "--epochs", "1", "--mode", "omic",
        "--gradient_modulate", "false", "--return_vgrid", "false",
        "--checkpoints", str(tmp_path / "cli_ckpts"), "--debug",
    ])
    assert rc == 0


def test_inference_cli_smoke(tmp_path):
    import main as main_mod
    import inference as inf_mod

    ckdir = str(tmp_path / "ck")
    main_mod.main([
        "--dataset", "synthetic", "--synthetic_size", "16", "--fixdim", "64",
        "--batch_size", "8", "--epochs", "1", "--mode", "omic",
        "--gradient_modulate", "false", "--return_vgrid", "false",
        "--checkpoints", ckdir, "--debug",
    ])
    rc = inf_mod.main([
        "--dataset", "synthetic", "--synthetic_size", "16", "--fixdim", "64",
        "--batch_size", "8", "--mode", "omic",
        "--gradient_modulate", "false", "--return_vgrid", "false",
        "--checkpoints", ckdir, "--debug",
        "--model_fp", os.path.join(ckdir, "best_modal"),
    ])
    assert rc == 0
