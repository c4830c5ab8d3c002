"""Device-loop (epoch-in-one-dispatch) trainer: equivalence with per-step training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.config import Config
from sml_tpu.models.factory import define_net, define_optimizer, init_model
from sml_tpu.train.state import TrainState
from sml_tpu.train.steps import make_epoch_scan, make_train_step

from tests.test_models import make_batch, small_config


def test_epoch_scan_matches_per_step():
    config = small_config(mode="omic", batch_size=4, gradient_modulate=False,
                          return_vgrid=False)
    model = define_net(config)
    rng = np.random.default_rng(0)

    batches = []
    for i in range(3):
        b = make_batch(config, np.random.default_rng(i))
        labels = np.zeros((4, 12), np.float32)
        labels[:, 5] = (np.arange(4) + i) % 4
        b["labels"] = jnp.asarray(labels)
        batches.append(b)

    def fresh_state():
        variables = init_model(config, model, jax.random.PRNGKey(0), batches[0])
        tx = define_optimizer(config, steps_per_epoch=3)
        return tx, TrainState.create(variables, tx, jax.random.PRNGKey(1))

    # per-step
    tx, state_a = fresh_state()
    step = make_train_step(config, model, tx)
    losses_a = []
    for b in batches:
        state_a, m = step(state_a, b)
        losses_a.append(float(m["loss"]))

    # device loop
    tx, state_b = fresh_state()
    epoch_scan = make_epoch_scan(config, model, tx, num_steps=3)
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    state_b, metrics = epoch_scan(state_b, stacked)
    losses_b = [float(x) for x in np.asarray(metrics["loss"])]

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state_a.params)),
                    jax.tree_util.tree_leaves(jax.device_get(state_b.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_device_loop_full_train(tmp_path):
    from sml_tpu.train.loop import train

    config = Config(dataset="synthetic", synthetic_size=32, fixdim=64, batch_size=8,
                    epochs=2, mode="omic", gradient_modulate=False,
                    return_vgrid=False, device_loop=True,
                    checkpoints=str(tmp_path / "ck"), debug=True)
    state, best = train(config)
    assert best


def test_chunked_device_loop_matches_host_loop(tmp_path):
    """Streamed device loop (chunk < steps_per_epoch, WITH a remainder chunk) must
    produce the same training trajectory as host-side per-step dispatch."""
    from sml_tpu.train.loop import train

    kw = dict(dataset="synthetic", synthetic_size=40, fixdim=64, batch_size=8,
              epochs=2, mode="omic", gradient_modulate=False, return_vgrid=False,
              debug=True)
    # 40 samples / bs 8 = 5 steps/epoch; chunk 2 -> dispatches of 2+2+1
    cfg_stream = Config(device_loop=True, device_loop_chunk=2,
                        checkpoints=str(tmp_path / "stream"), **kw)
    cfg_host = Config(device_loop=False, checkpoints=str(tmp_path / "host"), **kw)
    state_s, best_s = train(cfg_stream)
    state_h, best_h = train(cfg_host)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state_s.params)),
                    jax.tree_util.tree_leaves(jax.device_get(state_h.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    assert abs(best_s.get("cindex", best_s.get("auc", 0))
               - best_h.get("cindex", best_h.get("auc", 0))) < 1e-6


def test_device_loop_chunk_larger_than_epoch(tmp_path):
    """chunk > steps_per_epoch must clamp to one whole-epoch dispatch, not crash
    (the unclamped epoch-loop recompute picked a never-built remainder scan)."""
    from sml_tpu.train.loop import train

    config = Config(dataset="synthetic", synthetic_size=40, fixdim=64, batch_size=8,
                    epochs=1, mode="omic", gradient_modulate=False,
                    return_vgrid=False, device_loop=True, device_loop_chunk=8,
                    checkpoints=str(tmp_path / "ck"), debug=True)  # 5 steps/epoch
    state, best = train(config)
    assert best


def test_device_loop_mid_epoch_eval(tmp_path):
    """eval_every_iters under device_loop (VERDICT r2 item 8): the chunk clamps
    to gcd(chunk, eval_every_iters) and mid-epoch eval sweeps actually fire."""
    from sml_tpu.train.loop import train

    logs = []

    class Cap:
        def log(self, payload):
            logs.append(payload)

        def close(self):
            pass

    config = Config(dataset="synthetic", synthetic_size=48, fixdim=64,
                    batch_size=8, epochs=1, mode="omic", gradient_modulate=False,
                    return_vgrid=False, device_loop=True, device_loop_chunk=4,
                    eval_every_iters=2, checkpoints=str(tmp_path / "ck"),
                    debug=True)  # 6 steps/epoch, chunk gcd(4,2)=2 -> 3 dispatches
    train(config, logger=Cap())
    mid_evals = [l for l in logs if "test" in l and "epoch" not in l]
    # after iters 2 and 4; iter 6 is the epoch end, where the unconditional
    # epoch-end evaluate() already runs — a mid-eval there would duplicate it
    assert len(mid_evals) == 2
    assert all("loss" in l["test"] for l in mid_evals)
    assert sum(1 for l in logs if "test" in l and "epoch" in l) == 1


def test_seq_devices_validated_early():
    from sml_tpu.models.factory import define_net

    config = Config(mode="cmta", seq_devices=3)  # 128 landmarks % 3 != 0
    with pytest.raises(ValueError, match="landmark"):
        define_net(config)
