"""Metric oracles: C-index vs an independent pair-loop, macro sens/spec, batch_cindex."""

import numpy as np
import jax.numpy as jnp

from sml_tpu.train.metrics import (batch_cindex, cindex, compute_avg_metrics,
                                   concordance_index_censored,
                                   sensitivity_specificity_macro)


def naive_cindex(event, time, est, tied_tol=1e-8):
    """Brute-force Harrell's C with sksurv pair semantics (independent oracle)."""
    num = den = 0.0
    n = len(time)
    for i in range(n):
        for j in range(n):
            if time[i] < time[j] and event[i]:
                den += 1
                d = est[i] - est[j]
                if abs(d) <= tied_tol:
                    num += 0.5
                elif d > 0:
                    num += 1
    return num / den


def test_cindex_matches_naive():
    rng = np.random.default_rng(0)
    for seed in range(5):
        rng = np.random.default_rng(seed)
        n = 40
        time = rng.uniform(10, 1000, n)
        event = rng.integers(0, 2, n).astype(bool)
        event[0] = True  # ensure at least one comparable pair
        est = rng.normal(size=n)
        ours = concordance_index_censored(event, time, est)[0]
        ref = naive_cindex(event, time, est)
        assert abs(ours - ref) < 1e-12


def test_cindex_with_tied_times_and_risks():
    time = np.array([1.0, 1.0, 2.0, 3.0, 3.0, 4.0])
    event = np.array([True, False, True, True, False, False])
    est = np.array([5.0, 5.0, 3.0, 3.0, 2.0, 1.0])
    ours = concordance_index_censored(event, time, est)[0]
    ref = naive_cindex(event, time, est)
    assert abs(ours - ref) < 1e-12


def test_cindex_reference_wrapper_semantics():
    """cindex() takes censorship (1=alive): events = 1 - censorship."""
    time = np.array([10.0, 20.0, 30.0, 40.0])
    censor = np.array([0.0, 0.0, 1.0, 0.0])
    risk = np.array([4.0, 3.0, 2.0, 1.0])  # perfectly anti-ordered with time
    assert cindex(risk, censor, time) == 1.0


def test_cindex_all_censored_raises():
    import pytest
    with pytest.raises(ValueError):
        cindex(np.array([1.0, 2.0]), np.array([1.0, 1.0]), np.array([1.0, 2.0]))


def test_batch_cindex_matches_host():
    rng = np.random.default_rng(1)
    n = 16
    time = rng.uniform(10, 1000, n).astype(np.float32)
    censor = rng.integers(0, 2, n).astype(np.float32)
    censor[0] = 0.0
    risk = rng.normal(size=n).astype(np.float32)

    ci, valid = batch_cindex(jnp.asarray(risk), jnp.asarray(censor), jnp.asarray(time))
    host = cindex(risk, censor, time)
    assert bool(valid)
    assert abs(float(ci) - host) < 1e-6


def test_batch_cindex_all_censored_invalid():
    ci, valid = batch_cindex(jnp.asarray([1.0, 2.0]), jnp.asarray([1.0, 1.0]),
                             jnp.asarray([1.0, 2.0]))
    assert not bool(valid)


def test_sensitivity_specificity_macro():
    y_true = np.array([0, 0, 1, 1, 2, 2])
    y_pred = np.array([0, 1, 1, 1, 2, 0])
    sens, spec = sensitivity_specificity_macro(y_true, y_pred)
    # class sens: 0 -> 1/2, 1 -> 1, 2 -> 1/2 ; macro = 2/3
    assert abs(sens - 2 / 3) < 1e-12
    # class spec: 0: TN=3/(3+1)=0.75, 1: TN=3/(3+1)=0.75, 2: TN=4/4=1.0
    assert abs(spec - (0.75 + 0.75 + 1.0) / 3) < 1e-12


def test_compute_avg_metrics_smoke():
    rng = np.random.default_rng(2)
    gt = rng.integers(0, 4, 64)
    act = rng.dirichlet(np.ones(4), size=64)
    acc, f1, auc, bac, sens, spec, prec = compute_avg_metrics(gt, act)
    for v in (acc, f1, auc, bac, sens, spec, prec):
        assert 0.0 <= v <= 1.0
