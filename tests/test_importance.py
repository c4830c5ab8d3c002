"""Feature-importance utilities find a planted informative column."""

import numpy as np

from sml_tpu.utils.importance import (ablation_importance, get_score_importances,
                                      iter_shuffled)


def test_iter_shuffled_only_touches_target_column():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 5))
    for col, shuffled in iter_shuffled(x, [2]):
        assert col == 2
        others = [c for c in range(5) if c != 2]
        np.testing.assert_array_equal(shuffled[:, others], x[:, others])
        assert sorted(shuffled[:, 2].tolist()) == sorted(x[:, 2].tolist())


def test_permutation_importance_detects_signal_column():
    rng = np.random.default_rng(1)
    n = 256
    x = rng.normal(size=(n, 4))
    y = (x[:, 1] > 0).astype(int)  # column 1 is the signal

    def score(xx):
        pred = (xx[:, 1] > 0).astype(int)
        return float((pred == y).mean())

    base, dec = get_score_importances(score, x, n_iter=3)
    assert base == 1.0
    mean_dec = dec.mean(0)
    assert mean_dec[1] > 0.3
    assert abs(mean_dec[0]) < 0.05


def test_ablation_importance_detects_signal_gene():
    rng = np.random.default_rng(2)
    n, g = 64, 6
    omic = rng.normal(size=(n, g)).astype(np.float32) + 2.0
    labels = (omic[:, 3] > 2.0).astype(int)
    batches = [{"x_omic": omic[i:i + 16]} for i in range(0, n, 16)]

    def predict(batch):
        x = batch["x_omic"]
        p1 = 1 / (1 + np.exp(-(x[:, 3] - 2.0) * 10))
        return np.stack([1 - p1, p1], -1)

    diffs = ablation_importance(predict, batches, labels)
    assert diffs[3] == max(diffs)
    assert diffs[3] > 0.2
