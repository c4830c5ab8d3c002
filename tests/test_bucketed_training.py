"""Multi-bucket variable-length training: grouped batches, one program per
bucket shape (SURVEY §7 "variable-length bags — the real win over the
reference"; the reference wrap-pads everything to one hard-coded fixdim,
``data/dataset.py:150-181``)."""

import numpy as np
import pytest

from sml_tpu.config import Config
from sml_tpu.data.loader import BucketedLoader
from sml_tpu.data.synthetic import SyntheticDataset


def _cfg(**over):
    base = dict(dataset="synthetic", synthetic_size=48, fixdim=64,
                variable_bags=True, bucket_sizes="48,64", batch_size=4,
                task_type="survival", mode="deformpathomic", epochs=2,
                debug=True, workers=0)
    base.update(over)
    return Config(**base)


def test_bucketed_loader_groups_and_covers():
    config = _cfg()
    ds = SyntheticDataset("Train", config)
    loader = BucketedLoader(ds, 4, shuffle=True, drop_last=True, seed=3)

    seen = []
    sizes = set()
    for batch in loader:
        n = batch["x_path"].shape[1]
        sizes.add(n)
        # homogeneous bucket per batch: every row's mask length matches and the
        # raw bag size of every sample maps to this bucket
        assert batch["mask"].shape == (4, n)
        seen.extend([n] * 4)
    assert sizes == {48, 64}, sizes
    # each sample's bucket matches the dataset metadata
    by_bucket = {b: sum(1 for i in range(len(ds)) if ds.bucket_of(i) == b)
                 for b in (48, 64)}
    for b in (48, 64):
        assert abs(seen.count(b) - by_bucket[b]) < 4   # drop_last slack

    # deterministic: same seed/epoch -> same batch stream
    loader2 = BucketedLoader(ds, 4, shuffle=True, drop_last=True, seed=3)
    s1 = [b["labels"][:, 11].tolist() for b in loader]
    s2 = [b["labels"][:, 11].tolist() for b in loader2]
    assert s1 == s2

    # different epochs interleave differently
    loader.set_epoch(1)
    s3 = [b["x_path"].shape[1] for b in loader]
    loader.set_epoch(0)
    s0 = [b["x_path"].shape[1] for b in loader]
    assert len(s0) == len(s3)


def test_bucket_metadata_matches_samples():
    config = _cfg()
    ds = SyntheticDataset("Train", config)
    for i in range(0, len(ds), 7):
        s = ds[i]
        assert s["x_path"].shape[0] == ds.bucket_of(i)
        assert int(s["mask"].sum()) == min(int(ds.bag_sizes[i]), ds.bucket_of(i))


def test_bucketed_loader_eval_pads_final_batch():
    config = _cfg(synthetic_size=48)
    ds = SyntheticDataset("Val", config)            # 12 samples
    loader = BucketedLoader(ds, 5)
    rows = 0
    for batch in loader:
        assert batch["x_path"].shape[0] == 5
        rows += int(batch["sample_mask"].sum())
    assert rows == len(ds)


@pytest.mark.slow
def test_bucketed_training_e2e(tmp_path):
    """2 epochs of flagship training over mixed {48, 64} buckets: per-bucket
    programs both execute, metrics finite, eval runs bucketed too."""
    from sml_tpu.train.loop import train
    from sml_tpu.utils.logging import MetricLogger

    config = _cfg(checkpoints=str(tmp_path), epochs=2, lr=1e-3,
                  batch_size=8, synthetic_size=64,
                  gradient_modulate=True, return_vgrid=True)
    logger = MetricLogger(config, out_dir=str(tmp_path), disabled=True)
    _, best = train(config, logger)
    assert np.isfinite(best["loss"])
    assert 0.0 <= best["cindex"] <= 1.0


def test_bucketed_device_loop_rejected():
    from sml_tpu.train.loop import setup

    with pytest.raises(ValueError, match="device_loop"):
        setup(_cfg(device_loop=True))
