"""Packed format + native C++ prefetcher: identical batches vs the Python path."""

import numpy as np
import pytest

from sml_tpu.config import Config
from sml_tpu.data.packed import PackedDataset, PackedLoader, pack_dataset
from sml_tpu.data.synthetic import SyntheticDataset


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    config = Config(dataset="synthetic", synthetic_size=20, fixdim=16)
    ds = SyntheticDataset("Train", config)
    path = str(tmp_path_factory.mktemp("packed") / "train.bin")
    meta = pack_dataset(ds, path)
    return ds, path, meta


def test_pack_roundtrip(packed):
    ds, path, meta = packed
    pds = PackedDataset(path)
    assert len(pds) == len(ds)
    for i in (0, 7, len(ds) - 1):
        orig = ds[i]
        got = pds[i]
        for k in orig:
            np.testing.assert_array_equal(np.asarray(orig[k]), got[k])


def test_python_loader_batches(packed):
    ds, path, meta = packed
    loader = PackedLoader(path, batch_size=8, use_native=False)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["sample_mask"].sum() == 4
    np.testing.assert_array_equal(batches[0]["x_omic"][0], np.asarray(ds[0]["x_omic"]))


def test_native_build():
    from sml_tpu import runtime

    assert runtime.available(), "native prefetch runtime failed to build"


def test_native_loader_matches_python(packed):
    from sml_tpu import runtime

    if not runtime.available():
        pytest.skip("no native runtime")
    ds, path, meta = packed
    py = list(PackedLoader(path, batch_size=4, shuffle=True, seed=5,
                           use_native=False))
    nat = list(PackedLoader(path, batch_size=4, shuffle=True, seed=5, workers=3,
                            queue_depth=2, use_native=True))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_native_loader_multiple_epochs(packed):
    from sml_tpu import runtime

    if not runtime.available():
        pytest.skip("no native runtime")
    ds, path, meta = packed
    loader = PackedLoader(path, batch_size=4, shuffle=True, seed=1, workers=2,
                          use_native=True, drop_last=True)
    e0 = list(loader)
    loader.set_epoch(1)
    e1 = list(loader)
    assert len(e0) == len(e1) == 5
    assert not np.array_equal(e0[0]["x_omic"], e1[0]["x_omic"])
