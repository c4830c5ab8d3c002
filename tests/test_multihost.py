"""Multi-host SPMD path (reference multi-node ``main.py:26-28,148-149``).

Three layers of checks:
  1. the DistributedSampler-equivalent index sharding (pure host logic),
  2. single-host regression — the sharded-loader + shard_batch path with
     ``num_shards=1`` is bit-identical to the unsharded one,
  3. a REAL 2-process run: two interpreters rendezvous via
     ``jax.distributed.initialize`` (gloo CPU collectives), train the full loop
     with per-process loader shards + ``make_array_from_process_local_data``
     global batches, and must produce the same per-epoch val losses as a
     single-process run over the same 4-device global mesh.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from sml_tpu.config import Config
from sml_tpu.data.loader import Loader, sharded_index_batches


class _RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), float(i), np.float32),
                "labels": np.zeros((12,), np.float32)}


def test_sharded_index_batches_contiguous_slices():
    # 12 samples, local_bs=3, 2 shards -> 2 global batches; shard r takes its
    # contiguous slice so the ASSEMBLED global batch equals the single-host one
    idx = np.arange(12)
    b0 = sharded_index_batches(idx, 3, 2, 0, drop_last=True)
    b1 = sharded_index_batches(idx, 3, 2, 1, drop_last=True)
    assert len(b0) == len(b1) == 2
    np.testing.assert_array_equal(np.concatenate([b0[0], b1[0]]), idx[:6])
    np.testing.assert_array_equal(np.concatenate([b0[1], b1[1]]), idx[6:])

    # short final global batch: dropped under drop_last ...
    idx = np.arange(10)
    assert len(sharded_index_batches(idx, 3, 2, 0, drop_last=True)) == 1
    # ... wrap-padded (DistributedSampler semantics) otherwise
    b0 = sharded_index_batches(idx, 3, 2, 0, drop_last=False)
    b1 = sharded_index_batches(idx, 3, 2, 1, drop_last=False)
    assert len(b0) == len(b1) == 2
    g2 = np.concatenate([b0[1], b1[1]])
    assert set(g2.tolist()) <= set(range(10)) and len(g2) == 6
    union = set(np.concatenate(b0 + b1).tolist())
    assert union == set(range(10))


def test_sharded_loaders_cover_dataset_equally():
    ds = _RangeDataset(32)
    loaders = [Loader(ds, 4, shuffle=True, drop_last=True, seed=7,
                      num_shards=2, shard_id=i) for i in range(2)]
    for ld in loaders:
        ld.set_epoch(3)
    assert len(loaders[0]) == len(loaders[1]) == 4  # 16 local samples / 4

    seen = []
    for ld in loaders:
        for batch in ld:
            assert batch["x"].shape == (4, 3)
            seen.extend(batch["x"][:, 0].astype(int).tolist())
    assert sorted(seen) == list(range(32))  # exact disjoint cover

    # different epochs give different permutations, same cover
    for ld in loaders:
        ld.set_epoch(4)
    seen2 = [int(b["x"][i, 0]) for ld in loaders for b in ld for i in range(4)]
    assert sorted(seen2) == list(range(32)) and seen2 != seen


def test_single_host_sharded_loader_matches_unsharded():
    ds = _RangeDataset(24)
    a = Loader(ds, 8, shuffle=True, drop_last=True, seed=5)
    b = Loader(ds, 8, shuffle=True, drop_last=True, seed=5, num_shards=1,
               shard_id=0)
    a.set_epoch(2), b.set_epoch(2)
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["x"], bb["x"])


def test_shard_batch_per_host_full_single_process():
    """per_host_full is a no-op single-host: same device values as the plain path."""
    from sml_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(num_devices=4)
    batch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3)}
    plain = shard_batch(mesh, batch)
    full = shard_batch(mesh, batch, per_host_full=True)
    np.testing.assert_array_equal(np.asarray(plain["x"]), np.asarray(full["x"]))
    assert plain["x"].sharding.is_equivalent_to(full["x"].sharding, 2)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_multihost_helper(rank: int, port, ckdir: str, mode: str = ""):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    argv = [sys.executable,
            os.path.join(os.path.dirname(__file__), "helpers",
                         "multihost_main.py"),
            str(rank), str(port), ckdir]
    if mode:
        argv.append(mode)
    return subprocess.Popen(argv, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["", "device_loop"])
def test_two_process_train_matches_single_process(tmp_path, mode):
    """2-process == 1-process for BOTH trainer paths: per-step host dispatch and
    the scanned device loop (exercises shard_stacked_batches' multi-process
    global-array assembly)."""
    port = _free_port()
    p0 = _run_multihost_helper(0, port, str(tmp_path / "mh"), mode)
    p1 = _run_multihost_helper(1, port, str(tmp_path / "mh"), mode)
    out0, _ = p0.communicate(timeout=900)
    out1, _ = p1.communicate(timeout=900)
    assert p0.returncode == 0, f"rank0 failed:\n{out0}\n--- rank1:\n{out1}"
    assert p1.returncode == 0, f"rank1 failed:\n{out1}"

    ps = _run_multihost_helper(-1, 0, str(tmp_path / "sp"), mode)
    outs, _ = ps.communicate(timeout=900)
    assert ps.returncode == 0, f"single-process baseline failed:\n{outs}"

    mh = json.loads([l for l in out0.splitlines() if l.startswith("{")][-1])
    sp = json.loads([l for l in outs.splitlines() if l.startswith("{")][-1])
    assert len(mh["val_losses"]) == len(sp["val_losses"]) == 2
    np.testing.assert_allclose(mh["val_losses"], sp["val_losses"],
                               rtol=0, atol=1e-5)
