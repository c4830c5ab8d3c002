"""Batching / epoch iteration over the global (un-sharded) batch.

One process sees the full batch; the mesh layer shards it over devices.  This replaces
the reference's DataLoader + DistributedSampler pair (``main.py:51-65``): shuffling is
a seeded per-epoch permutation (same role as ``sampler.set_epoch``), train drops the
last partial batch, eval pads it and carries a ``sample_mask``.

Host-side prefetch (``workers > 0``) overlaps the next batch's gather/IO with device
compute via the native ring-buffer in :mod:`sml_tpu.runtime` when built, else a Python
thread.
"""

from __future__ import annotations

import threading
from queue import Queue
from typing import Dict, Iterator, List, Sequence

import numpy as np

from sml_tpu.config import Config


def concat_datasets(datasets: Sequence) -> "_ConcatDataset":
    return _ConcatDataset(datasets)


class _ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.cum = np.cumsum([len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self.cum[-1]) if len(self.cum) else 0

    def __getitem__(self, index: int):
        ds_idx = int(np.searchsorted(self.cum, index, side="right"))
        prev = 0 if ds_idx == 0 else int(self.cum[ds_idx - 1])
        return self.datasets[ds_idx][index - prev]


def build_datasets(config: Config, phase: str):
    """dataset flag -> concat of cohort datasets (reference ``main.py:34-48``)."""
    if config.dataset == "synthetic":
        from sml_tpu.data.synthetic import SyntheticDataset

        return SyntheticDataset(phase, config)
    from sml_tpu.data.datasets import IvYGAPDataset, TCGADataset

    if config.dataset == "IvYGAP":
        return IvYGAPDataset(phase, config)
    if config.dataset == "TCGA":
        return TCGADataset(phase, config)
    # reference default: ConcatDataset([IvYGAP, TCGA])
    return concat_datasets([IvYGAPDataset(phase, config), TCGADataset(phase, config)])


def sharded_index_batches(idx: np.ndarray, local_bs: int, num_shards: int,
                          shard_id: int, drop_last: bool) -> List[np.ndarray]:
    """``DistributedSampler`` equivalent (reference ``main.py:51-56``), laid out
    for SPMD equivalence: form GLOBAL batches of ``local_bs * num_shards`` in
    permutation order, and give each shard its CONTIGUOUS slice of every global
    batch.  Because process ``r``'s local devices hold rows ``[r*local_bs,
    (r+1)*local_bs)`` of the assembled global array, the global batch each jit
    step sees is bit-identical to the single-host one — stride-sharding instead
    would permute rows within the batch and re-pair samples with per-row dropout
    noise.  Short final batches are wrap-padded (torch DistributedSampler
    semantics) unless ``drop_last``.  All shards must shuffle with the same seed.
    """
    global_bs = local_bs * num_shards
    out = []
    for start in range(0, len(idx), global_bs):
        chunk = idx[start:start + global_bs]
        if len(chunk) < global_bs:
            if drop_last:
                continue
            reps = -(-global_bs // len(chunk))
            chunk = np.tile(chunk, reps)[:global_bs]
        out.append(chunk[shard_id * local_bs:(shard_id + 1) * local_bs])
    return out


class Loader:
    """Yields dict batches of stacked numpy arrays.

    train mode: shuffled (seeded by epoch), drop_last.
    eval mode: sequential, final batch padded to batch_size with sample_mask=0.
    multi-host: ``num_shards``/``shard_id`` stride-partition each epoch's (seeded,
    identical-across-hosts) permutation, and ``batch_size`` is the per-host LOCAL
    batch size.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0, workers: int = 0,
                 num_shards: int = 1, shard_id: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.workers = workers
        self.num_shards = max(num_shards, 1)
        self.shard_id = shard_id
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        global_bs = self.batch_size * self.num_shards  # steps = global batches
        if self.drop_last:
            return n // global_bs
        return (n + global_bs - 1) // global_bs

    def _index_batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100_003 + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            return sharded_index_batches(idx, self.batch_size, self.num_shards,
                                         self.shard_id, self.drop_last)
        batches = []
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)
        return batches

    def _collate(self, chunk: np.ndarray) -> Dict[str, np.ndarray]:
        samples = [self.dataset[int(i)] for i in chunk]
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        pad = self.batch_size - len(samples)
        mask = np.ones(self.batch_size, dtype=np.float32)
        if pad > 0:
            for k, v in batch.items():
                batch[k] = np.concatenate(
                    [v, np.repeat(v[-1:], pad, axis=0)], axis=0)
            mask[len(samples):] = 0.0
        batch["sample_mask"] = mask
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._index_batches()
        if self.workers <= 0:
            for chunk in batches:
                yield self._collate(chunk)
            return
        yield from self._threaded_iter(batches)

    def _batch_chunks(self, idx: np.ndarray) -> List[np.ndarray]:
        batches = []
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)
        return batches

    def _threaded_iter(self, batches) -> Iterator[Dict[str, np.ndarray]]:
        q: Queue = Queue(maxsize=max(2, self.workers))
        stop = object()

        def producer():
            for chunk in batches:
                q.put(self._collate(chunk))
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()


class BucketedLoader(Loader):
    """Loader that groups every batch by bag-size bucket.

    The dataset must expose ``bucket_of(i) -> int`` (cheap metadata — e.g.
    ``SyntheticDataset.bag_sizes``; HDF5 readers can read shapes without
    data).  Each yielded batch is homogeneous in bucket, so XLA compiles ONE
    program per bucket shape and every batch rides a compiled program; masks
    (``bucket_bag``) make the padded rows exact.  Batch order across buckets
    is the seeded epoch shuffle, so buckets interleave like the reference's
    shuffled loader.  This is the variable-length-bag win over the reference,
    which wrap-pads/subsamples everything to one hard-coded fixdim
    (``data/dataset.py:150-181``).
    """

    def _bucket_populations(self) -> Dict[int, int]:
        counts: Dict[int, int] = {}
        for i in range(len(self.dataset)):
            b = self.dataset.bucket_of(int(i))
            counts[b] = counts.get(b, 0) + 1
        return counts

    def __len__(self) -> int:
        # Per-bucket batching: each bucket drops (or wrap-pads) its OWN
        # remainder, so the flat n // global_bs of Loader.__len__ would
        # overestimate steps_per_epoch (LR horizon, epoch_end_iters).
        # Bucket membership is fixed per sample, so this is shuffle-independent.
        global_bs = self.batch_size * self.num_shards
        total = 0
        for n_b in self._bucket_populations().values():
            if self.drop_last:
                total += n_b // global_bs
            else:
                total += (n_b + global_bs - 1) // global_bs
        return total

    def _index_batches(self) -> List[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        rng = np.random.default_rng(self.seed * 100_003 + self.epoch)
        if self.shuffle:
            rng.shuffle(idx)
        by_bucket: Dict[int, List[int]] = {}
        for i in idx:
            by_bucket.setdefault(self.dataset.bucket_of(int(i)), []).append(i)
        batches: List[np.ndarray] = []
        global_bs = self.batch_size * self.num_shards
        for bucket in sorted(by_bucket):
            bidx = np.asarray(by_bucket[bucket])
            if self.drop_last and 0 < len(bidx) < global_bs:
                # Unlike unbucketed drop_last (where the dropped tail rotates
                # with the shuffle), bucket membership is FIXED — an
                # undersized bucket would be silently excluded from training
                # every epoch.
                import warnings

                warnings.warn(
                    f"bucket {bucket} holds {len(bidx)} samples < global batch "
                    f"{global_bs} and drop_last=True: these samples would NEVER "
                    f"train. Merge them into a larger bucket (coarsen "
                    f"bucket_sizes) or lower batch_size.", stacklevel=2)
            if self.num_shards > 1:
                batches.extend(sharded_index_batches(
                    bidx, self.batch_size, self.num_shards, self.shard_id,
                    self.drop_last))
            else:
                batches.extend(self._batch_chunks(bidx))
        if self.shuffle:
            # interleave bucket programs; all shards share the seed -> same order
            order = np.random.default_rng(
                self.seed * 900_007 + self.epoch).permutation(len(batches))
            batches = [batches[i] for i in order]
        return batches
