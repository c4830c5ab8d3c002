"""Packed binary dataset format + native-prefetch loader.

``pack_dataset`` flattens any sample-dict dataset into fixed-size records
(concatenated little-endian field bytes) with a JSON sidecar describing the fields.
``PackedLoader`` then iterates batches either through the C++ threaded prefetcher
(:mod:`sml_tpu.runtime`) or a numpy-mmap fallback — bitwise-identical batches either
way (tested).  This is the high-throughput replacement for the reference's
DataLoader-worker pipeline: at 2500x1024 f32 a sample is ~10.2 MB, so overlapping
read+assembly with device compute matters.
"""

from __future__ import annotations

import ctypes
import json
import os
from typing import Dict, Iterator, List, Optional

import numpy as np


def pack_dataset(dataset, path: str, fields: Optional[List[str]] = None) -> dict:
    """Write ``dataset`` (indexable -> dict of np arrays) to ``path`` (+ .json)."""
    sample = dataset[0]
    fields = fields or list(sample.keys())
    meta = {"fields": [], "n_records": len(dataset)}
    record_bytes = 0
    for name in fields:
        arr = np.asarray(sample[name])
        meta["fields"].append({"name": name, "shape": list(arr.shape),
                               "dtype": str(arr.dtype)})
        record_bytes += arr.nbytes
    meta["record_bytes"] = record_bytes

    with open(path, "wb") as f:
        for i in range(len(dataset)):
            s = dataset[i]
            for spec in meta["fields"]:
                arr = np.ascontiguousarray(np.asarray(s[spec["name"]],
                                                      dtype=spec["dtype"]))
                assert list(arr.shape) == spec["shape"], \
                    f"ragged field {spec['name']} at record {i}"
                f.write(arr.tobytes())
    with open(path + ".json", "w") as f:
        json.dump(meta, f)
    return meta


class PackedDataset:
    """Random access over a packed file (numpy mmap)."""

    def __init__(self, path: str):
        self.path = path
        with open(path + ".json") as f:
            self.meta = json.load(f)
        self.record_bytes = self.meta["record_bytes"]
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")

    def __len__(self) -> int:
        return self.meta["n_records"]

    def _decode(self, raw: np.ndarray) -> Dict[str, np.ndarray]:
        out = {}
        off = 0
        for spec in self.meta["fields"]:
            dt = np.dtype(spec["dtype"])
            n = int(np.prod(spec["shape"])) if spec["shape"] else 1
            nbytes = n * dt.itemsize
            arr = raw[off:off + nbytes].view(dt).reshape(spec["shape"])
            out[spec["name"]] = arr
            off += nbytes
        return out

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        start = index * self.record_bytes
        raw = np.array(self._mm[start:start + self.record_bytes])
        return self._decode(raw)


class PackedLoader:
    """Batched iteration over a packed file with optional native prefetch."""

    def __init__(self, path: str, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0, workers: int = 2,
                 queue_depth: int = 4, use_native: Optional[bool] = None,
                 num_shards: int = 1, shard_id: int = 0):
        self.ds = PackedDataset(path)
        self.path = path
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.workers = workers
        self.queue_depth = queue_depth
        self.num_shards = max(num_shards, 1)
        self.shard_id = shard_id
        self.epoch = 0
        if use_native is None:
            from sml_tpu import runtime

            use_native = workers > 0 and runtime.available()
        self.use_native = use_native

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.ds)
        global_bs = self.batch_size * self.num_shards
        if self.drop_last:
            return n // global_bs
        return (n + global_bs - 1) // global_bs

    def _epoch_indices(self):
        n = len(self.ds)
        idx = np.arange(n, dtype=np.int64)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100_003 + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            from sml_tpu.data.loader import sharded_index_batches

            # contiguous per-batch shards (see sharded_index_batches); wrap-pad
            # duplicates on a short final batch count as real samples (mask 1),
            # matching torch DistributedSampler
            batches = sharded_index_batches(idx, self.batch_size,
                                            self.num_shards, self.shard_id,
                                            self.drop_last)
            return batches, [np.ones(self.batch_size, np.float32)
                             for _ in batches]
        batches, masks = [], []
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start:start + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    continue
                mask = np.zeros(self.batch_size, np.float32)
                mask[: len(chunk)] = 1.0
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], self.batch_size - len(chunk))])
            else:
                mask = np.ones(self.batch_size, np.float32)
            batches.append(chunk)
            masks.append(mask)
        return batches, masks

    def _decode_batch(self, raw: np.ndarray) -> Dict[str, np.ndarray]:
        b = self.batch_size
        rb = self.ds.record_bytes
        raw = raw.reshape(b, rb)
        out = {}
        off = 0
        for spec in self.ds.meta["fields"]:
            dt = np.dtype(spec["dtype"])
            n = int(np.prod(spec["shape"])) if spec["shape"] else 1
            nbytes = n * dt.itemsize
            out[spec["name"]] = np.ascontiguousarray(
                raw[:, off:off + nbytes]).view(dt).reshape([b] + spec["shape"])
            off += nbytes
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches, masks = self._epoch_indices()
        if not self.use_native:
            for chunk, mask in zip(batches, masks):
                raw = np.stack([np.array(self.ds._mm[
                    i * self.ds.record_bytes:(i + 1) * self.ds.record_bytes])
                    for i in chunk])
                batch = self._decode_batch(raw)
                batch["sample_mask"] = mask
                yield batch
            return

        from sml_tpu import runtime

        lib = runtime.load_library()
        handle = lib.pf_open(self.path.encode(), self.ds.record_bytes,
                             self.batch_size, self.queue_depth, self.workers)
        if not handle:
            raise OSError(f"pf_open failed for {self.path}")
        try:
            flat = np.concatenate(batches).astype(np.int64)
            ptr = flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
            n_batches = lib.pf_submit(handle, ptr, len(flat))
            assert n_batches == len(batches)
            total = self.batch_size * self.ds.record_bytes
            for mask in masks:
                buf = lib.pf_next(handle)
                raw = np.ctypeslib.as_array(buf, shape=(total,)).copy()
                batch = self._decode_batch(raw)
                batch["sample_mask"] = mask
                yield batch
        finally:
            lib.pf_close(handle)
