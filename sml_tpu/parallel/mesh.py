"""Mesh construction + batch/param sharding utilities."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sml_tpu.config import Config


def make_mesh(config: Optional[Config] = None, num_devices: int = 0,
              axis_name: str = "data", seq_devices: int = 0) -> Mesh:
    """1-D (data,) mesh, or a (data, seq) mesh when sequence parallelism is on."""
    if config is not None:
        num_devices = config.num_devices
        axis_name = config.data_axis
        seq_devices = getattr(config, "seq_devices", 0)
    devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    if seq_devices and seq_devices > 1:
        if len(devices) % seq_devices:
            raise ValueError(f"seq_devices={seq_devices} must divide the "
                             f"{len(devices)} visible devices")
        grid = np.asarray(devices).reshape(len(devices) // seq_devices, seq_devices)
        return Mesh(grid, (axis_name, "seq"))
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis_name: str = "data",
                per_host_full: bool = False) -> Dict[str, Any]:
    """Put a host batch onto the mesh, sharded along the leading (batch) dim.

    Single-host: plain ``device_put`` (unchanged semantics).  Multi-host: each
    process contributes its shard of the global batch via
    ``jax.make_array_from_process_local_data``.  The incoming ``batch`` is the
    per-process LOCAL batch (``B_global / process_count`` rows — the sharded
    ``Loader`` yields exactly that); with ``per_host_full=True`` the incoming
    batch is the full global batch replicated on every host (the eval loaders)
    and this process's slice is cut out here.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

    pi, pc = jax.process_index(), jax.process_count()

    def put(x):
        x = np.asarray(x)
        if per_host_full:
            if x.shape[0] % pc:
                # silent truncation would desync device rows from the host-side
                # label/mask lists kept by evaluate()
                raise ValueError(
                    f"global batch dim {x.shape[0]} is not divisible by "
                    f"process_count={pc}; pick a batch_size divisible by the "
                    f"process count (the train CLI validates this at setup)")
            per = x.shape[0] // pc
            x = x[pi * per:(pi + 1) * per]
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)


def shard_stacked_batches(mesh: Mesh, batches: Dict[str, Any],
                          axis_name: str = "data") -> Dict[str, Any]:
    """Put (num_steps, B, ...) stacked batches on the mesh, sharded on the 2nd axis."""
    multiprocess = jax.process_count() > 1

    def put(x):
        spec = P(None, axis_name) if getattr(x, "ndim", 0) >= 2 else P(None)
        if multiprocess:  # x is the per-process stack: (num_steps, B_local, ...)
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), np.asarray(x))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batches)


def fetch_global(tree: Any) -> Any:
    """``jax.device_get`` that also works on multi-host global arrays: fully
    replicated leaves are read from a local shard; batch-sharded leaves are
    gathered across processes so every host sees the full (global) value —
    the role the reference's rank-0 ``dist.gather``/cpu copies play in its
    eval paths."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def get(x):
        if not isinstance(x, jax.Array):
            return x
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree_util.tree_map(get, tree)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params / train state) across the mesh.

    Multi-host: every process holds an identical host copy (same seeded init or
    the same restored checkpoint), so each contributes the full array as its
    local data for the fully-replicated sharding.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree)
