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


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis_name: str = "data"
                ) -> Dict[str, Any]:
    """Put a host batch onto the mesh, sharded along the leading (batch) dim."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def shard_stacked_batches(mesh: Mesh, batches: Dict[str, Any],
                          axis_name: str = "data") -> Dict[str, Any]:
    """Put (num_steps, B, ...) stacked batches on the mesh, sharded on the 2nd axis."""
    def put(x):
        spec = P(None, axis_name) if getattr(x, "ndim", 0) >= 2 else P(None)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batches)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params / train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
