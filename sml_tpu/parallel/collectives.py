"""Explicit collectives for shard_map contexts.

The default execution model computes the BatchLoss on the jit-visible global batch, so
no hand-written gather is needed.  When running under ``shard_map`` (explicit-SPMD
style), :func:`gather_with_local_grad` reproduces the reference GatherLayer's autodiff
semantics (``utils/gather.py:5-20``): forward = all_gather, backward = gradient flows
ONLY to the local shard (remote shards are constants).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_with_local_grad(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """all_gather along ``axis_name`` with gradient only to the local shard.

    Returns shape (axis_size * x.shape[0], ...) — shards concatenated along the
    leading axis in device order (matching ``torch.cat(GatherLayer.apply(x))``).
    """
    gathered = jax.lax.stop_gradient(
        jax.lax.all_gather(x, axis_name, axis=0, tiled=True))
    idx = jax.lax.axis_index(axis_name)
    local_n = x.shape[0]
    # re-insert the differentiable local shard at its slot
    return jax.lax.dynamic_update_slice_in_dim(gathered, x, idx * local_n, axis=0)


def pmean(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Cross-replica mean (reference ``dist.all_reduce(loss / world)``)."""
    return jax.lax.pmean(x, axis_name)
