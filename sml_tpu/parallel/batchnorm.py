"""Cross-replica (sync) batch normalization.

Replaces the reference's vendored Synchronized-BatchNorm-PyTorch package
(``utils/sync_batchnorm/`` — a 396-line thread/condvar master-slave reduction
protocol, SURVEY.md §2.5) with moment psums over the mesh axis.  Under the default
jit-of-global-batch execution, plain ``nn.BatchNorm`` already sees the global batch and
this module is only needed inside ``shard_map``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SyncBatchNorm(nn.Module):
    """BatchNorm1d with optional cross-replica moments via ``axis_name`` psum."""
    momentum: float = 0.9          # flax convention: new = m*old + (1-m)*batch
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = False) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = jnp.asarray(x.shape[0], jnp.float32)
            s = jnp.sum(x, axis=0)
            ss = jnp.sum(x * x, axis=0)
            if self.axis_name is not None:
                n = jax.lax.psum(n, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
            mean = s / n
            var = ss / n - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                # unbiased running var, torch semantics
                unbiased = var * n / jnp.maximum(n - 1, 1)
                ra_var.value = m * ra_var.value + (1 - m) * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias
