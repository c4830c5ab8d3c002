"""Shared initializers / dtype helpers.

Initializer parity note: torch ``nn.Linear``/``nn.Conv*`` default to
kaiming_uniform(a=sqrt(5)) which reduces to U(+-1/sqrt(fan_in)); we reproduce that scale
with ``variance_scaling(1/3, fan_in, uniform)`` so that modes the reference leaves at
torch-default init (everything except MaxNet/BilinearFusion under ``init_type: max``)
start at the same scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# U(+-1/sqrt(fan_in)): matches torch's default kaiming_uniform(a=sqrt(5)) for Linear/Conv.
torch_kernel_init = jax.nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform")


def torch_bilinear_init(key, shape, dtype=jnp.float32):
    """torch ``nn.Bilinear`` default: U(+-1/sqrt(in1_features)); shape (out, in1, in2)."""
    fan_in = shape[1]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def default_dense(features: int, use_bias: bool = True, dtype=None, name=None) -> nn.Dense:
    """Dense layer with torch-default kernel scale and zero bias."""
    return nn.Dense(features, use_bias=use_bias, kernel_init=torch_kernel_init,
                    dtype=dtype, name=name)


class DenseParams(nn.Module):
    """Registers a Dense-shaped param subtree ({kernel[, bias]}) without
    computing, so a caller can apply the weights in a restructured (but
    mathematically identical) form — e.g. inside ``shard_map`` or a split
    matmul — while keeping the checkpoint tree identical to ``nn.Dense``."""
    shape: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        p = {"kernel": self.param("kernel", torch_kernel_init, self.shape)}
        if self.use_bias:
            p["bias"] = self.param("bias", nn.initializers.zeros,
                                   (self.shape[-1],))
        return p
