"""Self-normalizing network primitives: ELU + AlphaDropout (torch-exact constants).

The reference's genomic encoders (MaxNet, SNN_Block; reference ``models/model.py:142-187``,
``models/mcat_utils.py:81-95``) rely on torch ``nn.AlphaDropout`` semantics — dropped
units are set to -lambda*alpha (the SELU saturation value) and the result is affinely
rescaled to preserve zero mean / unit variance.  Getting these constants wrong changes
MaxNet's training dynamics, so they are reproduced exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.common import torch_kernel_init

# -lambda * alpha of SELU: the value saturated (dropped) units take.
_ALPHA_PRIME = -1.7580993408473766


def alpha_dropout(x: jnp.ndarray, rate: float, rng: jax.Array,
                  deterministic: bool = False) -> jnp.ndarray:
    """Functional AlphaDropout; identity when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    keep_prob = 1.0 - rate
    a = (keep_prob + _ALPHA_PRIME ** 2 * keep_prob * (1.0 - keep_prob)) ** -0.5
    b = -a * _ALPHA_PRIME * (1.0 - keep_prob)
    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
    dropped = jnp.where(keep, x, jnp.asarray(_ALPHA_PRIME, x.dtype))
    return a * dropped + b


class AlphaDropout(nn.Module):
    """Module wrapper over :func:`alpha_dropout` using the 'dropout' RNG collection."""
    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        return alpha_dropout(x, self.rate, rng, deterministic=False)


class SNNBlock(nn.Module):
    """Linear -> ELU -> AlphaDropout (reference SNN_Block, ``models/mcat_utils.py:81-95``)."""
    features: int
    dropout: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.features, kernel_init=torch_kernel_init, dtype=self.dtype)(x)
        x = nn.elu(x)
        return AlphaDropout(self.dropout)(x, deterministic=deterministic)


class SNNStack(nn.Module):
    """A stack of SNN blocks (used for MCAT/CMTA signature networks)."""
    hidden: Sequence[int]
    dropout: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
        for h in self.hidden:
            x = SNNBlock(h, dropout=self.dropout, dtype=self.dtype)(x, deterministic)
        return x
