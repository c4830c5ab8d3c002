"""Attention pooling heads: gated attention scorer (MCAT) and mean-pooler (DeformCrossTransMIL)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.common import torch_kernel_init


class AttnNetGated(nn.Module):
    """tanh*sigmoid gated attention scorer (reference ``models/mcat_utils.py:115-145``).

    Returns ``(scores, x)``: scores (..., n_classes) are raw (softmax applied by caller).
    """
    hidden: int  # D
    n_classes: int = 1
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        a = nn.tanh(nn.Dense(self.hidden, kernel_init=torch_kernel_init,
                             dtype=self.dtype, name="attention_a")(x))
        b = nn.sigmoid(nn.Dense(self.hidden, kernel_init=torch_kernel_init,
                                dtype=self.dtype, name="attention_b")(x))
        if self.dropout:
            a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
            b = nn.Dropout(self.dropout)(b, deterministic=deterministic)
        scores = nn.Dense(self.n_classes, kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="attention_c")(a * b)
        return scores, x


class Pooler(nn.Module):
    """Mean over tokens -> Dense -> tanh (reference ``models/DeformCrossTransMIL.py:169-202``).

    ``mask`` (B, N) restricts the mean to valid tokens (padded-bag support; the
    reference only ever sees full fixdim bags)."""
    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if mask is None:
            avg = jnp.mean(hidden_states, axis=1)
        else:
            m = mask.astype(hidden_states.dtype)[..., None]          # (B, N, 1)
            avg = (hidden_states * m).sum(axis=1) / jnp.maximum(
                m.sum(axis=1), 1.0)
        return nn.tanh(nn.Dense(self.hidden_size, kernel_init=torch_kernel_init,
                                dtype=self.dtype, name="dense")(avg))
