"""Post-norm transformer encoder (torch ``nn.TransformerEncoderLayer`` semantics).

MCAT routes the co-attended tokens through two post-norm encoder layers
(reference ``models/model.py:590-597``): residual -> LayerNorm ordering, ReLU FFN.
Batch-first API (B, L, E).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.attention import RawMultiheadAttention
from sml_tpu.ops.common import torch_kernel_init


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 512
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
        attn_out, _ = RawMultiheadAttention(
            self.d_model, self.nhead, dropout=self.dropout, dtype=self.dtype,
            name="self_attn")(x, x, x, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        y = nn.Dense(self.dim_feedforward, kernel_init=torch_kernel_init,
                     dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, kernel_init=torch_kernel_init,
                     dtype=self.dtype, name="linear2")(y)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x)


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 512
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype, name=f"layer{i}")(x, deterministic=deterministic)
        return x
