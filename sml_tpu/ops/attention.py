"""Exact multi-head attention that can return the RAW (pre-softmax) logits.

The reference vendors a modified torch MHA solely so that callers receive the
pre-softmax attention logits (reference ``models/MultiheadAttention.py:299-321``:
``need_raw=True`` returns ``(attn_output, raw_logits)``).  Here that is a few einsums.
Batch-first API: q (B, Lq, E), k/v (B, Lk, E); raw logits come back as (B, H, Lq, Lk)
and already include the 1/sqrt(head_dim) query scaling, matching torch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.common import torch_kernel_init


class RawMultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray, value: jnp.ndarray,
                 deterministic: bool = True,
                 key_padding_mask: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, lq, e = query.shape
        lk = key.shape[1]
        h = self.num_heads
        head_dim = e // h
        assert head_dim * h == e, "embed_dim must be divisible by num_heads"
        scaling = head_dim ** -0.5

        dense = lambda name: nn.Dense(e, kernel_init=torch_kernel_init,
                                      dtype=self.dtype, name=name)
        q = dense("q_proj")(query) * scaling
        k = dense("k_proj")(key)
        v = dense("v_proj")(value)

        q = q.reshape(b, lq, h, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, h, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, head_dim).transpose(0, 2, 1, 3)

        raw = jnp.einsum("bhid,bhjd->bhij", q, k)        # (B, H, Lq, Lk)
        logits = raw
        if key_padding_mask is not None:                 # True = masked out
            logits = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, logits)

        attn = nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
        out = dense("out_proj")(out)
        return out, raw
