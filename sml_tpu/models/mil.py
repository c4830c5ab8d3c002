"""Pathology MIL models over pre-extracted patch-feature bags.

ABMIL (reference ``models/mil.py:34-99``): 2-layer tanh attention over patches,
softmax-weighted bag mean, classifier + 128-d multimodal projection.

TransMIL (reference ``models/mil.py:209-259``): fc 1024->512, square-pad the bag by
wrapping, prepend cls token, two Nystrom TransLayers with a PPEG positional conv in
between, cls-token head.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.common import torch_kernel_init
from sml_tpu.ops.conv import PPEG
from sml_tpu.ops.nystrom import NystromAttention


class ABMIL(nn.Module):
    label_dim: int = 4
    path_dim: int = 128
    input_path_dim: int = 1024
    attn_hidden: int = 128
    n_attn_heads: int = 1  # K in the reference
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_path: jnp.ndarray, deterministic: bool = False,
                 mask: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
        b, n, l = x_path.shape
        a = nn.tanh(nn.Dense(self.attn_hidden, kernel_init=torch_kernel_init,
                             dtype=self.dtype, name="attention_0")(x_path))
        a = nn.Dense(self.n_attn_heads, kernel_init=torch_kernel_init,
                     dtype=self.dtype, name="attention_1")(a)          # (B, N, K)
        a = a.transpose(0, 2, 1)                                       # (B, K, N)
        if mask is not None:  # padded-bag support: padded patches get zero attention
            a = jnp.where(mask[:, None, :], a, -jnp.inf)
        a = nn.softmax(a, axis=-1)
        m = jnp.einsum("bkn,bnl->bkl", a, x_path).reshape(b, -1)       # (B, K*L)

        logits = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="classifier")(m)
        encoded = nn.Dense(self.path_dim, kernel_init=torch_kernel_init,
                           dtype=self.dtype, name="multimodal_projection")(m)
        return {"features": encoded, "logits": logits, "attention": a}


class GatedABMIL(nn.Module):
    """Gated attention MIL (reference ``models/mil.py:102-168``; unused by any mode but
    kept for inventory parity).  Returns probs/logits over 2 classes."""
    label_dim: int = 2
    input_path_dim: int = 1024
    attn_hidden: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_path: jnp.ndarray, deterministic: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        b = x_path.shape[0]
        dense = lambda f, name: nn.Dense(f, kernel_init=torch_kernel_init,
                                         dtype=self.dtype, name=name)
        a_v = nn.tanh(dense(self.attn_hidden, "attention_V")(x_path))
        a_u = nn.sigmoid(dense(self.attn_hidden, "attention_U")(x_path))
        a = dense(1, "attention_weights")(a_v * a_u)            # (B, N, 1)
        a = nn.softmax(a.transpose(0, 2, 1), axis=-1)           # (B, 1, N)
        m = jnp.einsum("bkn,bnl->bkl", a, x_path).reshape(b, -1)
        logits = dense(self.label_dim, "classifier")(m)
        return {"logits": logits, "probs": nn.sigmoid(logits), "attention": a}


class TransLayer(nn.Module):
    """Pre-norm Nystrom attention residual block (reference ``models/mil.py:171-189``)."""
    dim: int = 512
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    seq_mesh: Optional[object] = None     # (data, seq) Mesh for token-axis sharding
    use_pallas: bool = False
    pallas_masked: bool = True            # masks are intervals (see NystromAttention)
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = False,
                 mask: jnp.ndarray = None) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        y = NystromAttention(dim=self.dim, dim_head=self.dim // 8, heads=8,
                             num_landmarks=self.dim // 2, pinv_iterations=6,
                             residual=True, dropout=self.dropout, dtype=self.dtype,
                             seq_mesh=self.seq_mesh, use_pallas=self.use_pallas,
                             pallas_masked=self.pallas_masked,
                             pallas_interpret=self.pallas_interpret,
                             name="attn")(y, mask=mask, deterministic=deterministic)
        return x + y


class TransMIL(nn.Module):
    label_dim: int = 4
    path_dim: int = 128
    hidden_dim: int = 512
    dtype: Optional[jnp.dtype] = None
    seq_mesh: Optional[object] = None
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x_path: jnp.ndarray, deterministic: bool = False,
                 mask: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
        b, n, _ = x_path.shape
        h = nn.relu(nn.Dense(self.hidden_dim, kernel_init=torch_kernel_init,
                             dtype=self.dtype, name="fc1")(x_path))

        side = int(math.ceil(math.sqrt(n)))
        add_length = side * side - n
        if add_length:
            h = jnp.concatenate([h, h[:, :add_length]], axis=1)
            if mask is not None:
                mask = jnp.concatenate([mask, mask[:, :add_length]], axis=1)

        cls = self.param("cls_token", nn.initializers.normal(1.0),
                         (1, 1, self.hidden_dim))
        h = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(h.dtype), h], axis=1)
        if mask is not None:  # cls token always attends/attended
            mask = jnp.concatenate([jnp.ones((b, 1), bool), mask], axis=1)

        # wrap-padding (n not a perfect square) REPEATS valid tokens, so the
        # mask is no longer an interval (True..False..True) — statically
        # disable the span-fused masked path then; square buckets (the
        # defaults: 1024/2500/4096) keep add_length == 0 and stay fused
        masked_ok = add_length == 0
        h = TransLayer(self.hidden_dim, dtype=self.dtype, seq_mesh=self.seq_mesh,
                       use_pallas=self.use_pallas, pallas_masked=masked_ok,
                       pallas_interpret=self.pallas_interpret,
                       name="layer1")(h, deterministic=deterministic, mask=mask)
        h = PPEG(self.hidden_dim, dtype=self.dtype, name="pos_layer")(h, side, side)
        h = TransLayer(self.hidden_dim, dtype=self.dtype, seq_mesh=self.seq_mesh,
                       use_pallas=self.use_pallas, pallas_masked=masked_ok,
                       pallas_interpret=self.pallas_interpret,
                       name="layer2")(h, deterministic=deterministic, mask=mask)

        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)[:, 0]
        logits = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="fc2")(h)
        encoded = nn.Dense(self.path_dim, kernel_init=torch_kernel_init,
                           dtype=self.dtype, name="multimodal_projection")(h)
        return {"features": encoded, "logits": logits}
