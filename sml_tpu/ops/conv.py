"""Positional-encoding convolutions (PPEG).

PPEG (reference ``models/mil.py:192-206``): the MIL token sequence (minus cls) is
reshaped to an HxW map and run through three parallel depthwise convs (7/5/3) whose sum
plus identity forms a pyramid positional encoding.  Channels-last layout for TPU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.common import torch_kernel_init


class PPEG(nn.Module):
    """Pyramid positional encoding over (B, 1+H*W, C) token sequences."""
    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, _, c = x.shape
        cls_token, feat = x[:, :1], x[:, 1:]
        img = feat.reshape(b, h, w, c)

        def dw(kernel: int, name: str) -> jnp.ndarray:
            pad = kernel // 2
            return nn.Conv(features=c, kernel_size=(kernel, kernel),
                           padding=((pad, pad), (pad, pad)), feature_group_count=c,
                           kernel_init=torch_kernel_init, dtype=self.dtype,
                           name=name)(img)

        out = dw(7, "proj") + img + dw(5, "proj1") + dw(3, "proj2")
        out = out.reshape(b, h * w, c)
        return jnp.concatenate([cls_token, out], axis=1)
