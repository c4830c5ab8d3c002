"""MaxNet: self-normalizing genomic encoder (reference ``models/model.py:142-187``).

4x [Linear -> ELU -> AlphaDropout] with hidden sizes (64, 48, 32) -> omic_dim, ReLU on
the encoded features, linear classifier head.  ``init_max`` applies N(0, 1/sqrt(fan_in))
weights / zero bias (reference ``utils/utils.py:214-219``), wired here directly as the
kernel initializer instead of post-hoc surgery.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.common import torch_kernel_init
from sml_tpu.ops.snn import AlphaDropout

# N(0, 1/sqrt(fan_in)) — the reference's "self-normalizing" init.
max_kernel_init = jax.nn.initializers.variance_scaling(
    scale=1.0, mode="fan_in", distribution="normal")

_HIDDEN = (64, 48, 32)


class MaxNet(nn.Module):
    input_dim: int = 59
    omic_dim: int = 32
    dropout_rate: float = 0.25
    label_dim: int = 1
    init_max: bool = True
    with_classifier: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_omic: jnp.ndarray, deterministic: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        kinit = max_kernel_init if self.init_max else torch_kernel_init
        h = x_omic
        for i, width in enumerate(list(_HIDDEN) + [self.omic_dim]):
            h = nn.Dense(width, kernel_init=kinit, dtype=self.dtype,
                         name=f"encoder{i + 1}")(h)
            h = nn.elu(h)
            h = AlphaDropout(self.dropout_rate)(h, deterministic=deterministic)
        features = nn.relu(h)

        out = {"features": features}
        if self.with_classifier:
            out["logits"] = nn.Dense(self.label_dim, kernel_init=kinit,
                                     dtype=self.dtype, name="classifier")(features)
        return out
