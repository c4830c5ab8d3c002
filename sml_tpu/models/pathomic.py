"""Two-modality pathomic fusion baselines (reference ``models/model.py:250-438``)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.models.maxnet import MaxNet
from sml_tpu.models.mil import ABMIL
from sml_tpu.ops.common import torch_kernel_init
from sml_tpu.ops.fusion import BilinearFusion


class _FusionMixin:
    """Shared concat/add/pofusion combination logic (optionally grad-cut)."""

    def _combine(self, v1, v2, deterministic):
        if self.cut_fuse_grad:
            v1 = jax.lax.stop_gradient(v1)
            v2 = jax.lax.stop_gradient(v2)
        if self.fusion_type == "concat":
            return jnp.concatenate([v1, v2], axis=1)
        if self.fusion_type == "add":
            return v1 + v2
        return BilinearFusion(skip=self.skip, use_bilinear=self.use_bilinear,
                              gate1=self.gate1, gate2=self.gate2,
                              dim1=self.path_dim, dim2=self.omic_dim,
                              scale_dim1=self.path_scale, scale_dim2=self.omic_scale,
                              mmhid=self.mmhid, dropout_rate=self.dropout_rate,
                              dtype=self.dtype, name="fusion")(
            v1, v2, deterministic=deterministic)


class PathomicNet(nn.Module, _FusionMixin):
    """ABMIL(path) + MaxNet(omic) + fusion head (reference ``models/model.py:353-438``)."""
    label_dim: int = 4
    input_size_omic: int = 431
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    dropout_rate: float = 0.25
    fusion_type: str = "concat"
    cut_fuse_grad: bool = False
    skip: int = 0
    use_bilinear: int = 1
    gate1: int = 1
    gate2: int = 1
    path_scale: int = 1
    omic_scale: int = 1
    init_max: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_path: jnp.ndarray, x_omic: jnp.ndarray,
                 deterministic: bool = False) -> Dict[str, jnp.ndarray]:
        path = ABMIL(label_dim=self.label_dim, path_dim=self.path_dim,
                     dtype=self.dtype, name="path_net")(x_path, deterministic)
        omic = MaxNet(input_dim=self.input_size_omic, omic_dim=self.omic_dim,
                      dropout_rate=self.dropout_rate, label_dim=self.label_dim,
                      init_max=self.init_max, dtype=self.dtype,
                      name="omic_net")(x_omic, deterministic)

        features = self._combine(path["features"], omic["features"], deterministic)
        out_dim = 2 * self.mmhid if self.fusion_type == "concat" else self.mmhid
        del out_dim  # classifier infers input dim; label_dim is the output
        logits = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="classifier")(features)
        return {
            "features": features,
            "path_vec": path["features"],
            "omic_vec": omic["features"],
            "logits_path": path["logits"],
            "logits_omic": omic["logits"],
            "logits": logits,
        }


class PathomicNetOriginal(nn.Module, _FusionMixin):
    """Mean-pool path branch variant (reference ``models/model.py:250-351``).

    The reference applies ``path_classifier`` to the raw 3-D bag (a latent bug,
    ``models/model.py:299``); here it is applied to the mean-pooled bag features, which
    is the evident intent and yields (B, label_dim) aux logits.
    """
    label_dim: int = 4
    input_size_omic: int = 431
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    dropout_rate: float = 0.25
    fusion_type: str = "concat"
    cut_fuse_grad: bool = False
    skip: int = 0
    use_bilinear: int = 1
    gate1: int = 1
    gate2: int = 1
    path_scale: int = 1
    omic_scale: int = 1
    init_max: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_path: jnp.ndarray, x_omic: jnp.ndarray,
                 deterministic: bool = False) -> Dict[str, jnp.ndarray]:
        pooled = jnp.mean(x_path, axis=1)                       # (B, 1024)
        path_vec = nn.Dense(self.path_dim, kernel_init=torch_kernel_init,
                            dtype=self.dtype, name="path_net")(pooled)
        logits_path = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                               dtype=self.dtype, name="path_classifier")(pooled)

        omic = MaxNet(input_dim=self.input_size_omic, omic_dim=self.omic_dim,
                      dropout_rate=self.dropout_rate, label_dim=self.label_dim,
                      init_max=self.init_max, dtype=self.dtype,
                      name="omic_net")(x_omic, deterministic)

        features = self._combine(path_vec, omic["features"], deterministic)
        logits = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="classifier")(features)
        return {
            "features": features,
            "path_vec": path_vec,
            "omic_vec": omic["features"],
            "logits_path": logits_path,
            "logits_omic": omic["logits"],
            "logits": logits,
        }
