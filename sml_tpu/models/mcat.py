"""MCAT: genomic-guided co-attention survival model (reference ``models/model.py:559-705``).

Four genomic signature groups [100, 100, 100, 131] each through their own SNN stack;
the 4 omic embeddings query the 2500 path tokens through a 1-head co-attention (the
asymmetry IS the long-sequence strategy: 4 queries x N keys); per-modality 2-layer
post-norm transformers + gated attention pooling; concat-MLP fusion; sigmoid hazards
and S = cumprod(1 - h).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.attention import RawMultiheadAttention
from sml_tpu.ops.common import torch_kernel_init
from sml_tpu.ops.fusion import BilinearFusion
from sml_tpu.ops.pooling import AttnNetGated
from sml_tpu.ops.snn import SNNStack
from sml_tpu.ops.transformer import TransformerEncoder

_SIZE_WSI = {"small": (1024, 256, 256), "big": (1024, 512, 384)}
_SIZE_OMIC = {"small": (256, 256), "big": (1024, 1024, 1024, 256)}


class MCATSurv(nn.Module):
    label_dim: int = 4
    omic_sizes: Sequence[int] = (100, 100, 100, 131)
    model_size_wsi: str = "small"
    model_size_omic: str = "small"
    dropout: float = 0.25
    fusion: str = "concat"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_path: jnp.ndarray, x_omic: jnp.ndarray,
                 deterministic: bool = False) -> Dict[str, jnp.ndarray]:
        size = _SIZE_WSI[self.model_size_wsi]
        hidden = _SIZE_OMIC[self.model_size_omic]
        d = size[1]

        # WSI bag -> d
        h_path_bag = nn.relu(nn.Dense(d, kernel_init=torch_kernel_init,
                                      dtype=self.dtype, name="wsi_net")(x_path))
        h_path_bag = nn.Dropout(0.25)(h_path_bag, deterministic=deterministic)

        # per-signature SNN stacks
        h_omic = []
        offset = 0
        for idx, sz in enumerate(self.omic_sizes):
            sig = x_omic[:, offset:offset + sz]
            offset += sz
            h_omic.append(SNNStack(hidden, dropout=0.25, dtype=self.dtype,
                                   name=f"sig_net{idx}")(sig, deterministic))
        h_omic_bag = jnp.stack(h_omic, axis=1)                   # (B, G, d)

        # co-attention: omic queries over path tokens
        h_path_coattn, a_coattn = RawMultiheadAttention(
            d, 1, dtype=self.dtype, name="coattn")(
            h_omic_bag, h_path_bag, h_path_bag, deterministic=deterministic)

        def pooled_branch(tokens: jnp.ndarray, prefix: str) -> jnp.ndarray:
            trans = TransformerEncoder(2, d, 8, dim_feedforward=512,
                                       dropout=self.dropout, dtype=self.dtype,
                                       name=f"{prefix}_transformer")(
                tokens, deterministic=deterministic)
            a, h = AttnNetGated(hidden=size[2], n_classes=1, dropout=self.dropout,
                                dtype=self.dtype, name=f"{prefix}_attention_head")(
                trans, deterministic=deterministic)
            a = nn.softmax(a.transpose(0, 2, 1), axis=-1)        # (B, 1, G)
            pooled = jnp.einsum("bkg,bgd->bkd", a, h)[:, 0]      # (B, d)
            pooled = nn.relu(nn.Dense(size[2], kernel_init=torch_kernel_init,
                                      dtype=self.dtype, name=f"{prefix}_rho")(pooled))
            return nn.Dropout(self.dropout)(pooled, deterministic=deterministic)

        h_path = pooled_branch(h_path_coattn, "path")
        h_omic_pooled = pooled_branch(h_omic_bag, "omic")

        if self.fusion == "concat":
            h = jnp.concatenate([h_path, h_omic_pooled], axis=1)
            h = nn.relu(nn.Dense(size[2], kernel_init=torch_kernel_init,
                                 dtype=self.dtype, name="mm0")(h))
            h = nn.relu(nn.Dense(size[2], kernel_init=torch_kernel_init,
                                 dtype=self.dtype, name="mm1")(h))
        elif self.fusion == "bilinear":
            # reference models/model.py:605-606 builds BilinearFusion(dim1=256,
            # dim2=256, scale_dim1=8, scale_dim2=8, mmhid=256); its call site
            # (:655) wraps both vectors in unsqueeze(0), which only survives
            # torch.cat's rank check at B=1 (squeeze() collapses the batch dim)
            # and BatchNorm1d only in eval — i.e. the reference's working
            # surface is B=1 inference.  We apply the fusion batched on
            # (B, d) directly (the CMTA call convention, :829), which is the
            # same math at B=1 and well-defined for any B.
            h = BilinearFusion(dim1=256, dim2=256, scale_dim1=8, scale_dim2=8,
                               mmhid=256, dtype=self.dtype, name="mm")(
                h_path, h_omic_pooled, deterministic=deterministic)
        else:
            raise NotImplementedError(f"fusion {self.fusion!r}")

        logits = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="classifier")(h)
        hazards = nn.sigmoid(logits)
        s = jnp.cumprod(1.0 - hazards, axis=1)
        return {"logits": logits, "hazards": hazards, "S": s,
                "coattn": a_coattn}
