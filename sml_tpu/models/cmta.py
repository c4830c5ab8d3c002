"""CMTA: cross-modal translation + alignment (reference ``models/model.py:714-853``,
``models/cmta_utils.py:894-948``).

Per-modality Nystrom transformer encoders (Transformer_P pads the bag to a square and
adds a PPEG positional conv; Transformer_G is cls+2 TransLayers), cross-attention
translation P->G and G->P, per-modality decoders over the translated tokens, fusion of
the averaged encoder/decoder cls tokens, and the four cls tokens surfaced for the L1
alignment loss.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.models.mil import TransLayer
from sml_tpu.ops.attention import RawMultiheadAttention
from sml_tpu.ops.common import torch_kernel_init
from sml_tpu.ops.conv import PPEG
from sml_tpu.ops.fusion import BilinearFusion
from sml_tpu.ops.snn import SNNStack


class TransformerP(nn.Module):
    """Square-pad + cls + TransLayer/PPEG/TransLayer (reference ``cmta_utils.py:894-924``)."""
    feature_dim: int = 256
    dtype: Optional[jnp.dtype] = None
    seq_mesh: Optional[object] = None     # shard the (long) patch-token axis
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray, deterministic: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, _ = features.shape
        side = int(math.ceil(math.sqrt(n)))
        add_length = side * side - n
        h = features
        if add_length:
            h = jnp.concatenate([h, h[:, :add_length]], axis=1)

        cls = self.param("cls_token", nn.initializers.normal(1e-6),
                         (1, 1, self.feature_dim))
        h = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(h.dtype), h], axis=1)

        h = TransLayer(self.feature_dim, dtype=self.dtype, seq_mesh=self.seq_mesh,
                       use_pallas=self.use_pallas,
                       pallas_interpret=self.pallas_interpret,
                       name="layer1")(h, deterministic=deterministic)
        h = PPEG(self.feature_dim, dtype=self.dtype, name="pos_layer")(h, side, side)
        h = TransLayer(self.feature_dim, dtype=self.dtype, seq_mesh=self.seq_mesh,
                       use_pallas=self.use_pallas,
                       pallas_interpret=self.pallas_interpret,
                       name="layer2")(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        return h[:, 0], h[:, 1:]


class TransformerG(nn.Module):
    """cls + 2 TransLayers, no padding/PPEG (reference ``cmta_utils.py:927-948``)."""
    feature_dim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, features: jnp.ndarray, deterministic: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = features.shape[0]
        cls = self.param("cls_token", nn.initializers.normal(1e-6),
                         (1, 1, self.feature_dim))
        h = jnp.concatenate([jnp.tile(cls, (b, 1, 1)).astype(features.dtype),
                             features], axis=1)
        h = TransLayer(self.feature_dim, dtype=self.dtype, name="layer1")(
            h, deterministic=deterministic)
        h = TransLayer(self.feature_dim, dtype=self.dtype, name="layer2")(
            h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        return h[:, 0], h[:, 1:]


class CMTA(nn.Module):
    """Only the reference's "small" geometry exists: its CMTA hard-codes 256-d
    cross-attention/encoders against ``size_dict_WSI["small"]`` so the "big"
    entries (wsi 512, omic 1024-stack — ``models/model.py:722-724``) are
    dimensionally inconsistent and would crash if selected; we drop the dead
    ``model_size_*`` knobs rather than replicate a broken switch."""
    label_dim: int = 4
    omic_sizes: Sequence[int] = (100, 100, 100, 131)
    dropout: float = 0.25
    fusion: str = "concat"
    dtype: Optional[jnp.dtype] = None
    seq_mesh: Optional[object] = None     # seq-shards the pathomics branch only
                                          # (the genomics stream is ~5 tokens)
    use_pallas: bool = False              # fused Nystrom chains in Transformer_P
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x_path: jnp.ndarray, x_omic: jnp.ndarray,
                 deterministic: bool = False) -> Dict[str, jnp.ndarray]:
        d = 256

        h_path = nn.relu(nn.Dense(d, kernel_init=torch_kernel_init,
                                  dtype=self.dtype, name="wsi_net")(x_path))
        h_path = nn.Dropout(0.25)(h_path, deterministic=deterministic)

        h_omic = []
        offset = 0
        for idx, sz in enumerate(self.omic_sizes):
            sig = x_omic[:, offset:offset + sz]
            offset += sz
            h_omic.append(SNNStack((d, d), dropout=0.25, dtype=self.dtype,
                                   name=f"sig_net{idx}")(sig, deterministic))
        genomics = jnp.stack(h_omic, axis=1)                       # (B, G, d)

        p_enc_cls, p_tok = TransformerP(d, dtype=self.dtype, seq_mesh=self.seq_mesh,
                                        use_pallas=self.use_pallas,
                                        pallas_interpret=self.pallas_interpret,
                                        name="pathomics_encoder")(
            h_path, deterministic)
        g_enc_cls, g_tok = TransformerG(d, dtype=self.dtype, name="genomics_encoder")(
            genomics, deterministic)

        p_in_g, _ = RawMultiheadAttention(d, 1, dtype=self.dtype, name="P_in_G_Att")(
            p_tok, g_tok, g_tok, deterministic=deterministic)
        g_in_p, _ = RawMultiheadAttention(d, 1, dtype=self.dtype, name="G_in_P_Att")(
            g_tok, p_tok, p_tok, deterministic=deterministic)

        p_dec_cls, _ = TransformerP(d, dtype=self.dtype, seq_mesh=self.seq_mesh,
                                    use_pallas=self.use_pallas,
                                    pallas_interpret=self.pallas_interpret,
                                    name="pathomics_decoder")(
            p_in_g, deterministic)
        g_dec_cls, _ = TransformerG(d, dtype=self.dtype, name="genomics_decoder")(
            g_in_p, deterministic)

        p_avg = (p_enc_cls + p_dec_cls) / 2.0
        g_avg = (g_enc_cls + g_dec_cls) / 2.0
        if self.fusion == "concat":
            h = jnp.concatenate([p_avg, g_avg], axis=1)
            h = nn.relu(nn.Dense(d, kernel_init=torch_kernel_init,
                                 dtype=self.dtype, name="mm0")(h))
            h = nn.relu(nn.Dense(d, kernel_init=torch_kernel_init,
                                 dtype=self.dtype, name="mm1")(h))
        elif self.fusion == "bilinear":
            h = BilinearFusion(dim1=d, dim2=d, scale_dim1=8, scale_dim2=8, mmhid=d,
                               dtype=self.dtype, name="mm")(
                p_avg, g_avg, deterministic=deterministic)
        else:
            raise NotImplementedError(f"fusion {self.fusion!r}")

        logits = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="classifier")(h)
        hazards = nn.sigmoid(logits)
        s = jnp.cumprod(1.0 - hazards, axis=1)
        return {"logits": logits, "hazards": hazards, "S": s,
                "P": p_enc_cls, "P_hat": p_dec_cls,
                "G": g_enc_cls, "G_hat": g_dec_cls}
