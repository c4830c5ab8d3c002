"""DeformPathomicNet — the paper's dual-subspace genomic-guided deformable model.

Reference call stack (SURVEY.md §3.2, ``models/model.py:440-544`` +
``models/DeformCrossTransMIL.py``): two parallel branches (tumor / immune genes), each
MaxNet -> per-token fusion with the path bag -> deformable cross-attention (1-D or 2-D)
-> pooled 128-d pathomic vector; concat -> classifier, plus per-branch aux heads; for
survival the heads are sigmoided in-model.

Design deltas from the reference (documented, behavior-preserving):
* only the selected attn_dim branch's parameters are created (the reference
  instantiates both and trains neither unused one, relying on
  ``find_unused_parameters=True``);
* the broadcast omic tokens returned for the BatchLoss are passed as the (B, omic_dim)
  vector — the reference returns the (B, N, omic_dim) broadcast whose similarity matrix
  is mathematically identical under BatchLoss's row normalization
  (``utils/loss.py:26-28``: sim/||sim_row|| is scale-invariant);
* vgrid is returned as (B, g, Hd, Wd, 2) and the loss consumes per-GROUP similarity
  (the documented intent); the reference's ``vgrid.view(8, N, -1)`` only coincides with
  that when batch == groups == 8 (``utils/loss.py:23``).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.models.maxnet import MaxNet
from sml_tpu.ops.common import torch_kernel_init
from sml_tpu.ops.deformable import DeformCrossAttention1D, DeformCrossAttention2D
from sml_tpu.ops.fusion import BilinearFusion, FusionNet
from sml_tpu.ops.pooling import Pooler


class DeformCrossTransLayer(nn.Module):
    """Pre-norm deformable cross-attention residual block
    (reference ``models/DeformCrossTransMIL.py:40-77``; note the SHARED LayerNorm
    applied to both streams)."""
    dim: int = 128
    attn_dim: int = 2
    dropout: float = 0.1
    cpb_query_chunk: int = 512
    use_pallas: bool = False
    seq_mesh: Optional[object] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, return_vgrid: bool = False,
                 deterministic: bool = False, mask: jnp.ndarray = None):
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        n1, n2 = norm(x1), norm(x2)
        if self.attn_dim == 1:
            out = DeformCrossAttention1D(
                dim=self.dim, downsample_factor=4, offset_scale=2.0,
                offset_kernel_size=6, cpb_query_chunk=self.cpb_query_chunk,
                use_pallas=self.use_pallas,
                dtype=self.dtype, name="attn1d")(
                n1, n2, return_vgrid=False, deterministic=deterministic, mask=mask)
            return x1 + out
        attn = DeformCrossAttention2D(
            dim=self.dim, dim_head=64, heads=8, dropout=self.dropout,
            downsample_factor=4, offset_scale=4.0, offset_groups=8,
            offset_kernel_size=6, cpb_query_chunk=self.cpb_query_chunk,
            use_pallas=self.use_pallas, seq_mesh=self.seq_mesh,
            dtype=self.dtype, name="attn2d")
        if return_vgrid:
            out, vgrid = attn(n1, n2, return_vgrid=True, deterministic=deterministic,
                              mask=mask)
            return x1 + out, vgrid
        out = attn(n1, n2, return_vgrid=False, deterministic=deterministic, mask=mask)
        return x1 + out


class DeformCrossTransMIL(nn.Module):
    """Pathomic fusion MIL block (reference ``models/DeformCrossTransMIL.py:79-160``)."""
    n_classes: int = 4
    path_dim: int = 128
    attn_dim: int = 2
    return_vgrid: bool = True
    dropout: float = 0.1
    cpb_query_chunk: int = 512
    use_pallas: bool = False
    seq_mesh: Optional[object] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, path: jnp.ndarray, omic: jnp.ndarray,
                 deterministic: bool = False, mask: jnp.ndarray = None
                 ) -> Dict[str, jnp.ndarray]:
        b, n, _ = path.shape
        path = nn.relu(nn.Dense(self.path_dim, kernel_init=torch_kernel_init,
                                dtype=self.dtype, name="fc1")(path))  # (B, N, 128)

        # variable-length bags: pad the token axis to the next perfect square so
        # the 2-D deform grid exists (generalizes the reference's hard-coded 50x50,
        # ``models/DeformableAttention2D.py:239-240``); padded tokens are masked.
        if self.attn_dim == 2:
            side = int(math.ceil(math.sqrt(n)))
            add = side * side - n
            if add:
                path = jnp.pad(path, ((0, 0), (0, add), (0, 0)))
                if mask is None:
                    mask = jnp.concatenate(
                        [jnp.ones((b, n), bool), jnp.zeros((b, add), bool)], axis=1)
                else:
                    mask = jnp.pad(mask, ((0, 0), (0, add)))
                n = n + add

        # NOTE reference arg order: fusion_layer(path, omic) -> concat([path, omic]);
        # the omic vector is passed per-sample — FusionNet folds the broadcast
        # (reference ``DeformCrossTransMIL.py:104``'s repeat(1, N, 1)) into a
        # per-sample term instead of materializing (B, N, omic_dim) tokens.
        h = FusionNet(self.path_dim, dtype=self.dtype,
                      name="fusion_layer")(path, omic)

        layer = DeformCrossTransLayer(dim=self.path_dim, attn_dim=self.attn_dim,
                                      dropout=self.dropout,
                                      cpb_query_chunk=self.cpb_query_chunk,
                                      use_pallas=self.use_pallas,
                                      seq_mesh=self.seq_mesh,
                                      dtype=self.dtype, name="layer3")
        vgrid = None
        if self.attn_dim == 1:
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (1, 1, self.path_dim))
            cls_b = jnp.tile(cls, (b, 1, 1)).astype(h.dtype)
            h = jnp.concatenate([cls_b, h], axis=1)
            path_c = jnp.concatenate([cls_b, path], axis=1)
            mask_c = None
            if mask is not None:  # cls token is always valid
                mask_c = jnp.concatenate([jnp.ones((b, 1), bool), mask], axis=1)
            h = layer(h, path_c, deterministic=deterministic, mask=mask_c)
            h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)[:, 0]
        else:
            if self.return_vgrid:
                h, vgrid = layer(h, path, return_vgrid=True,
                                 deterministic=deterministic, mask=mask)
            else:
                h = layer(h, path, deterministic=deterministic, mask=mask)
            h = Pooler(self.path_dim, dtype=self.dtype,
                       name="pooler")(nn.LayerNorm(epsilon=1e-5, name="norm")(h),
                                      mask=mask)

        logits = nn.Dense(self.n_classes, kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="fc2")(h)
        encoded = nn.Dense(self.path_dim, kernel_init=torch_kernel_init,
                           dtype=self.dtype, name="multimodal_projection")(h)

        out = {"features": encoded, "logits": logits}
        if self.return_vgrid and vgrid is not None:
            out["omic"] = omic          # (B, omic_dim); see module docstring
            out["vgrid"] = vgrid        # (B, g, Hd, Wd, 2)
        return out


class DeformPathomicNet(nn.Module):
    """Flagship model (reference ``models/model.py:440-544``)."""
    label_dim: int = 4
    input_size_omic_tumor: int = 59
    input_size_omic_immune: int = 361
    path_dim: int = 128
    omic_dim: int = 128
    mmhid: int = 128
    dropout_rate: float = 0.1
    attn_dim: int = 2
    return_vgrid: bool = True
    fusion_type: str = "concat"
    cut_fuse_grad: bool = False
    task_type: str = "diag2021"
    init_max: bool = True
    skip: int = 0
    use_bilinear: int = 1
    path_scale: int = 1
    omic_scale: int = 1
    remat: bool = False
    cpb_query_chunk: int = 512
    use_pallas: bool = False
    seq_mesh: Optional[object] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x_path: jnp.ndarray, x_omic_tumor: jnp.ndarray,
                 x_omic_immune: jnp.ndarray, x_omic: Optional[jnp.ndarray] = None,
                 deterministic: bool = False, mask: Optional[jnp.ndarray] = None
                 ) -> Dict[str, jnp.ndarray]:
        del x_omic  # full gene vector unused by this mode

        def branch(name, input_dim, x):
            omic = MaxNet(input_dim=input_dim, omic_dim=self.omic_dim,
                          dropout_rate=self.dropout_rate, label_dim=self.label_dim,
                          init_max=self.init_max, dtype=self.dtype,
                          name=f"omic_net_{name}")(x, deterministic)
            mil_cls = DeformCrossTransMIL
            if self.remat:
                # static_argnums counts __call__ args with self at 0; deterministic is 3
                mil_cls = nn.remat(DeformCrossTransMIL, static_argnums=(3,))
            mil = mil_cls(n_classes=self.label_dim, path_dim=self.path_dim,
                          attn_dim=self.attn_dim, return_vgrid=self.return_vgrid,
                          dropout=self.dropout_rate,
                          cpb_query_chunk=self.cpb_query_chunk,
                          use_pallas=self.use_pallas, seq_mesh=self.seq_mesh,
                          dtype=self.dtype,
                          name=f"pathomic_net_{name}")
            return mil(x_path, omic["features"], deterministic, mask)

        tumor = branch("tumor", self.input_size_omic_tumor, x_omic_tumor)
        immune = branch("immune", self.input_size_omic_immune, x_omic_immune)

        v_t, v_i = tumor["features"], immune["features"]
        if self.cut_fuse_grad:
            v_t, v_i = jax.lax.stop_gradient(v_t), jax.lax.stop_gradient(v_i)
        if self.fusion_type == "concat":
            features = jnp.concatenate([v_t, v_i], axis=1)
        else:
            features = BilinearFusion(
                skip=self.skip, use_bilinear=self.use_bilinear, gate1=1, gate2=1,
                dim1=self.path_dim, dim2=self.omic_dim, scale_dim1=self.path_scale,
                scale_dim2=self.omic_scale, mmhid=self.mmhid,
                dropout_rate=self.dropout_rate, dtype=self.dtype,
                name="fusion")(v_t, v_i, deterministic=deterministic)

        hazard = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                          dtype=self.dtype, name="classifier")(features)
        hazard_t = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                            dtype=self.dtype, name="classifier_tumor")(tumor["features"])
        hazard_i = nn.Dense(self.label_dim, kernel_init=torch_kernel_init,
                            dtype=self.dtype, name="classifier_immune")(immune["features"])

        if self.task_type == "survival":
            hazard = nn.sigmoid(hazard)
            hazard_t = nn.sigmoid(hazard_t)
            hazard_i = nn.sigmoid(hazard_i)

        out = {
            "features": features,
            "vec_tumor": tumor["features"],
            "vec_immune": immune["features"],
            "logits_tumor": hazard_t,
            "logits_immune": hazard_i,
            "logits": hazard,
        }
        if self.return_vgrid:
            out["omic_tumor"] = tumor["omic"]
            out["vgrid_tumor"] = tumor["vgrid"]
            out["omic_immune"] = immune["omic"]
            out["vgrid_immune"] = immune["vgrid"]
        return out
