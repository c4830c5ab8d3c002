"""Multimodal fusion blocks: gated bilinear pooling and per-token concat fusion.

BilinearFusion (reference ``models/fusion.py:6-63``): per-modality sigmoid gates driven
by a bilinear (or concat-linear) interaction, outer product of gated features with an
appended constant-1 column, then a two-stage MLP encoder with BatchNorm.  The outer
product is one einsum on TPU; BatchNorm moments are computed over the jit-visible
global batch, which subsumes the reference's 396-line SyncBatchNorm package.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.common import DenseParams, torch_bilinear_init, torch_kernel_init


class Bilinear(nn.Module):
    """torch ``nn.Bilinear`` equivalent: out_o = x1^T W_o x2 + b_o."""
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        in1, in2 = x1.shape[-1], x2.shape[-1]
        w = self.param("weight", torch_bilinear_init, (self.features, in1, in2))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return jnp.einsum("bi,oij,bj->bo", x1, w, x2) + b


class FusionNet(nn.Module):
    """Per-token concat + Dense fusion (reference ``models/DeformCrossTransMIL.py:28-38``).

    When the second stream is a per-sample VECTOR (B, d2) — the flagship
    broadcasts one omic vector to every token
    (``models/DeformCrossTransMIL.py:104``) — the concat matmul splits exactly:
    ``[x1, x2] @ W == x1 @ W[:d1] + x2 @ W[d1:]``, and the x2 term (plus its
    weight gradient) collapses to one per-sample row instead of N identical
    token rows.  The parameter tree is identical to the concat path, so
    checkpoints and the torch converter are unaffected.
    """
    feature_dim: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, gene_features: jnp.ndarray, image_features: jnp.ndarray) -> jnp.ndarray:
        if image_features.ndim == gene_features.ndim:
            combined = jnp.concatenate([gene_features, image_features], axis=-1)
            return nn.Dense(self.feature_dim, kernel_init=torch_kernel_init,
                            dtype=self.dtype, name="fusion_layer")(combined)
        assert image_features.ndim == gene_features.ndim - 1
        d1 = gene_features.shape[-1]
        d2 = image_features.shape[-1]
        params = DenseParams((d1 + d2, self.feature_dim),
                             name="fusion_layer")()
        k = params["kernel"]
        b = params["bias"]
        cdt = self.dtype or k.dtype
        tok = jnp.dot(gene_features.astype(cdt), k[:d1].astype(cdt))
        per_sample = (jnp.dot(image_features.astype(cdt), k[d1:].astype(cdt))
                      + b.astype(cdt))
        return tok + per_sample[..., None, :]


class BilinearFusion(nn.Module):
    skip: int = 1
    use_bilinear: int = 1
    gate1: int = 1
    gate2: int = 1
    dim1: int = 32
    dim2: int = 32
    scale_dim1: int = 1
    scale_dim2: int = 1
    mmhid: int = 64
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, vec1: jnp.ndarray, vec2: jnp.ndarray,
                 deterministic: bool = False, use_running_average: Optional[bool] = None
                 ) -> jnp.ndarray:
        if use_running_average is None:
            use_running_average = deterministic
        d1 = self.dim1 // self.scale_dim1
        d2 = self.dim2 // self.scale_dim2

        dense = lambda f, name: nn.Dense(f, kernel_init=torch_kernel_init,
                                         dtype=self.dtype, name=name)
        drop = lambda x: nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        vec1 = nn.relu(vec1)
        vec2 = nn.relu(vec2)

        if self.gate1:
            h1 = nn.relu(dense(d1, "linear_h1")(vec1))
            if self.use_bilinear:
                z1 = Bilinear(d1, dtype=self.dtype, name="linear_z1")(vec1, vec2)
            else:
                z1 = dense(d1, "linear_z1")(jnp.concatenate([vec1, vec2], axis=1))
            o1 = drop(nn.relu(dense(d1, "linear_o1")(nn.sigmoid(z1) * h1)))
        else:
            o1 = drop(nn.relu(dense(d1, "linear_o1")(vec1)))

        if self.gate2:
            h2 = nn.relu(dense(d2, "linear_h2")(vec2))
            if self.use_bilinear:
                z2 = Bilinear(d2, dtype=self.dtype, name="linear_z2")(vec1, vec2)
            else:
                z2 = dense(d2, "linear_z2")(jnp.concatenate([vec1, vec2], axis=1))
            o2 = drop(nn.relu(dense(d2, "linear_o2")(nn.sigmoid(z2) * h2)))
        else:
            o2 = drop(nn.relu(dense(d2, "linear_o2")(vec2)))

        ones = jnp.ones((o1.shape[0], 1), dtype=o1.dtype)
        o1 = jnp.concatenate([o1, ones], axis=1)
        o2 = jnp.concatenate([o2, ones], axis=1)
        o12 = jnp.einsum("bi,bj->bij", o1, o2).reshape(o1.shape[0], -1)
        out = drop(o12)

        bn = lambda name: nn.BatchNorm(use_running_average=use_running_average,
                                       momentum=0.9, epsilon=1e-5, name=name)
        out = drop(nn.relu(bn("bn1")(dense(self.mmhid, "encoder1")(out))))
        if self.skip:
            out = jnp.concatenate([out, o1, o2], axis=1)
        out = drop(nn.relu(bn("bn2")(dense(self.mmhid, "encoder2")(out))))
        return out


class TrilinearFusion(nn.Module):
    """Three-modality gated fusion (reference ``models/fusion.py:66-201``, variants A/B).

    Variant A gates modality-2 with modality-3; variant B gates modality-2 with
    modality-1.  Unused by any reference mode but kept for inventory parity.
    """
    variant: str = "A"
    skip: int = 1
    use_bilinear: int = 1
    gate1: int = 1
    gate2: int = 1
    gate3: int = 1
    dim1: int = 32
    dim2: int = 32
    dim3: int = 32
    scale_dim1: int = 1
    scale_dim2: int = 1
    scale_dim3: int = 1
    mmhid: int = 96
    dropout_rate: float = 0.25
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, vec1: jnp.ndarray, vec2: jnp.ndarray, vec3: jnp.ndarray,
                 deterministic: bool = False) -> jnp.ndarray:
        d1 = self.dim1 // self.scale_dim1
        d2 = self.dim2 // self.scale_dim2
        d3 = self.dim3 // self.scale_dim3

        dense = lambda f, name: nn.Dense(f, kernel_init=torch_kernel_init,
                                         dtype=self.dtype, name=name)
        drop = lambda x: nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)

        def gated(idx, d, vec, z_pair):
            if not getattr(self, f"gate{idx}"):
                return drop(nn.relu(dense(d, f"linear_o{idx}")(vec)))
            h = nn.relu(dense(d, f"linear_h{idx}")(vec))
            va, vb = z_pair
            if self.use_bilinear:
                z = Bilinear(d, dtype=self.dtype, name=f"linear_z{idx}")(va, vb)
            else:
                z = dense(d, f"linear_z{idx}")(jnp.concatenate([va, vb], axis=1))
            return drop(nn.relu(dense(d, f"linear_o{idx}")(nn.sigmoid(z) * h)))

        z2_pair = (vec2, vec3) if self.variant == "A" else (vec2, vec1)
        o1 = gated(1, d1, vec1, (vec1, vec3))
        o2 = gated(2, d2, vec2, z2_pair)
        o3 = gated(3, d3, vec3, (vec1, vec3))

        ones = jnp.ones((o1.shape[0], 1), dtype=o1.dtype)
        o1 = jnp.concatenate([o1, ones], axis=1)
        o2 = jnp.concatenate([o2, ones], axis=1)
        o3 = jnp.concatenate([o3, ones], axis=1)
        o12 = jnp.einsum("bi,bj->bij", o1, o2).reshape(o1.shape[0], -1)
        o123 = jnp.einsum("bi,bj->bij", o12, o3).reshape(o1.shape[0], -1)

        out = drop(o123)
        out = drop(nn.relu(dense(self.mmhid, "encoder1")(out)))
        if self.skip:
            out = jnp.concatenate([out, o1, o2, o3], axis=1)
        out = drop(nn.relu(dense(self.mmhid, "encoder2")(out)))
        return out
