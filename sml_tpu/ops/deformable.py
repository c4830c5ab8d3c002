"""Genomic-guided deformable cross-attention (1-D and 2-D) with continuous relative
position bias (CPB, SwinV2-style).

Re-design of the reference's CUDA-kernel-centric implementation
(``models/DeformableAttention2D.py:161-325``, ``models/DeformableAttention1D.py:106-240``):

* ``F.grid_sample`` -> gather+lerp (:mod:`sml_tpu.ops.grid_sample`), which XLA fuses.
* The CPB bias MLP is evaluated in query chunks so the (B*g, N, J, hidden) intermediate
  never materializes in HBM (the reference materializes ~3 GB for B=8, N=2500).
* Channels-last layouts; all contractions are MXU-shaped einsums.

Semantics notes kept from the reference:
* query grid coordinates are normalized by the *offset-grid* extent (Hd-1), then
  resampled against the full feature map with align_corners=False — i.e. the 12x12
  taps spread across the whole 50x50 map.
* the returned ``vgrid`` is laid out (B, g, Hd, Wd, 2); the subspace BatchLoss consumes
  it as per-group flattened vectors (see ``sml_tpu.train.losses.batch_similarity_loss``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.common import torch_kernel_init
from sml_tpu.ops.grid_sample import grid_sample_1d, grid_sample_2d


def make_grid_2d(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(h, w, 2) grid with [..., 0] = x (column) and [..., 1] = y (row) indices."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                          indexing="ij")
    return jnp.stack([xs, ys], axis=-1)


def normalize_grid_2d(grid: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Normalize (..., 2) xy coords from [0, size-1] to [-1, 1] per axis."""
    gx = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    return jnp.stack([gx, gy], axis=-1)


def _chunked_mlp(pos: jnp.ndarray, apply_fn, chunk: int) -> jnp.ndarray:
    """Apply ``apply_fn`` over pos (..., I, J, F) in chunks along I to bound peak memory."""
    i = pos.shape[-3]
    if chunk <= 0 or chunk >= i:
        return apply_fn(pos)
    pad = (-i) % chunk
    if pad:
        pos = jnp.pad(pos, [(0, 0)] * (pos.ndim - 3) + [(0, pad), (0, 0), (0, 0)])
    k = pos.shape[-3] // chunk
    lead = pos.shape[:-3]
    pos = pos.reshape(lead + (k, chunk) + pos.shape[-2:])
    pos = jnp.moveaxis(pos, -4, 0)                       # (k, ..., chunk, J, F)
    out = jax.lax.map(apply_fn, pos)
    out = jnp.moveaxis(out, 0, -4)
    out = out.reshape(lead + (k * chunk,) + out.shape[-2:])
    return out[..., :i, :, :]


def _declare_mlp_params(module: nn.Module, in_dim: int, dim: int, out_dim: int,
                        depth: int):
    """Declare CPB MLP params on ``module`` and return a pure apply closure.

    Raw params (not submodules) so the closure can run inside ``jax.lax.map``
    (creating linen params inside traced control flow is illegal).
    """
    dims = [in_dim] + [dim] * depth + [out_dim]
    ws = [module.param(f"w{i}", torch_kernel_init, (dims[i], dims[i + 1]))
          for i in range(len(dims) - 1)]
    bs = [module.param(f"b{i}", nn.initializers.zeros, (dims[i + 1],))
          for i in range(len(dims) - 1)]

    def apply_fn(x: jnp.ndarray) -> jnp.ndarray:
        n = len(ws)
        for i in range(n):
            x = x @ ws[i] + bs[i]
            if i < n - 1:
                x = nn.relu(x)
        return x

    return apply_fn


class CPB2D(nn.Module):
    """Continuous position bias over signed-log 2-D displacements.

    ``grid_q``: (I, 2) normalized query coords; ``grid_kv``: (B*g, J, 2) normalized
    sampled coords.  Returns (B, g*out_per_group, I, J) = (B, heads, I, J).
    """
    dim: int
    heads: int
    offset_groups: int
    depth: int = 2
    query_chunk: int = 512

    @nn.compact
    def __call__(self, grid_q: jnp.ndarray, grid_kv: jnp.ndarray, batch: int) -> jnp.ndarray:
        out_per_group = self.heads // self.offset_groups
        mlp = _declare_mlp_params(self, 2, self.dim, out_per_group, self.depth)

        pos = grid_q[None, :, None, :] - grid_kv[:, None, :, :]   # (B*g, I, J, 2)
        pos = jnp.sign(pos) * jnp.log(jnp.abs(pos) + 1.0)
        bias = _chunked_mlp(pos, mlp, self.query_chunk)           # (B*g, I, J, o)

        bg, i, j, o = bias.shape
        g = self.offset_groups
        bias = bias.reshape(batch, g, i, j, o)
        bias = bias.transpose(0, 1, 4, 2, 3).reshape(batch, g * o, i, j)
        return bias


class CPB1D(nn.Module):
    """1-D continuous position bias (optionally log-distance transformed)."""
    dim: int
    heads: int
    offset_groups: int
    depth: int = 2
    log_distance: bool = True
    query_chunk: int = 512

    @nn.compact
    def __call__(self, grid_q: jnp.ndarray, grid_kv: jnp.ndarray, batch: int) -> jnp.ndarray:
        out_per_group = self.heads // self.offset_groups
        mlp = _declare_mlp_params(self, 1, self.dim, out_per_group, self.depth)

        pos = grid_q[None, :, None, None] - grid_kv[:, None, :, None]  # (B*g, I, J, 1)
        if self.log_distance:
            pos = jnp.sign(pos) * jnp.log(jnp.abs(pos) + 1.0)
        bias = _chunked_mlp(pos, mlp, self.query_chunk)

        bg, i, j, o = bias.shape
        g = self.offset_groups
        bias = bias.reshape(batch, g, i, j, o)
        bias = bias.transpose(0, 1, 4, 2, 3).reshape(batch, g * o, i, j)
        return bias


def _group(t: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B, ..., g*d) -> (B*g, ..., d): split channels into g contiguous groups."""
    b = t.shape[0]
    spatial = t.shape[1:-1]
    d = t.shape[-1] // g
    t = t.reshape((b,) + spatial + (g, d))
    t = jnp.moveaxis(t, -2, 1)
    return t.reshape((b * g,) + spatial + (d,))


def _ungroup(t: jnp.ndarray, g: int) -> jnp.ndarray:
    """(B*g, ..., d) -> (B, ..., g*d)."""
    bg = t.shape[0]
    b = bg // g
    spatial = t.shape[1:-1]
    d = t.shape[-1]
    t = t.reshape((b, g) + spatial + (d,))
    t = jnp.moveaxis(t, 1, -2)
    return t.reshape((b,) + spatial + (g * d,))


class DeformCrossAttention2D(nn.Module):
    """2-D deformable cross-attention: queries from the fused stream (x1), keys/values
    bilinearly sampled from the path stream (x2) at learned offset locations.

    Token API: x1, x2 are (B, N, C) with N a perfect square.
    """
    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    downsample_factor: int = 4
    offset_scale: float = 4.0
    offset_groups: int = 8
    offset_kernel_size: int = 6
    group_queries: bool = True
    group_key_values: bool = True
    cpb_query_chunk: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, return_vgrid: bool = False,
                 deterministic: bool = False):
        b, n, c = x1.shape
        h = w = int(round(n ** 0.5))
        assert h * w == n, f"token count {n} must be a perfect square"
        g = self.offset_groups
        heads = self.heads
        inner_dim = self.dim_head * heads
        offset_dims = inner_dim // g
        assert (self.offset_kernel_size - self.downsample_factor) % 2 == 0

        img1 = x1.reshape(b, h, w, c)
        img2 = x2.reshape(b, h, w, c)

        conv1x1 = lambda feat, groups, bias, name: nn.Conv(
            features=feat, kernel_size=(1, 1), feature_group_count=groups,
            use_bias=bias, kernel_init=torch_kernel_init, dtype=self.dtype, name=name)

        q = conv1x1(inner_dim, g if self.group_queries else 1, False, "to_q")(img1)

        grouped_q = _group(q, g)                                  # (B*g, H, W, dg)

        pad = (self.offset_kernel_size - self.downsample_factor) // 2
        off = nn.Conv(features=offset_dims, kernel_size=(self.offset_kernel_size,) * 2,
                      strides=(self.downsample_factor,) * 2,
                      padding=((pad, pad), (pad, pad)), feature_group_count=offset_dims,
                      kernel_init=torch_kernel_init, dtype=self.dtype,
                      name="offset_conv")(grouped_q)
        off = nn.gelu(off, approximate=False)
        off = conv1x1(2, 1, False, "offset_proj")(off)
        offsets = nn.tanh(off) * self.offset_scale                # (B*g, Hd, Wd, 2)

        hd, wd = offsets.shape[1], offsets.shape[2]
        grid = make_grid_2d(hd, wd, offsets.dtype)
        vgrid = grid[None] + offsets                              # (B*g, Hd, Wd, 2)
        vgrid_scaled = normalize_grid_2d(vgrid, hd, wd)

        kv = grid_sample_2d(_group(img2, g), vgrid_scaled)        # (B*g, Hd, Wd, c/g)
        kv = _ungroup(kv, g)                                      # (B, Hd, Wd, c)

        k = conv1x1(inner_dim, g if self.group_key_values else 1, False, "to_k")(kv)
        v = conv1x1(inner_dim, g if self.group_key_values else 1, False, "to_v")(kv)

        q = q * (self.dim_head ** -0.5)

        def split_heads(t):
            bb = t.shape[0]
            j = t.shape[1] * t.shape[2]
            return t.reshape(bb, j, heads, self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        sim = jnp.einsum("bhid,bhjd->bhij", qh, kh)               # (B, h, N, J)

        grid_q_scaled = normalize_grid_2d(make_grid_2d(h, w, sim.dtype), h, w
                                          ).reshape(n, 2)
        grid_kv_scaled = vgrid_scaled.reshape(b * g, hd * wd, 2)
        bias = CPB2D(self.dim // 4, heads=heads, offset_groups=g,
                     query_chunk=self.cpb_query_chunk,
                     name="rel_pos_bias")(grid_q_scaled, grid_kv_scaled, b)
        sim = sim + bias

        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)             # (B, h, N, dh)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner_dim)
        out = conv1x1(self.dim, 1, True, "to_out")(out)
        out = out.reshape(b, n, self.dim)

        if return_vgrid:
            vgrid_out = vgrid.reshape(b, g, hd, wd, 2)
            return out, vgrid_out
        return out


class DeformCrossAttention1D(nn.Module):
    """1-D deformable cross-attention over token sequences (cls token included upstream)."""
    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    downsample_factor: int = 4
    offset_scale: float = 4.0
    offset_groups: int = 4
    offset_kernel_size: int = 6
    cpb_log_distance: bool = True
    group_queries: bool = False
    group_key_values: bool = False
    cpb_query_chunk: int = 512
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, return_vgrid: bool = False,
                 deterministic: bool = False):
        b, n, c = x1.shape
        g = self.offset_groups
        heads = self.heads
        inner_dim = self.dim_head * heads
        offset_dims = inner_dim // g
        assert (self.offset_kernel_size - self.downsample_factor) % 2 == 0

        conv1 = lambda feat, groups, bias, name: nn.Conv(
            features=feat, kernel_size=(1,), feature_group_count=groups,
            use_bias=bias, kernel_init=torch_kernel_init, dtype=self.dtype, name=name)

        q = conv1(inner_dim, g if self.group_queries else 1, False, "to_q")(x1)
        grouped_q = _group(q, g)                                  # (B*g, N, dg)

        pad = (self.offset_kernel_size - self.downsample_factor) // 2
        off = nn.Conv(features=offset_dims, kernel_size=(self.offset_kernel_size,),
                      strides=(self.downsample_factor,), padding=((pad, pad),),
                      feature_group_count=offset_dims, kernel_init=torch_kernel_init,
                      dtype=self.dtype, name="offset_conv")(grouped_q)
        off = nn.gelu(off, approximate=False)
        off = conv1(1, 1, False, "offset_proj")(off)[..., 0]      # (B*g, Nd)
        offsets = nn.tanh(off) * self.offset_scale

        nd = offsets.shape[-1]
        grid = jnp.arange(nd, dtype=offsets.dtype)
        vgrid = grid[None] + offsets                              # (B*g, Nd)
        vgrid_scaled = 2.0 * vgrid / max(nd - 1, 1) - 1.0

        kv = grid_sample_1d(_group(x2, g), vgrid_scaled)          # (B*g, Nd, c/g)
        kv = _ungroup(kv, g)                                      # (B, Nd, c)

        k = conv1(inner_dim, g if self.group_key_values else 1, False, "to_k")(kv)
        v = conv1(inner_dim, g if self.group_key_values else 1, False, "to_v")(kv)

        q = q * (self.dim_head ** -0.5)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        sim = jnp.einsum("bhid,bhjd->bhij", qh, kh)               # (B, h, N, Nd)

        seq_scaled = 2.0 * jnp.arange(n, dtype=sim.dtype) / max(n - 1, 1) - 1.0
        bias = CPB1D(self.dim // 4, heads=heads, offset_groups=g,
                     log_distance=self.cpb_log_distance,
                     query_chunk=self.cpb_query_chunk,
                     name="rel_pos_bias")(seq_scaled, vgrid_scaled, b)
        sim = sim + bias

        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = nn.softmax(sim, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner_dim)
        out = conv1(self.dim, 1, True, "to_out")(out)

        if return_vgrid:
            return out, vgrid.reshape(b, g, nd)
        return out
