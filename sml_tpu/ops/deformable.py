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

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sml_tpu.ops.common import torch_kernel_init
from sml_tpu.ops.grid_sample import (grid_sample_1d, grid_sample_2d,
                                     grid_sample_2d_matmul)

# Route the 2-D resample through the separable one-hot-matmul formulation
# (same bilinear math; the backward's d_inp becomes an MXU contraction instead
# of the scatter-add that gather AD produces — TPU scatters serialize).
# Step-level A/B @4k B=8 (paired, same session): gather 52.64 ms, matmul
# 49.75 ms — default on; SML_TPU_GRID_MATMUL=0 restores the gather form.
_GRID_MATMUL = os.environ.get("SML_TPU_GRID_MATMUL", "1") != "0"
_grid_sample_2d = grid_sample_2d_matmul if _GRID_MATMUL else grid_sample_2d


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
    """Continuous position bias over signed-log 2-D displacements — MXU-restructured.

    The naive form (reference ``DeformableAttention2D.py:120-157``) evaluates a
    2->dim->dim->o MLP at every (query, key) displacement: the K=2 and dim x dim
    matmuls run at a few percent of MXU utilization and dominate the whole model
    (94% of step time measured).  This implementation is EXACT but restructured:

    * layer 1 factorizes over the separable query grid — sign-log displacements in x
      depend only on the query COLUMN and those in y only on the ROW, and the first
      linear layer is additive across the two coordinates, so its outputs are
      precomputed on (W, J) and (H, J) tables and broadcast-added (no matmul at all);
    * layer 2's (dim x dim) matmul is packed R=4 query-rows at a time against a
      block-diagonal (R*dim x R*dim) weight so the MXU sees 128-wide contractions;
    * the (H, W, J, dim) activations are produced in row chunks (lax.map) so they
      never hit HBM at full size; compute runs in ``dtype`` with f32 accumulation.

    API: x_coords (W,), y_coords (H,) normalized query-grid axes; grid_kv (B*g, J, 2)
    normalized sampled coords.  Returns (B, heads, H*W, J); query index = iy*W + ix.

    ``impl``:
      * "naive": dense (query, key) displacement MLP, chunked over queries — what XLA
        compiles best in practice (measured: an MXU-"friendly" block-diagonal
        restructure was 10x slower due to relayouts);
      * "factorized": the separable layer-1 + block-diagonal layer-2 variant, kept for
        study/benchmarking.
    """
    dim: int
    heads: int
    offset_groups: int
    depth: int = 2
    impl: str = "naive"
    query_chunk: int = 512    # naive: query positions per lax.map chunk
    row_chunk: int = 10       # factorized: query-grid rows per chunk
    block_rows: int = 4       # factorized: rows per block-diagonal matmul
    pallas_interpret: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        assert self.depth == 2, "CPB implements the reference depth=2"
        d, o = self.dim, self.heads // self.offset_groups
        self.w0 = self.param("w0", torch_kernel_init, (2, d))
        self.w1 = self.param("w1", torch_kernel_init, (d, d))
        self.w2 = self.param("w2", torch_kernel_init, (d, o))
        self.b0 = self.param("b0", nn.initializers.zeros, (d,))
        self.b1 = self.param("b1", nn.initializers.zeros, (d,))
        self.b2 = self.param("b2", nn.initializers.zeros, (o,))

    def raw(self):
        """Raw param values (registers the setup params on first touch) — the
        sequence-parallel body re-applies CPB2D on this tree inside shard_map."""
        return {"w0": self.w0, "w1": self.w1, "w2": self.w2,
                "b0": self.b0, "b1": self.b1, "b2": self.b2}

    def factors(self, x_coords: jnp.ndarray, y_coords: jnp.ndarray,
                grid_kv: jnp.ndarray):
        """Signed-log displacement tables + raw MLP params (for the Pallas
        kernel).  Round 5: the separable layer-1 u/v tables (67 MB each per
        branch at the 4k shape) are built INSIDE the kernels from these thin
        tables — their XLA-side build + backward measured 6.2 ms/branch.

        Returns (dx, dy, w0x, w0y, b0, w1, b1, w2, b2) with
          dx: (BG, W*J) f32 — column displacements, lane order wcol*J + j
             ("j fastest", matching ``pltpu.repeat``'s tiling of the per-row
             table)
          dy: (BG, H, J) f32 — row displacements
        """
        cdt = self.dtype or jnp.float32
        signlog = lambda p: jnp.sign(p) * jnp.log(jnp.abs(p) + 1.0)
        dx = signlog(x_coords[None, :, None] - grid_kv[:, None, :, 0])  # (BG, W, J)
        dy = signlog(y_coords[None, :, None] - grid_kv[:, None, :, 1])  # (BG, H, J)
        bg = dx.shape[0]
        return (dx.reshape(bg, -1).astype(jnp.float32),
                dy.astype(jnp.float32),
                self.w0[0].astype(cdt), self.w0[1].astype(cdt),
                self.b0.astype(cdt), self.w1.astype(cdt),
                self.b1.astype(cdt), self.w2.astype(cdt),
                self.b2.astype(cdt))

    def flat_bias(self, x_coords: jnp.ndarray, y_coords: jnp.ndarray,
                  grid_kv: jnp.ndarray) -> Optional[jnp.ndarray]:
        """(BG, H*W, J) Pallas bias, in the compute dtype, for the fused
        attention kernel (query
        index iy*W + ix, identical to ``__call__``'s layout — the reshape from
        the kernel's (BG, H, W*J) is free); None when the shape has no legal
        kernel tiling (caller falls back to the XLA attention chain)."""
        assert self.impl == "pallas" and self.heads == self.offset_groups
        from sml_tpu.ops.pallas.deform_attn import (cpb_bias_trainable,
                                                    pallas_cpb_supported)

        w, h = x_coords.shape[0], y_coords.shape[0]
        bg, j, _ = grid_kv.shape
        facs = self.factors(x_coords, y_coords, grid_kv)
        if not pallas_cpb_supported(self.dim, w, h, j,
                                    jnp.dtype(facs[2].dtype).itemsize):
            return None
        flat = cpb_bias_trainable(*facs, self.pallas_interpret)  # (BG, H, W*J)
        return flat.reshape(bg, h * w, j)

    def __call__(self, x_coords: jnp.ndarray, y_coords: jnp.ndarray,
                 grid_kv: jnp.ndarray, batch: int) -> jnp.ndarray:
        o = self.heads // self.offset_groups
        ws = [self.w0, self.w1, self.w2]
        bs = [self.b0, self.b1, self.b2]

        cdt = self.dtype or jnp.float32
        bg, j, _ = grid_kv.shape
        w, h = x_coords.shape[0], y_coords.shape[0]

        if self.impl == "pallas":
            assert o == 1, "pallas CPB assumes one bias head per offset group"
            from sml_tpu.ops.pallas.deform_attn import (cpb_bias_trainable,
                                                        pallas_cpb_supported)

            facs = self.factors(x_coords, y_coords, grid_kv)
            if pallas_cpb_supported(self.dim, w, h, j,
                                    jnp.dtype(facs[2].dtype).itemsize):
                flat = cpb_bias_trainable(*facs,
                                          self.pallas_interpret)   # (BG, H, W*J)
                bias = flat.reshape(bg, h * w, j, 1)
            else:
                # shape exceeds the kernel's VMEM tiling (e.g. 16k-patch bags):
                # fall back to the XLA formulation rather than failing to lower
                bias = self._naive(x_coords, y_coords, grid_kv, ws, bs, cdt, o)
        elif self.impl == "naive":
            bias = self._naive(x_coords, y_coords, grid_kv, ws, bs, cdt, o)
        else:
            bias = self._factorized(x_coords, y_coords, grid_kv, ws, bs, cdt, o)

        g = self.offset_groups
        bias = bias.reshape(batch, g, h * w, j, o)
        bias = bias.transpose(0, 1, 4, 2, 3).reshape(batch, g * o, h * w, j)
        return bias.astype(jnp.float32)

    def _naive(self, x_coords, y_coords, grid_kv, ws, bs, cdt, o):
        grid_q = jnp.stack(
            [jnp.tile(x_coords, y_coords.shape[0]),
             jnp.repeat(y_coords, x_coords.shape[0])], axis=-1)         # (H*W, 2)

        def mlp(pos):
            x = pos.astype(cdt)
            x = nn.relu(jnp.dot(x, ws[0].astype(cdt),
                                preferred_element_type=jnp.float32).astype(cdt)
                        + bs[0].astype(cdt))
            x = nn.relu(jnp.dot(x, ws[1].astype(cdt),
                                preferred_element_type=jnp.float32).astype(cdt)
                        + bs[1].astype(cdt))
            return (jnp.dot(x, ws[2].astype(cdt),
                            preferred_element_type=jnp.float32).astype(cdt)
                    + bs[2].astype(cdt))

        pos = grid_q[None, :, None, :] - grid_kv[:, None, :, :]        # (BG, I, J, 2)
        pos = jnp.sign(pos) * jnp.log(jnp.abs(pos) + 1.0)
        # remat: recompute the (chunk, J, dim) activations in backward instead of
        # storing them (kills ~GBs of residual HBM traffic; measured 1.5x faster bwd)
        return _chunked_mlp(pos, jax.checkpoint(mlp), self.query_chunk)

    def _factorized(self, x_coords, y_coords, grid_kv, ws, bs, cdt, o):
        bg, j, _ = grid_kv.shape
        w, h = x_coords.shape[0], y_coords.shape[0]
        d = self.dim
        r = self.block_rows

        signlog = lambda p: jnp.sign(p) * jnp.log(jnp.abs(p) + 1.0)
        dx = signlog(x_coords[None, :, None] - grid_kv[:, None, :, 0])  # (BG, W, J)
        dy = signlog(y_coords[None, :, None] - grid_kv[:, None, :, 1])  # (BG, H, J)

        u = dx[..., None].astype(cdt) * ws[0][0].astype(cdt)            # (BG, W, J, d)
        v = (dy[..., None].astype(cdt) * ws[0][1].astype(cdt)
             + bs[0].astype(cdt))                                       # (BG, H, J, d)

        w1_blk = jnp.kron(jnp.eye(r, dtype=cdt), ws[1].astype(cdt))
        b1_t = jnp.tile(bs[1].astype(cdt), r)
        w2_c = ws[2].astype(cdt)
        b2_c = bs[2].astype(cdt)
        assert (w * j) % r == 0, "W*J must divide the block factor"

        @jax.checkpoint
        def row_block(v_blk):                                           # (BG, hb, J, d)
            hb = v_blk.shape[1]
            h1 = nn.relu(v_blk[:, :, None, :, :] + u[:, None, :, :, :])
            flat = h1.reshape(bg * hb * w * j // r, r * d)
            h2 = nn.relu(jnp.dot(flat, w1_blk,
                                 preferred_element_type=jnp.float32).astype(cdt)
                         + b1_t)
            h2 = h2.reshape(bg, hb, w, j, d)
            return (jnp.dot(h2.reshape(-1, d), w2_c,
                            preferred_element_type=jnp.float32).astype(cdt)
                    + b2_c).reshape(bg, hb, w, j, o)

        chunk = min(self.row_chunk, h) or h
        if h % chunk == 0 and h // chunk > 1:
            v_chunks = jnp.moveaxis(v.reshape(bg, h // chunk, chunk, j, d), 1, 0)
            bias = jax.lax.map(row_block, v_chunks)
            return jnp.moveaxis(bias, 0, 1).reshape(bg, h * w, j, o)
        return row_block(v.reshape(bg, h, j, d)).reshape(bg, h * w, j, o)


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


class _ConvParams(nn.Module):
    """Registers a Conv-shaped param subtree ({kernel[, bias]}) without computing
    (the sequence-parallel body owns the convs inside shard_map; the checkpoint
    tree stays identical to the single-device ``nn.Conv`` path)."""
    kshape: tuple
    bias_dim: Optional[int] = None

    @nn.compact
    def __call__(self):
        p = {"kernel": self.param("kernel", torch_kernel_init, self.kshape)}
        if self.bias_dim is not None:
            p["bias"] = self.param("bias", nn.initializers.zeros,
                                   (self.bias_dim,))
        return p


class DeformCrossAttention2D(nn.Module):
    """2-D deformable cross-attention: queries from the fused stream (x1), keys/values
    bilinearly sampled from the path stream (x2) at learned offset locations.

    Token API: x1, x2 are (B, N, C) with N a perfect square.

    ``seq_mesh``: a (data, seq) Mesh shards the query-row axis across the 'seq'
    axis (``parallel/seq_deform.py``) — the O(N*J) CPB/attention work splits per
    device; see that module for the communication pattern.
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
    use_pallas: bool = False      # fused bias+softmax kernel on the no-grad path
    pallas_interpret: bool = False
    seq_mesh: Optional[object] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, return_vgrid: bool = False,
                 deterministic: bool = False, mask: Optional[jnp.ndarray] = None):
        b, n, c = x1.shape
        h = w = int(round(n ** 0.5))
        assert h * w == n, f"token count {n} must be a perfect square"
        if (self.seq_mesh is not None
                and dict(self.seq_mesh.shape).get("seq", 1) > 1):
            return self._seq_parallel(x1, x2, return_vgrid, deterministic, mask,
                                      h, w)
        if mask is not None:
            # padded-bag semantics: masked tokens contribute exactly like the zeros
            # padding outside the image (reference grid_sample padding_mode='zeros',
            # ``models/DeformableAttention2D.py:268-271``) — zero both streams up
            # front so offsets, sampled kv, and attention are pad-invariant.
            m = mask[..., None].astype(x1.dtype)
            x1 = x1 * m
            x2 = x2 * m
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

        kv = _grid_sample_2d(_group(img2, g), vgrid_scaled)       # (B*g, Hd, Wd, c/g)
        kv = _ungroup(kv, g)                                      # (B, Hd, Wd, c)

        k = conv1x1(inner_dim, g if self.group_key_values else 1, False, "to_k")(kv)
        v = conv1x1(inner_dim, g if self.group_key_values else 1, False, "to_v")(kv)

        q = q * (self.dim_head ** -0.5)

        def split_heads(t):
            bb = t.shape[0]
            j = t.shape[1] * t.shape[2]
            return t.reshape(bb, j, heads, self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)

        x_axis = 2.0 * jnp.arange(w, dtype=jnp.float32) / max(w - 1, 1) - 1.0
        y_axis = 2.0 * jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1) - 1.0
        grid_kv_scaled = vgrid_scaled.reshape(b * g, hd * wd, 2)
        # Pallas fused CPB (custom-VJP: VMEM-resident activations in BOTH directions)
        # when enabled and one bias head per group; XLA naive+remat otherwise
        cpb_impl = "pallas" if (self.use_pallas and heads == g) else "naive"
        cpb = CPB2D(self.dim // 4, heads=heads, offset_groups=g, impl=cpb_impl,
                    pallas_interpret=self.pallas_interpret, dtype=self.dtype,
                    name="rel_pos_bias")

        out_h = None
        # Fully-fused attention epilogue: sim+softmax(+dropout)+attn@v in a
        # second kernel consuming the CPB kernel's bias directly — the
        # (B, h, N, J) chain never exists in HBM (fwd or bwd).  Always fused in
        # training (the recompute backward is the win: 6.0 -> 2.3 ms/branch at
        # 4k); on the forward-only serving path only when the shape needs no
        # row padding (at N=2500 the pad copies erase the kernel's edge and
        # XLA's fused chain measured faster — bench.py --eval A/B; at N=4096
        # the kernel won both ways).  Interpret mode stays fused for CPU tests.
        if cpb_impl == "pallas":
            from sml_tpu.ops.pallas.deform_attn import (
                deform_attention_trainable, fused_attention_padding)

            j_kv = hd * wd
            dropout_active = (not deterministic) and self.dropout > 0.0
            pad_rows = fused_attention_padding(n, j_kv, self.dim_head,
                                               jnp.dtype(qh.dtype).itemsize,
                                               dropout_active)
            if pad_rows is not None and (not deterministic
                                         or self.pallas_interpret
                                         or pad_rows == 0):
                flatb = cpb.flat_bias(x_axis, y_axis, grid_kv_scaled)
                if flatb is not None:
                    drop_mask, seed, keep = None, None, 1.0
                    if dropout_active:
                        keep = 1.0 - self.dropout
                        rng = self.make_rng("dropout")
                        if self.pallas_interpret:
                            # explicit mask operand: the on-chip PRNG does not
                            # lower in interpret mode (CPU tests)
                            drop_mask = jax.random.bernoulli(
                                rng, keep, (b * g, n, j_kv)).astype(qh.dtype)
                        else:
                            kd = (jax.random.key_data(rng)
                                  if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                                  else rng)
                            seed = jax.lax.bitcast_convert_type(
                                kd.reshape(2), jnp.int32)
                    qf = qh.reshape(b * heads, n, self.dim_head)
                    kf = kh.reshape(b * heads, j_kv, self.dim_head)
                    vf = vh.reshape(b * heads, j_kv, self.dim_head)
                    out_f = deform_attention_trainable(
                        qf, kf, vf, flatb, drop_mask, seed, None, keep,
                        self.pallas_interpret)
                    out_h = out_f.reshape(b, heads, n, self.dim_head)

        if out_h is None:
            sim = jnp.einsum("bhid,bhjd->bhij", qh, kh)           # (B, h, N, J)
            bias = cpb(x_axis, y_axis, grid_kv_scaled, b)
            sim = sim + bias

            sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
            attn = nn.softmax(sim, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out_h = jnp.einsum("bhij,bhjd->bhid", attn, vh)       # (B, h, N, dh)

        out = out_h.transpose(0, 2, 1, 3).reshape(b, h, w, inner_dim)
        out = conv1x1(self.dim, 1, True, "to_out")(out)
        out = out.reshape(b, n, self.dim)

        if return_vgrid:
            vgrid_out = vgrid.reshape(b, g, hd, wd, 2)
            return out, vgrid_out
        return out

    def _seq_parallel(self, x1, x2, return_vgrid, deterministic, mask, h, w):
        """Query-row-sharded forward over the mesh's 'seq' axis.  Params are
        declared through mirrors so the tree matches the single-device path
        (checkpoints are interchangeable)."""
        from sml_tpu.parallel.seq_deform import run_seq_parallel_deform2d

        _, _, c = x1.shape
        g = self.offset_groups
        inner = self.dim_head * self.heads
        od = inner // g
        gq = g if self.group_queries else 1
        gkv = g if self.group_key_values else 1
        ks = self.offset_kernel_size
        params = {
            "to_q": _ConvParams((1, 1, c // gq, inner), name="to_q")(),
            "offset_conv": _ConvParams((ks, ks, 1, od), od,
                                       name="offset_conv")(),
            "offset_proj": _ConvParams((1, 1, od, 2), name="offset_proj")(),
            "to_k": _ConvParams((1, 1, c // gkv, inner), name="to_k")(),
            "to_v": _ConvParams((1, 1, c // gkv, inner), name="to_v")(),
            "to_out": _ConvParams((1, 1, inner, self.dim), self.dim,
                                  name="to_out")(),
            "rel_pos_bias": CPB2D(self.dim // 4, heads=self.heads,
                                  offset_groups=g, impl="naive",
                                  query_chunk=self.cpb_query_chunk,
                                  dtype=self.dtype, name="rel_pos_bias").raw(),
        }
        rng = None
        if not deterministic and self.dropout > 0.0:
            rng = self.make_rng("dropout")

        out, vgrid = run_seq_parallel_deform2d(
            self.seq_mesh, params, x1, x2, mask, rng,
            dim=self.dim, dim_head=self.dim_head, heads=self.heads,
            offset_groups=g, downsample_factor=self.downsample_factor,
            offset_scale=self.offset_scale, offset_kernel_size=ks,
            group_queries=self.group_queries,
            group_key_values=self.group_key_values,
            cpb_query_chunk=self.cpb_query_chunk, dropout=self.dropout,
            h=h, w=w, use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret, dtype=self.dtype)
        if return_vgrid:
            return out, vgrid
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
    use_pallas: bool = False      # fused sim+softmax(+dropout)+attn@v epilogue
    pallas_interpret: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, return_vgrid: bool = False,
                 deterministic: bool = False, mask: Optional[jnp.ndarray] = None):
        b, n, c = x1.shape
        if mask is not None:  # same zeros-padding semantics as the 2-D variant
            m = mask[..., None].astype(x1.dtype)
            x1 = x1 * m
            x2 = x2 * m
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

        # fused epilogue (same kernel pair as the 2-D path): the sampled-point
        # axis must satisfy the kernel's %8 sublane rule, so pad vgrid with
        # dummy points BEFORE sampling (extra ~1% bias/kv compute, NO big
        # pad-copies); the col span excludes them exactly.  Serving keeps the
        # 2-D routing rule: fused in training / interpret / zero-row-pad.
        ndp = -(-nd // 8) * 8
        dropout_active = (not deterministic) and self.dropout > 0.0
        use_fused = False
        if self.use_pallas:
            from sml_tpu.ops.pallas.deform_attn import (
                deform_attention_trainable, fused_attention_padding)
            pad_rows = fused_attention_padding(
                n, ndp, self.dim_head, jnp.dtype(q.dtype).itemsize,
                has_mask=dropout_active and self.pallas_interpret,
                has_bias=True, has_span=True)
            use_fused = pad_rows is not None and (not deterministic
                                                  or self.pallas_interpret
                                                  or pad_rows == 0)
        vg_samp = vgrid_scaled if (not use_fused or ndp == nd) else \
            jnp.pad(vgrid_scaled, ((0, 0), (0, ndp - nd)))

        kv = grid_sample_1d(_group(x2, g), vg_samp)               # (B*g, J, c/g)
        kv = _ungroup(kv, g)                                      # (B, J, c)

        k = conv1(inner_dim, g if self.group_key_values else 1, False, "to_k")(kv)
        v = conv1(inner_dim, g if self.group_key_values else 1, False, "to_v")(kv)

        q = q * (self.dim_head ** -0.5)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)

        seq_scaled = 2.0 * jnp.arange(n, dtype=qh.dtype) / max(n - 1, 1) - 1.0
        bias = CPB1D(self.dim // 4, heads=heads, offset_groups=g,
                     log_distance=self.cpb_log_distance,
                     query_chunk=self.cpb_query_chunk,
                     name="rel_pos_bias")(seq_scaled, vg_samp, b)  # (B, h, N, J)

        if use_fused:
            jj = kh.shape[2]
            bg = b * heads
            drop_mask, seed, keep = None, None, 1.0
            if dropout_active:
                keep = 1.0 - self.dropout
                rng = self.make_rng("dropout")
                if self.pallas_interpret:
                    # explicit mask operand: the on-chip PRNG does not lower
                    # in interpret mode (CPU tests)
                    drop_mask = jax.random.bernoulli(
                        rng, keep, (bg, n, jj)).astype(qh.dtype)
                else:
                    kd = (jax.random.key_data(rng)
                          if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
                          else rng)
                    seed = jax.lax.bitcast_convert_type(kd.reshape(2),
                                                        jnp.int32)
            span = jnp.broadcast_to(jnp.asarray([0, n, 0, nd], jnp.int32),
                                    (bg, 4))
            out_h = deform_attention_trainable(
                qh.reshape(bg, n, self.dim_head),
                kh.reshape(bg, jj, self.dim_head),
                vh.reshape(bg, jj, self.dim_head),
                bias.reshape(bg, n, jj).astype(jnp.float32),
                drop_mask, seed, span, keep,
                self.pallas_interpret).reshape(b, heads, n, self.dim_head)
        else:
            sim = jnp.einsum("bhid,bhjd->bhij", qh, kh)           # (B, h, N, Nd)
            sim = sim + bias
            sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
            attn = nn.softmax(sim, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out_h = jnp.einsum("bhij,bhjd->bhid", attn, vh)

        out = out_h.transpose(0, 2, 1, 3).reshape(b, n, inner_dim)
        out = conv1(self.dim, 1, True, "to_out")(out)

        if return_vgrid:
            return out, vgrid.reshape(b, g, nd)
        return out
