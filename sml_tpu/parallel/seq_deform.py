"""Sequence-parallel 2-D deformable cross-attention over a mesh axis.

Extends the long-context capability (SURVEY §5; VERDICT r2 item 6) to the FLAGSHIP
model: the query-token axis of :class:`sml_tpu.ops.deformable.DeformCrossAttention2D`
is sharded across devices as contiguous query-grid ROW blocks, so the O(N*J) CPB
pair work and attention memory — the model's dominant cost — split across the seq
axis.  Communication pattern (all small relative to the sharded compute):

* the offset conv (stride ``downsample_factor``, kernel 6, pad 1) needs ONE query
  row of halo from each neighbour shard (``ppermute``), after which every shard
  computes exactly its own kv-rows' offsets;
* ``grid_sample`` may read the kv source anywhere, so the (B, N, C) path stream is
  ``all_gather``-ed once (C=dim is the model's smallest activation width);
* each shard samples + projects its OWN kv rows, then k / v / sampled-grid rows are
  all_gathered (J = N/16 points — KBs);
* CPB bias is separable in the query row: each shard evaluates the MLP only for its
  local rows (``y_coords`` slice) — this is the expensive tensor and it never
  materializes globally;
* softmax / attn@v / the 1x1 output conv are row-local.  No psum needed.

The body re-applies the module's own submodules (``nn.Conv.apply`` / ``CPB2D.apply``)
on explicit param subtrees, so numerics are the single-device code paths verbatim
(tests/test_seq_deform.py proves equality to the unsharded module).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def seq_parallel_deform_attn_2d(params: dict, x1_l: jnp.ndarray,
                                x2_l: jnp.ndarray, mask_l,
                                rng: Optional[jax.Array],
                                *, dim: int, dim_head: int, heads: int,
                                offset_groups: int, downsample_factor: int,
                                offset_scale: float, offset_kernel_size: int,
                                group_queries: bool, group_key_values: bool,
                                cpb_query_chunk: int, dropout: float,
                                h: int, w: int, use_mask: bool,
                                axis_name: str = "seq", n_dev: int = 1,
                                use_pallas: bool = False,
                                pallas_interpret: bool = False,
                                dtype=None):
    """Inside-shard_map body: x1_l/x2_l (b, n_local, c) are this device's
    contiguous row shards of the (h, w) query grid (n_local = (h/n_dev) * w)."""
    from sml_tpu.ops.deformable import (CPB2D, _group, _ungroup, make_grid_2d,
                                        normalize_grid_2d)
    # same resample formulation as the single-device module (gated matmul form)
    from sml_tpu.ops.deformable import _grid_sample_2d as grid_sample_2d

    b, n_l, c = x1_l.shape
    h_l = h // n_dev
    assert n_l == h_l * w
    g = offset_groups
    inner = heads * dim_head
    offset_dims = inner // g
    df = downsample_factor
    assert h_l % df == 0, "per-shard rows must cover whole kv rows"
    idx = lax.axis_index(axis_name)

    if use_mask:
        m = mask_l[..., None].astype(x1_l.dtype)
        x1_l = x1_l * m
        x2_l = x2_l * m

    img1 = x1_l.reshape(b, h_l, w, c)

    def conv1x1(p, feat, groups, bias):
        return lambda t: nn.Conv(
            features=feat, kernel_size=(1, 1), feature_group_count=groups,
            use_bias=bias, dtype=dtype).apply({"params": p}, t)

    q = conv1x1(params["to_q"], inner,
                g if group_queries else 1, False)(img1)    # (b, h_l, w, inner)
    grouped_q = _group(q, g)                               # (b*g, h_l, w, dg)

    # ---- offset conv with a 1-query-row halo exchange ----
    pad = (offset_kernel_size - df) // 2
    assert pad <= h_l, "shard must cover the offset-conv halo"
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    top = lax.ppermute(grouped_q[:, -pad:], axis_name, fwd)
    bot = lax.ppermute(grouped_q[:, :pad], axis_name, bwd)
    top = jnp.where(idx > 0, top, 0.0)        # zero-pad at the global edges
    bot = jnp.where(idx < n_dev - 1, bot, 0.0)
    gq_halo = jnp.concatenate([top, grouped_q, bot], axis=1)

    off = nn.Conv(features=offset_dims,
                  kernel_size=(offset_kernel_size,) * 2, strides=(df,) * 2,
                  padding=((0, 0), (pad, pad)),        # H handled by the halo
                  feature_group_count=offset_dims, dtype=dtype,
                  use_bias=True).apply({"params": params["offset_conv"]}, gq_halo)
    off = nn.gelu(off, approximate=False)
    off = conv1x1(params["offset_proj"], 2, 1, False)(off)
    offsets = jnp.tanh(off) * offset_scale                 # (b*g, hd_l, wd, 2)

    hd, wd = h // df, w // df
    hd_l = h_l // df
    grid_rows = lax.dynamic_slice_in_dim(
        make_grid_2d(hd, wd, offsets.dtype), idx * hd_l, hd_l, axis=0)
    vgrid_l = grid_rows[None] + offsets                    # (b*g, hd_l, wd, 2)
    vgrid_scaled_l = normalize_grid_2d(vgrid_l, hd, wd)    # GLOBAL grid dims

    # ---- kv: sample this shard's kv rows from the gathered path stream ----
    x2_full = lax.all_gather(x2_l, axis_name, axis=1, tiled=True)  # (b, n, c)
    img2 = x2_full.reshape(b, h, w, c)
    kv_l = grid_sample_2d(_group(img2, g), vgrid_scaled_l)  # (b*g, hd_l, wd, c/g)
    kv_l = _ungroup(kv_l, g)                                # (b, hd_l, wd, c)
    gkv = g if group_key_values else 1
    k_l = conv1x1(params["to_k"], inner, gkv, False)(kv_l)
    v_l = conv1x1(params["to_v"], inner, gkv, False)(kv_l)

    # every query attends to ALL kv points: gather the (small) kv products
    k_full = lax.all_gather(k_l, axis_name, axis=1, tiled=True)   # (b, hd, wd, .)
    v_full = lax.all_gather(v_l, axis_name, axis=1, tiled=True)
    grid_kv = lax.all_gather(vgrid_scaled_l, axis_name, axis=1,
                             tiled=True).reshape(b * g, hd * wd, 2)

    q = q * (dim_head ** -0.5)

    def split_heads(t):
        bb = t.shape[0]
        j = t.shape[1] * t.shape[2]
        return t.reshape(bb, j, heads, dim_head).transpose(0, 2, 1, 3)

    qh = split_heads(q)                                    # (b, heads, n_l, dh)
    kh, vh = split_heads(k_full), split_heads(v_full)      # (b, heads, J, dh)

    x_axis = 2.0 * jnp.arange(w, dtype=jnp.float32) / max(w - 1, 1) - 1.0
    y_full = 2.0 * jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1) - 1.0
    y_local = lax.dynamic_slice_in_dim(y_full, idx * h_l, h_l, axis=0)

    # CPB for LOCAL query rows only — the separable tables take any y slice
    cpb_impl = "pallas" if (use_pallas and heads == g) else "naive"
    cpb = CPB2D(dim // 4, heads=heads, offset_groups=g, impl=cpb_impl,
                query_chunk=cpb_query_chunk, dtype=dtype,
                pallas_interpret=pallas_interpret)

    out_l = None
    if cpb_impl == "pallas":
        # per-shard Pallas kernels: the CPB bias and the fused attention
        # epilogue run on the LOCAL row block (same gates as the
        # single-device module; shapes shrink with the shard)
        from sml_tpu.ops.pallas.deform_attn import (deform_attention_trainable,
                                                    fused_attention_padding)

        j_kv = hd * wd
        dropout_active = dropout > 0.0 and rng is not None
        pad_rows = fused_attention_padding(n_l, j_kv, dim_head,
                                           jnp.dtype(qh.dtype).itemsize,
                                           dropout_active)
        # same routing rule as the single-device module: train path always
        # fuses; the forward-only serving path (rng is None) fuses only when
        # the local row block needs no zero padding (measured: pad copies lose
        # to XLA's fused forward chain — bench.py --eval A/B)
        if pad_rows is not None and (rng is not None or pallas_interpret
                                     or pad_rows == 0):
            flatb = cpb.apply({"params": params["rel_pos_bias"]},
                              x_axis, y_local, grid_kv,
                              method=CPB2D.flat_bias)    # (b*g, n_l, J) | None
            if flatb is not None:
                drop_mask = seed = None
                keep = 1.0
                if dropout_active:
                    keep = 1.0 - dropout
                    r_l = jax.random.fold_in(rng, idx)
                    if pallas_interpret:
                        drop_mask = jax.random.bernoulli(
                            r_l, keep, (b * g, n_l, j_kv)).astype(qh.dtype)
                    else:
                        kd = (jax.random.key_data(r_l)
                              if jnp.issubdtype(r_l.dtype, jax.dtypes.prng_key)
                              else r_l)
                        seed = lax.bitcast_convert_type(kd.reshape(2),
                                                        jnp.int32)
                qf = qh.reshape(b * heads, n_l, dim_head)
                kf = kh.reshape(b * heads, j_kv, dim_head)
                vf = vh.reshape(b * heads, j_kv, dim_head)
                out_f = deform_attention_trainable(qf, kf, vf, flatb,
                                                   drop_mask, seed, None,
                                                   keep, pallas_interpret)
                out_l = out_f.reshape(b, heads, n_l, dim_head)

    if out_l is None:
        bias = cpb.apply({"params": params["rel_pos_bias"]},
                         x_axis, y_local, grid_kv, b)      # (b, heads, n_l, J)
        sim = jnp.einsum("bhid,bhjd->bhij", qh, kh) + bias
        sim = sim - lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = nn.softmax(sim, axis=-1)
        if dropout > 0.0 and rng is not None:
            # per-shard stream (folded by shard index): valid dropout, not
            # bit-identical to the single-device stream
            keep = jax.random.bernoulli(jax.random.fold_in(rng, idx),
                                        1.0 - dropout, attn.shape)
            attn = jnp.where(keep, attn / (1.0 - dropout), 0.0)
        out_l = jnp.einsum("bhij,bhjd->bhid", attn, vh)    # (b, heads, n_l, dh)

    out = out_l.transpose(0, 2, 1, 3).reshape(b, h_l, w, inner)
    out = conv1x1(params["to_out"], dim, 1, True)(out)
    return out.reshape(b, n_l, dim), vgrid_l.reshape(b, g, hd_l, wd, 2)


def run_seq_parallel_deform2d(mesh: Mesh, params: dict, x1: jnp.ndarray,
                              x2: jnp.ndarray, mask, rng, **kwargs):
    """Shard x1/x2 (b, N, c) over mesh axis 'seq' (contiguous query-row blocks)
    and run the sharded attention.  Returns (out (b, N, dim),
    vgrid (b, g, Hd, Wd, 2)) as global arrays."""
    from jax import shard_map

    axis = kwargs.pop("axis_name", "seq")
    n_dev = mesh.shape[axis]
    batch_axis = kwargs.pop("batch_axis", None)
    if batch_axis is None:
        batch_axis = next((a for a in mesh.axis_names if a != axis), None)
    b_ax = batch_axis if batch_axis in mesh.shape else None
    if b_ax is not None and x1.shape[0] % mesh.shape[b_ax]:
        b_ax = None                    # batch undivisible: replicate it instead

    use_mask = mask is not None
    if mask is None:
        mask = jnp.ones(x1.shape[:2], bool)
    if rng is None:
        rng = jax.random.PRNGKey(0)
        kwargs = dict(kwargs, dropout=0.0)

    def body(p, x1_l, x2_l, mask_l, r):
        return seq_parallel_deform_attn_2d(
            p, x1_l, x2_l, mask_l, r, use_mask=use_mask, axis_name=axis,
            n_dev=n_dev, **kwargs)

    param_specs = jax.tree_util.tree_map(lambda _: P(), params)
    in_specs = (param_specs, P(b_ax, axis, None), P(b_ax, axis, None),
                P(b_ax, axis), P())
    out_specs = (P(b_ax, axis, None), P(b_ax, None, axis, None, None))
    # check_vma=False: pallas_call out_shapes carry no vma annotation, which
    # the lint rejects inside shard_map (the body's collectives are explicit)
    return shard_map(body, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs,
                     check_vma=False)(params, x1, x2, mask, rng)
