"""Sequence-parallel masked Nystrom attention over a mesh axis.

A beyond-the-reference scaling capability (SURVEY.md §5 "long-context" row): the
reference caps bags at a fixed size by construction; here a bag's PATCH axis can be
sharded across devices (`P(data, seq)`) for bags too large for one chip's HBM.

The Nystrom decomposition makes this cheap (this is why it was chosen over exact
attention for sequence parallelism):

* landmarks are segment means over contiguous token blocks — each device computes its
  local landmark sums/counts; nothing crosses devices because landmark segments are
  aligned to the shard boundaries (seg = local_n / (m / n_dev));
* the landmark kernel attn2 (m x m) needs ALL landmarks: one small `all_gather` of
  the (m_local, d) landmark blocks (m=dim/2=128 rows — KBs, not the N-token sequence);
* attn1 = softmax(q_local @ k_landmarks_all^T) is local given gathered landmarks;
* attn3 @ v reduces over the TOKEN axis -> computed locally on each shard and
  `psum` over the seq axis (a (m, d) matrix — again KBs);
* the depthwise residual conv over the sequence axis is computed shard-locally with a
  halo exchange of kernel//2 tokens from the neighbours (`ppermute`).

Numerics match the single-device mask-aware NystromAttention exactly for shard counts
that divide the landmark count (tests/test_seq_parallel.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = -3.4028234663852886e38


def _chain1_fusable(n_local: int, m: int, dh: int, dtype,
                    has_span: bool) -> bool:
    """chain 1 (local token rows over the full landmark lane axis) has a legal
    fused tiling AND is big enough per shard to beat kernel dispatch (same
    4x rule as the single-device gate)."""
    from sml_tpu.ops.pallas.deform_attn import fused_attention_supported
    if n_local % 8 or m % 8 or n_local < 4 * m:
        return False
    return fused_attention_supported(n_local, m, dh, jnp.dtype(dtype).itemsize,
                                     has_mask=False, has_bias=False,
                                     has_span=has_span)


def seq_parallel_nystrom_attention(params: dict, x: jnp.ndarray,
                                   mask: Optional[jnp.ndarray],
                                   *, dim: int, dim_head: int, heads: int,
                                   num_landmarks: int, pinv_iterations: int = 6,
                                   residual: bool = True,
                                   residual_conv_kernel: int = 33,
                                   eps: float = 1e-8,
                                   axis_name: str = "seq",
                                   n_dev: int = None,
                                   use_pallas: bool = False,
                                   pallas_interpret: bool = False) -> jnp.ndarray:
    """Inside-shard_map body: x (b, n_local, dim) is this device's token shard.

    ``params``: the plain-param tree of :class:`sml_tpu.ops.nystrom.NystromAttention`
    ({'to_qkv': {'kernel'}, 'res_conv_kernel', 'to_out': {'kernel','bias'}}).
    Total sequence length (n_local * n_dev) must be divisible by num_landmarks, and
    num_landmarks by n_dev.  Returns this device's output shard.
    """
    if n_dev is None:
        n_dev = lax.psum(1, axis_name)  # only valid when perm lists aren't needed
    b, n_local, _ = x.shape
    h, m = heads, num_landmarks
    assert m % n_dev == 0, "landmark count must divide across the seq axis"
    m_local = m // n_dev
    seg = n_local // m_local
    inner = h * dim_head

    qkv = x @ params["to_qkv"]["kernel"]
    q, k, v_flat = jnp.split(qkv, 3, axis=-1)
    if mask is not None:
        v_flat = v_flat * mask[:, :, None].astype(v_flat.dtype)

    def split_heads(t):
        return t.reshape(b, n_local, h, dim_head).transpose(0, 2, 1, 3)

    q, k, v = split_heads(q), split_heads(k), split_heads(v_flat)
    if mask is not None:
        m_ = mask[:, None, :, None].astype(q.dtype)
        q, k = q * m_, k * m_
    q = q * (dim_head ** -0.5)

    # local landmark sums over aligned segments
    q_l = q.reshape(b, h, m_local, seg, dim_head).sum(axis=3)
    k_l = k.reshape(b, h, m_local, seg, dim_head).sum(axis=3)
    if mask is not None:
        lm_sum = mask.reshape(b, m_local, seg).sum(axis=-1)
        divisor = lm_sum[:, None, :, None].astype(q.dtype) + eps
        lm_mask_local = lm_sum > 0
    else:
        divisor = jnp.asarray(seg, q.dtype)
        lm_mask_local = jnp.ones((b, m_local), bool)
    q_l = q_l / divisor
    k_l = k_l / divisor

    # gather ALL landmarks (tiny: m x dim_head per head)
    q_l_all = lax.all_gather(q_l, axis_name, axis=2, tiled=True)   # (b, h, m, d)
    k_l_all = lax.all_gather(k_l, axis_name, axis=2, tiled=True)
    lm_mask = lax.all_gather(lm_mask_local, axis_name, axis=1, tiled=True)  # (b, m)

    sim2 = jnp.einsum("bhid,bhjd->bhij", q_l_all, k_l_all)         # (b,h,m,m)
    sim3 = jnp.einsum("bhid,bhjd->bhij", q_l_all, k)               # (b,h,m,nl)

    if mask is not None:
        ml = lm_mask[:, None, :, None]
        mlT = lm_mask[:, None, None, :]
        mkT = mask[:, None, None, :]
        sim2 = jnp.where(ml & mlT, sim2, _NEG_INF)
        sim3 = jnp.where(ml & mkT, sim3, _NEG_INF)

    attn2 = jax.nn.softmax(sim2, axis=-1)
    # attn3's softmax normalizes over the FULL token axis: shard-local exp sums psum'd
    sim3_max = lax.pmax(lax.stop_gradient(sim3.max(axis=-1, keepdims=True)),
                        axis_name)
    e3 = jnp.exp(sim3 - sim3_max)
    denom3 = lax.psum(e3.sum(axis=-1, keepdims=True), axis_name)
    attn3 = e3 / denom3

    from sml_tpu.ops.linear_algebra import moore_penrose_pinv

    attn2_inv = moore_penrose_pinv(attn2, pinv_iterations)

    # (attn3 @ v) reduces over local tokens -> psum the (m, d) result
    a3v = lax.psum(attn3 @ v, axis_name)                           # (b, h, m, d)

    if use_pallas and _chain1_fusable(n_local, m, dim_head, q.dtype,
                                      mask is not None):
        # chain 1 is shard-local given the gathered landmarks: fuse its
        # softmax through the bias-less kernel pair so the (b, h, nl, m)
        # probability tensor never exists in HBM (same association change as
        # the single-device fused path: attn1 @ (pinv @ a3v)).  chain 3 stays
        # XLA — its softmax denominator psums across shards, which the
        # self-contained kernel cannot express.
        from sml_tpu.ops.pallas.deform_attn import deform_attention_trainable
        bg = b * h
        span1 = None
        if mask is not None:
            # global token/landmark validity intervals from the local interval
            # masks (production masks are intervals; see ops/nystrom.py):
            # shards with no valid token contribute neutral extremes
            off = lax.axis_index(axis_name) * n_local
            any_l = jnp.any(mask, axis=1)                          # (b,)
            first_l = jnp.argmax(mask, axis=1).astype(jnp.int32)
            nval_l = jnp.sum(mask, axis=1).astype(jnp.int32)
            big = jnp.int32(2 ** 30)
            tok_start = lax.pmin(jnp.where(any_l, off + first_l, big),
                                 axis_name)
            tok_end = lax.pmax(
                jnp.where(any_l, off + first_l + nval_l, jnp.int32(-1)),
                axis_name)
            lm_start = tok_start // seg
            lm_end = -(-tok_end // seg)
            # rows are LOCAL token coords: clip the global interval to this
            # shard; cols are the full (gathered) landmark axis
            rs = jnp.clip(tok_start - off, 0, n_local)
            re_ = jnp.clip(tok_end - off, 0, n_local)
            span1 = jnp.repeat(jnp.stack([rs, re_, lm_start, lm_end], 1),
                               h, axis=0)                          # (b*h, 4)
        z = attn2_inv @ a3v.astype(attn2_inv.dtype)                # (b, h, m, d)
        out = deform_attention_trainable(
            q.reshape(bg, n_local, dim_head),
            k_l_all.reshape(bg, m, dim_head),
            z.reshape(bg, m, dim_head).astype(q.dtype),
            None, None, None, span1, 1.0, pallas_interpret)
        out = out.reshape(b, h, n_local, dim_head)
    else:
        sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l_all)           # (b,h,nl,m)
        if mask is not None:
            mq = mask[:, None, :, None]
            sim1 = jnp.where(mq & mlT, sim1, _NEG_INF)
        attn1 = jax.nn.softmax(sim1, axis=-1)
        out = (attn1 @ attn2_inv) @ a3v                            # (b, h, nl, d)
    out = out.transpose(0, 2, 1, 3).reshape(b, n_local, inner)

    if residual:
        # shard-local depthwise conv with halo exchange of kernel//2 tokens
        pad = residual_conv_kernel // 2
        assert n_local >= pad, (
            f"shard length {n_local} must cover the conv halo {pad} "
            f"(use fewer seq shards or longer sequences)")
        idx = lax.axis_index(axis_name)
        left = lax.ppermute(v_flat[:, -pad:], axis_name,
                            [(i, (i + 1) % n_dev) for i in range(n_dev)])
        right = lax.ppermute(v_flat[:, :pad], axis_name,
                             [(i, (i - 1) % n_dev) for i in range(n_dev)])
        left = jnp.where(idx > 0, left, 0.0)           # zero-pad at sequence edges
        right = jnp.where(idx < n_dev - 1, right, 0.0)
        v_halo = jnp.concatenate([left, v_flat, right], axis=1)

        kernel = params["res_conv_kernel"]
        expanded = jnp.repeat(kernel, dim_head, axis=1)
        res = lax.conv_general_dilated(
            v_halo.astype(out.dtype), expanded[:, None, :].astype(out.dtype),
            window_strides=(1,), padding=[(0, 0)], feature_group_count=inner,
            dimension_numbers=("NHC", "HIO", "NHC"))
        out = out + res

    out = out @ params["to_out"]["kernel"] + params["to_out"]["bias"]
    return out


def run_seq_parallel_nystrom(mesh: Mesh, params: dict, x: jnp.ndarray,
                             mask: Optional[jnp.ndarray], **kwargs) -> jnp.ndarray:
    """Convenience wrapper: shard x (b, N, dim) over mesh axis 'seq' and run.

    Params are passed as explicit replicated shard_map inputs (not closure
    captures) so this composes inside a jitted train step's grad trace.  On a
    2-D (data, seq) mesh the batch axis is co-sharded over 'data', so the same
    body serves combined data+sequence parallelism (the 'data' axis is a plain
    outer batch dim inside the body — collectives name only 'seq').
    """
    from jax import shard_map

    axis = kwargs.pop("axis_name", "seq")
    # mask=None must keep UNMASKED semantics (zero-padded tokens participate in the
    # softmaxes and landmark means exactly as in the single-device module) — the
    # all-ones array below is only a shard_map input carrier
    use_mask = mask is not None
    if mask is None:
        mask = jnp.ones(x.shape[:2], bool)

    n_dev = mesh.shape[axis]
    # co-shard the batch over the mesh's OTHER axis (whatever the user named it —
    # config.data_axis need not be the literal 'data'); 1-D seq-only meshes have
    # none and replicate the batch
    batch_axis = kwargs.pop("batch_axis", None)
    if batch_axis is None:
        batch_axis = next((a for a in mesh.axis_names if a != axis), None)
    b_ax = batch_axis if batch_axis in mesh.shape else None

    def body(p, x_l, mask_l):
        return seq_parallel_nystrom_attention(p, x_l, mask_l if use_mask else None,
                                              axis_name=axis, n_dev=n_dev, **kwargs)

    param_specs = jax.tree_util.tree_map(lambda _: P(), params)
    in_specs = (param_specs, P(b_ax, axis, None), P(b_ax, axis))
    # check_vma=False: pallas_call out_shapes carry no vma annotation, which
    # the checker rejects inside shard_map (same workaround as seq_deform.py)
    return shard_map(body, mesh=mesh, in_specs=in_specs,
                     out_specs=P(b_ax, axis, None),
                     check_vma=False)(params, x, mask)
