"""Mask-aware Nystrom (linear-complexity) self-attention.

Single implementation replacing the reference's three copies (vendored
``models/NystromAttention.py:39-157``, ``models/cmta_utils.py:147-351``, and the
``nystrom_attention`` pip package used by TransMIL).  Algorithm: m landmark queries/keys
from segment means, three softmax kernels, Newton-Schulz pseudo-inverse of the landmark
kernel, plus a depthwise-conv residual over values.

TPU notes: the whole computation is O(N*m) matmuls that XLA maps onto the MXU; the
pinv iteration runs in float32.  Mask support makes padded/bucketed bags exact, which is
what lets us compile one program per bag-size bucket instead of per bag.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import jax
from flax import linen as nn
from jax import lax

from sml_tpu.ops.common import DenseParams, torch_kernel_init
from sml_tpu.ops.linear_algebra import moore_penrose_pinv

_NEG_INF = -3.4028234663852886e38  # -finfo(f32).max, matching torch's mask fill value


def _fused_chains_supported(n_pad: int, m: int, dh: int, dtype,
                            has_span: bool = False) -> bool:
    """Both Nystrom chains have a legal fused-kernel tiling: chain 3
    (m query rows over n_pad key lanes) and chain 1 (n_pad rows over m lanes).
    Lane dims must be Mosaic-legal when they are a BLOCK of a larger array —
    here each chain's lane dim equals its array dim, so only VMEM capacity and
    the %8 sublane rule on the k/v blocks bind."""
    from sml_tpu.ops.pallas.deform_attn import fused_attention_supported
    usize = jnp.dtype(dtype).itemsize
    if n_pad % 8 or m % 8:
        return False
    if n_pad < 4 * m:
        # short sequences (e.g. the ~5-token genomics stream): the chains are
        # KB-sized, XLA fuses them fine, kernel dispatch would dominate
        return False
    if dh * usize < 128:
        # dh is the kernel's LANE dim for q/k/v blocks; below one 128-byte
        # lane tile Mosaic pads it out (dh=32 bf16 wastes 4x VPU/VMEM) and
        # the fused chains measured SLOWER than XLA's fused softmax chain
        # (cmta dh=32: 4.31 vs 3.10 ms/TransLayer, step 21.7 vs 21.1 ms;
        # transmil dh=64 keeps the win: 17.6 vs 19.9 ms step — r4 profile,
        # scripts/profile_nystrom.py)
        return False
    return (fused_attention_supported(m, n_pad, dh, usize, has_mask=False,
                                      has_bias=False, has_span=has_span)
            and fused_attention_supported(n_pad, m, dh, usize, has_mask=False,
                                          has_bias=False, has_span=has_span))


# shared with ops.fusion: keeps the checkpoint tree identical to nn.Dense while
# the caller owns the matmul (here: inside shard_map)
_DenseParams = DenseParams


class NystromAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    residual: bool = True
    residual_conv_kernel: int = 33
    eps: float = 1e-8
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    seq_mesh: Optional[object] = None     # (data, seq) Mesh: shard the token axis
    use_pallas: bool = False              # fuse the two N-sized softmax chains
    pallas_masked: bool = True            # ...masked calls too (interval masks
    #   only — True for every in-repo caller: bucketed bags are suffix-padded
    #   and this module front-pads.  Arbitrary masks need False.)
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = False, return_attn: bool = False):
        b, n, _ = x.shape
        h, m = self.heads, self.num_landmarks
        inner_dim = h * self.dim_head

        if self.seq_mesh is not None and self.seq_mesh.shape.get("seq", 1) > 1:
            assert not return_attn, "return_attn unsupported under seq parallelism"
            return self._seq_parallel(x, mask, deterministic)

        # pad (at the FRONT, like the reference) so n divides into m landmark segments
        remainder = n % m
        padding = (m - remainder) if remainder > 0 else 0
        if padding:
            x = jnp.pad(x, ((0, 0), (padding, 0), (0, 0)))
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (padding, 0)), constant_values=False)
        n_pad = n + padding
        seg = n_pad // m  # segment length per landmark

        qkv = nn.Dense(inner_dim * 3, use_bias=False, kernel_init=torch_kernel_init,
                       dtype=self.dtype, name="to_qkv")(x)
        q, k, v_flat = jnp.split(qkv, 3, axis=-1)

        if mask is not None:
            v_flat = v_flat * mask[:, :, None].astype(v_flat.dtype)

        def split_heads(t):
            return t.reshape(b, n_pad, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v_flat)

        if mask is not None:
            m_ = mask[:, None, :, None].astype(q.dtype)  # (b, 1, n, 1)
            q, k = q * m_, k * m_

        q = q * (self.dim_head ** -0.5)

        # landmarks: means over contiguous segments (masked mean when mask given)
        q_l = q.reshape(b, h, m, seg, self.dim_head).sum(axis=3)
        k_l = k.reshape(b, h, m, seg, self.dim_head).sum(axis=3)

        if mask is not None:
            lm_sum = mask.reshape(b, m, seg).sum(axis=-1)            # (b, m)
            divisor = lm_sum[:, None, :, None].astype(q.dtype) + self.eps
            mask_landmarks = lm_sum > 0                               # (b, m)
        else:
            divisor = jnp.asarray(seg, q.dtype)

        q_l = q_l / divisor
        k_l = k_l / divisor

        sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)  # (b, h, m, m)
        if mask is not None:
            ml = mask_landmarks[:, None, :, None]        # (b,1,m,1)
            mlT = mask_landmarks[:, None, None, :]       # (b,1,1,m)
            sim2 = jnp.where(ml & mlT, sim2, _NEG_INF)
        attn2 = nn.softmax(sim2, axis=-1)
        attn2_inv = moore_penrose_pinv(attn2, self.pinv_iterations)

        if (self.use_pallas and not return_attn
                and (mask is None or self.pallas_masked)
                and _fused_chains_supported(n_pad, m, self.dim_head, q.dtype,
                                            has_span=mask is not None)):
            # fuse the two N-sized softmax chains (attn1, attn3) in VMEM: the
            # (b, h, n, m) probability tensors and the (n, m) @ (m, m) f32
            # product never exist in HBM in either direction.  Association is
            # attn1 @ (pinv @ (attn3 @ v)) — same math as the module's
            # (attn1 @ pinv) @ (attn3 @ v), fewer N-sized matmuls.
            from sml_tpu.ops.pallas.deform_attn import deform_attention_trainable
            bg, dh = b * h, self.dim_head
            span1 = span3 = None
            if mask is not None:
                # masked bags keep the fused kernels: production masks are
                # INTERVALS (bucketing pads the suffix — data/bucketing.py:39
                # — and this module pads the front), so the kernel-side
                # where(row & col, sim, -f32max) is two scalars per bag riding
                # SMEM (``span``).  tok interval -> landmark interval: segment
                # r = [r*seg, (r+1)*seg) holds a valid token iff it intersects
                # [tok_start, tok_end), which for intervals is exactly the
                # XLA path's ``lm_sum > 0``.  (Non-interval masks need
                # ``pallas_masked=False``.)
                tok_start = jnp.argmax(mask, axis=1).astype(jnp.int32)  # (b,)
                n_valid = jnp.sum(mask, axis=1).astype(jnp.int32)
                tok_end = tok_start + n_valid
                lm_start = tok_start // seg
                lm_end = -(-tok_end // seg)                    # ceil division
                span3 = jnp.stack([lm_start, lm_end, tok_start, tok_end], 1)
                span1 = jnp.stack([tok_start, tok_end, lm_start, lm_end], 1)
                # (b, 4) -> (b*h, 4): head index is minor in the bg reshape
                span3 = jnp.repeat(span3, h, axis=0)
                span1 = jnp.repeat(span1, h, axis=0)
            x3 = deform_attention_trainable(                 # softmax(q_l k^T) v
                q_l.reshape(bg, m, dh), k.reshape(bg, n_pad, dh),
                v.reshape(bg, n_pad, dh), None, None, None, span3, 1.0,
                self.pallas_interpret)                       # (bg, m, dh)
            z = attn2_inv @ x3.reshape(b, h, m, dh).astype(attn2_inv.dtype)
            out = deform_attention_trainable(                # softmax(q k_l^T) z
                q.reshape(bg, n_pad, dh), k_l.reshape(bg, m, dh),
                z.reshape(bg, m, dh).astype(q.dtype), None, None, None, span1,
                1.0, self.pallas_interpret)
            out = out.reshape(b, h, n_pad, dh)
        else:
            sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l)    # (b, h, n, m)
            sim3 = jnp.einsum("bhid,bhjd->bhij", q_l, k)    # (b, h, m, n)
            if mask is not None:
                mq = mask[:, None, :, None]                  # (b,1,n,1)
                mkT = mask[:, None, None, :]                 # (b,1,1,n)
                sim1 = jnp.where(mq & mlT, sim1, _NEG_INF)
                sim3 = jnp.where(ml & mkT, sim3, _NEG_INF)
            attn1 = nn.softmax(sim1, axis=-1)
            attn3 = nn.softmax(sim3, axis=-1)
            out = (attn1 @ attn2_inv) @ (attn3 @ v)          # (b, h, n, d)
        out = out.transpose(0, 2, 1, 3).reshape(b, n_pad, inner_dim)

        if self.residual:
            # depthwise conv over the sequence axis, one 33-tap filter per head
            # (reference res_conv, NystromAttention.py:69-72).  TPU-native layout:
            # the per-head filter is replicated across that head's dim_head channels
            # and run as ONE depthwise conv over the (b, n, h*d) merged-head values —
            # 256 lanes instead of 8, no transposes (measured 2x whole-module win).
            pad = self.residual_conv_kernel // 2
            kernel = self.param(
                "res_conv_kernel",
                jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform",
                                                     in_axis=0, out_axis=1),
                (self.residual_conv_kernel, h))
            expanded = jnp.repeat(kernel, self.dim_head, axis=1)   # (K, h*d)
            res = lax.conv_general_dilated(
                v_flat.astype(out.dtype), expanded[:, None, :].astype(out.dtype),
                window_strides=(1,), padding=[(pad, pad)],
                feature_group_count=inner_dim,
                dimension_numbers=("NHC", "HIO", "NHC"))
            out = out + res
        out = nn.Dense(self.dim, kernel_init=torch_kernel_init, dtype=self.dtype,
                       name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = out[:, -n:]

        if return_attn:
            attn = attn1 @ attn2_inv @ attn3
            return out, attn
        return out

    def _seq_parallel(self, x, mask, deterministic):
        """Token-axis-sharded forward over the mesh's 'seq' axis (see
        ``sml_tpu/parallel/seq_parallel.py``).  Params are declared through
        :class:`_DenseParams` mirrors so the tree matches the single-device path
        (checkpoints are interchangeable)."""
        from sml_tpu.parallel.seq_parallel import run_seq_parallel_nystrom

        b, n, d_in = x.shape
        h, m = self.heads, self.num_landmarks
        inner_dim = h * self.dim_head
        params = {
            "to_qkv": _DenseParams((d_in, inner_dim * 3), use_bias=False,
                                   name="to_qkv")(),
            "to_out": _DenseParams((inner_dim, self.dim), name="to_out")(),
        }
        if self.residual:
            params["res_conv_kernel"] = self.param(
                "res_conv_kernel",
                jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform",
                                                     in_axis=0, out_axis=1),
                (self.residual_conv_kernel, h))

        # pad at the FRONT to a multiple of the landmark count (same rule as the
        # single-device path).  Semantics must match that path exactly: with no
        # caller mask, zero-padded tokens PARTICIPATE (qkv of a zero row is zero —
        # to_qkv has no bias — so they behave as zero-keys/values, not -inf); with
        # a caller mask, pad rows extend it as False.
        pad = (m - n % m) if n % m else 0
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (pad, 0)), constant_values=False)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            params = jax.tree_util.tree_map(lambda p: p.astype(self.dtype), params)

        out = run_seq_parallel_nystrom(
            self.seq_mesh, params, x, mask, dim=self.dim, dim_head=self.dim_head,
            heads=self.heads, num_landmarks=m,
            pinv_iterations=self.pinv_iterations, residual=self.residual,
            residual_conv_kernel=self.residual_conv_kernel, eps=self.eps,
            use_pallas=self.use_pallas and (mask is None or self.pallas_masked),
            pallas_interpret=self.pallas_interpret)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out[:, -n:]


class PreNorm(nn.Module):
    """LayerNorm before a wrapped callable (reference ``NystromAttention.py:161-169``)."""
    fn: nn.Module

    @nn.compact
    def __call__(self, x, **kwargs):
        return self.fn(nn.LayerNorm(epsilon=1e-5, name="norm")(x), **kwargs)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        h = nn.Dense(self.dim * self.mult, kernel_init=torch_kernel_init,
                     dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, kernel_init=torch_kernel_init, dtype=self.dtype)(h)


class Nystromformer(nn.Module):
    """Full Nystrom transformer encoder (reference ``NystromAttention.py:184-212``)."""
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    num_landmarks: int = 256
    pinv_iterations: int = 6
    attn_values_residual: bool = True
    attn_values_residual_conv_kernel: int = 33
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = False):
        for i in range(self.depth):
            attn = PreNorm(NystromAttention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                num_landmarks=self.num_landmarks,
                pinv_iterations=self.pinv_iterations,
                residual=self.attn_values_residual,
                residual_conv_kernel=self.attn_values_residual_conv_kernel,
                dropout=self.attn_dropout, dtype=self.dtype),
                name=f"attn{i}")
            ff = PreNorm(FeedForward(self.dim, dropout=self.ff_dropout,
                                     dtype=self.dtype), name=f"ff{i}")
            x = attn(x, mask=mask, deterministic=deterministic) + x
            x = ff(x, deterministic=deterministic) + x
        return x
