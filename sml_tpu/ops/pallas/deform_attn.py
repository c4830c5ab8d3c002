"""Fused CPB (continuous-position-bias) Pallas kernel for deformable cross-attention.

The deformable attention's CPB MLP is the model's dominant cost (94% of a train step
before optimization — see benchmarks/BENCH.md).  This kernel fuses, per offset group
and query-grid row:

    h1   = relu(u + tile(v_row, W))      layer-1 from separable factor tables
    h2   = relu(w1^T @ h1 + b1)          layer-2 (dim x dim)
    bias = w2^T @ h2 + b2                layer-3 -> one (1, W*J) bias row

so the (dim, W*J) activations live and die in VMEM — the XLA formulation round-trips
them (~GBs) through HBM.  The (B*g, H, W*J) bias output is reshaped to (B, heads, N, J)
by the caller and added to the attention logits; sim+softmax stay in XLA (they fuse
well, and Mosaic cannot shape-cast the (1, W*J) bias row to (W, J) in-kernel).

Layout notes:
* lane order of the flattened column table ``u`` is w*J + j ("j fastest"), exactly
  what ``pltpu.repeat(v_row, W, axis=1)`` produces when tiling the per-row table —
  layer 1 needs no in-kernel relayout;
* one grid program per (batch x offset-group); rows are a ``fori_loop`` (W=50 query
  rows can't satisfy Mosaic's %8 sublane block rule, and the single v5e core executes
  the grid serially anyway).

Used on the no-grad (eval/inference) path; training keeps the XLA+remat formulation
(autodiff through the kernel would need a custom backward — measured headroom there is
~15%, see BENCH.md).  Reference semantics: ``models/DeformableAttention2D.py:120-157``;
exactness is oracle-tested in ``tests/test_pallas_kernel.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(u_ref, v_ref, w1_ref, b1_ref, w2_ref, b2_ref, bias_ref,
            *, h: int, w: int, j: int, dm: int):
    u = u_ref[0]                                         # (dm, W*J), lanes w*J+j

    def body(r, carry):
        v_row = v_ref[0, r]                              # (dm, J)
        v_rep = pltpu.repeat(v_row, w, axis=1)           # (dm, W*J): [v, v, ... xW]
        h1 = jnp.maximum(u + v_rep, 0.0)
        h2 = jnp.dot(w1_ref[:].T, h1.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b1_ref[:], 0.0)            # (dm, W*J)
        bias = jnp.dot(w2_ref[:], h2,
                       preferred_element_type=jnp.float32) + b2_ref[0, 0]
        bias_ref[0, r, :] = bias[0].astype(bias_ref.dtype)
        return carry

    jax.lax.fori_loop(0, h, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_cpb_bias(u: jnp.ndarray, v: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                   w2: jnp.ndarray, b2: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """bias (BG, H, W*J) [lane order w*J+j] from CPB factor tables.

    u: (BG, dm, W*J);  v: (BG, H, dm, J);  w1 (dm, dm), b1 (dm,), w2 (dm, 1)
    [one bias head per group], b2 (1,).
    """
    bg, dm, wj = u.shape
    _, h, _, j = v.shape
    w = wj // j

    kernel = functools.partial(_kernel, h=h, w=w, j=j, dm=dm)

    return pl.pallas_call(
        kernel,
        grid=(bg,),
        in_specs=[
            pl.BlockSpec((1, dm, wj), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dm, j), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, dm), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wj), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, h, wj), jnp.float32),
        interpret=interpret,
    )(u, v, w1, b1.reshape(dm, 1), w2.reshape(1, dm), b2.reshape(1, 1))


def _bwd_kernel(u_ref, v_ref, w1_ref, b1_ref, w2_ref, dbias_ref,
                du_ref, dv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, h: int, w: int, j: int, dm: int):
    """Backward of the fused CPB: recompute h1/h2 per row in VMEM, emit input grads
    and per-(batch x group) weight-grad partials (summed over BG outside)."""
    u = u_ref[0]                                         # (dm, W*J)
    w1 = w1_ref[:].astype(jnp.float32)                   # (dm, dm)
    w2 = w2_ref[:].astype(jnp.float32)                   # (1, dm)

    du_ref[0] = jnp.zeros_like(du_ref[0])
    dw1_ref[0] = jnp.zeros_like(dw1_ref[0])
    db1_ref[0] = jnp.zeros_like(db1_ref[0])
    dw2_ref[0] = jnp.zeros_like(dw2_ref[0])
    db2_ref[0] = jnp.zeros_like(db2_ref[0])

    def body(r, carry):
        v_row = v_ref[0, r]                              # (dm, J)
        v_rep = pltpu.repeat(v_row, w, axis=1)           # (dm, W*J)
        h1 = jnp.maximum(u + v_rep, 0.0).astype(jnp.float32)
        z2 = jnp.dot(w1.T, h1, preferred_element_type=jnp.float32) + b1_ref[:]
        h2 = jnp.maximum(z2, 0.0)                        # (dm, W*J)

        dbias = dbias_ref[0, pl.ds(r, 1), :].astype(jnp.float32)       # (1, W*J)

        # layer-3 grads: bias = w2 @ h2 + b2   (no transposes: lane reductions /
        # lane-contracting dot_generals keep Mosaic layouts put)
        dw2_ref[0] += jnp.sum(h2 * dbias, axis=1, keepdims=True)       # (dm, 1)
        db2_ref[0] += jnp.sum(dbias).reshape(1, 1)
        dh2 = jax.lax.dot_general(w2, dbias, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (dm, W*J)
        dz2 = jnp.where(z2 > 0, dh2, 0.0)

        # layer-2 grads: z2 = w1^T h1 + b1
        dw1_ref[0] += jax.lax.dot_general(h1, dz2, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        db1_ref[0] += jnp.sum(dz2, axis=1, keepdims=True)              # (dm, 1)
        dh1 = jnp.dot(w1, dz2, preferred_element_type=jnp.float32)     # (dm, W*J)
        dz1 = jnp.where(h1 > 0, dh1, 0.0)

        # layer-1 grads: h1 = relu(u + tile(v_row))
        du_ref[0] += dz1.astype(du_ref.dtype)
        dv_acc = jnp.zeros((dm, j), jnp.float32)
        for wc in range(w):                               # static unroll: W adds
            dv_acc = dv_acc + dz1[:, wc * j:(wc + 1) * j]
        dv_ref[0, r] = dv_acc.astype(dv_ref.dtype)
        return carry

    jax.lax.fori_loop(0, h, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cpb_bwd_call(u, v, w1, b1, w2, dbias, interpret=False):
    bg, dm, wj = u.shape
    _, h, _, j = v.shape
    w = wj // j
    kernel = functools.partial(_bwd_kernel, h=h, w=w, j=j, dm=dm)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(bg,),
        in_specs=[
            pl.BlockSpec((1, dm, wj), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dm, j), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, dm), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wj), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, dm, wj), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dm, j), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm, dm), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bg, dm, wj), f32),       # du
            jax.ShapeDtypeStruct((bg, h, dm, j), f32),     # dv
            jax.ShapeDtypeStruct((bg, dm, dm), f32),       # dw1 partials
            jax.ShapeDtypeStruct((bg, dm, 1), f32),        # db1 partials
            jax.ShapeDtypeStruct((bg, dm, 1), f32),        # dw2 partials
            jax.ShapeDtypeStruct((bg, 1, 1), f32),         # db2 partials
        ],
        interpret=interpret,
    )(u, v, w1, b1.reshape(dm, 1), w2.reshape(1, dm), dbias)
    du, dv, dw1p, db1p, dw2p, db2p = outs
    return (du.astype(u.dtype), dv.astype(v.dtype),
            dw1p.sum(0).astype(w1.dtype), db1p.sum(0)[:, 0].astype(b1.dtype),
            dw2p.sum(0).astype(w2.dtype), db2p.sum(0)[0].astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def cpb_bias_trainable(u, v, w1, b1, w2, b2, interpret=False):
    """Differentiable fused CPB bias: Pallas forward + Pallas backward.

    Same contract as :func:`fused_cpb_bias`; backward recomputes the VMEM
    activations (no residuals) and returns exact grads for all six inputs.
    """
    return fused_cpb_bias(u, v, w1, b1, w2, b2, interpret=interpret)


def _cpb_fwd(u, v, w1, b1, w2, b2, interpret):
    return fused_cpb_bias(u, v, w1, b1, w2, b2, interpret=interpret), \
        (u, v, w1, b1, w2)


def _cpb_bwd(interpret, res, dbias):
    u, v, w1, b1, w2 = res
    du, dv, dw1, db1, dw2, db2 = _cpb_bwd_call(u, v, w1, b1, w2,
                                               dbias.astype(jnp.float32),
                                               interpret=interpret)
    return du, dv, dw1, db1, dw2, db2.reshape(1).astype(jnp.float32)


cpb_bias_trainable.defvjp(_cpb_fwd, _cpb_bwd)


def fused_bias_attention_weights(q, k, u, v, w1, b1, w2, b2, interpret=False):
    """attn (BG, N, J): fused-CPB bias kernel + XLA sim/softmax.

    q (BG, N, D) already scaled; k (BG, J, D); tables as in :func:`fused_cpb_bias`.
    N = H*W with query index iy*W + ix.
    """
    bg, n, d = q.shape
    _, h, dm, j = v.shape
    w = n // h
    bias = fused_cpb_bias(u, v, w1, b1, w2, b2, interpret=interpret)
    bias = bias.reshape(bg, h * w, j)                    # (BG, N, J): free in XLA
    sim = jnp.einsum("bnd,bjd->bnj", q.astype(jnp.float32),
                     k.astype(jnp.float32)) + bias
    sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    return jax.nn.softmax(sim, axis=-1)
