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
