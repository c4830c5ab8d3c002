"""Fused CPB-bias + attention-weights Pallas kernel (deformable cross-attention).

The deformable attention's continuous-position-bias MLP is the model's dominant cost
(94% of a train step before optimization — see benchmarks/BENCH.md).  This kernel
fuses, per offset group and query-grid row:

    h1   = relu(u + tile(v_row, W))                  layer-1 (separable tables)
    h2   = relu(w1^T @ h1 + b1)                      layer-2 (dim x dim)
    bias = (w2^T @ h2 + b2) reshaped (W, J)          layer-3
    sim  = q_row @ k^T + bias                        attention logits
    attn = softmax_over_J(sim)

so the (dim, W*J) CPB activations never leave VMEM.

Layout notes:
* lane order of the flattened column table ``u`` is w*J + j ("j fastest"), which is
  exactly what ``pltpu.repeat(v_row, W, axis=1)`` produces when tiling the per-row
  table across the W query columns — no in-kernel relayout for layer 1;
* one grid program per (batch x offset-group); rows are a ``fori_loop`` with dynamic
  row slices (W=50 query rows can't satisfy Mosaic's %8 sublane block rule, and the
  single v5e core executes the grid serially anyway);
* the only relayout is the tiny (1, W*J) -> (W, J) bias reshape per row.

Used on the no-grad (eval/inference) path; training keeps the XLA+remat formulation
(autodiff through the kernel would need a custom backward — measured headroom there
is ~15%, see BENCH.md).  Reference semantics: ``models/DeformableAttention2D.py``
120-157 (CPB) + 288-307 (attention); exactness is oracle-tested in
``tests/test_pallas_kernel.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, u_ref, v_ref, w1_ref, b1_ref, w2_ref, b2_ref, attn_ref,
            *, h: int, w: int, j: int, dm: int):
    kk = k_ref[0].astype(jnp.float32)                    # (J, D)
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
        bias = bias.reshape(w, j)                        # (W, J)

        start = pl.multiple_of(r * w, w)
        q_row = q_ref[0, pl.ds(start, w), :].astype(jnp.float32)       # (W, D)
        sim = jax.lax.dot_general(q_row, kk, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) + bias

        m = jnp.max(sim, axis=-1, keepdims=True)
        p = jnp.exp(sim - m)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)
        attn_ref[0, pl.ds(start, w), :] = attn.astype(attn_ref.dtype)
        return carry

    jax.lax.fori_loop(0, h, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_bias_attention_weights(q: jnp.ndarray, k: jnp.ndarray, u: jnp.ndarray,
                                 v: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                                 w2: jnp.ndarray, b2: jnp.ndarray,
                                 interpret: bool = False) -> jnp.ndarray:
    """attn (BG, N, J) from q (BG, N, D) [already scaled], k (BG, J, D), CPB tables.

    u: (BG, dm, W*J) lane order w*J+j;  v: (BG, H, dm, J);  w1 (dm, dm), b1 (dm,),
    w2 (dm, 1) [one bias head per group], b2 (1,).  N = H*W, query index iy*W + ix.
    """
    bg, n, d = q.shape
    _, h, dm, j = v.shape
    w = n // h
    assert u.shape == (bg, dm, w * j), (u.shape, (bg, dm, w * j))

    kernel = functools.partial(_kernel, h=h, w=w, j=j, dm=dm)

    return pl.pallas_call(
        kernel,
        grid=(bg,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm, w * j), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, dm, j), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, dm), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, n, j), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, n, j), jnp.float32),
        interpret=interpret,
    )(q, k, u, v, w1, b1.reshape(dm, 1), w2.reshape(1, dm), b2.reshape(1, 1))
