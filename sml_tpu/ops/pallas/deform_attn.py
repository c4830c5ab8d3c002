"""Fused CPB-bias + attention-weights Pallas kernel (deformable cross-attention).

The deformable attention's continuous-position-bias MLP is the model's dominant cost
(94% of a train step before optimization — see benchmarks/BENCH.md).  This kernel
fuses, per offset group and query-grid row:

    h1   = relu(u_row_block + tile(v_row, W))       layer-1 (separable tables)
    h2   = relu(w1^T @ h1 + b1)                      layer-2 (dim x dim)
    bias = (w2^T @ h2 + b2) reshaped (W, J)          layer-3
    sim  = q_row @ k^T + bias                        attention logits
    attn = softmax_over_J(sim)

so the (dim, W*J) CPB activations never leave VMEM.

Layout notes:
* lane order of the flattened column table ``u`` is w*J + j ("j fastest"), which is
  exactly what ``pltpu.repeat(v_row, W, axis=1)`` produces when tiling the per-row
  table across the W query columns — no in-kernel relayout for layer 1;
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
            *, rows: int, w: int, j: int, dm: int):
    kk = k_ref[0].astype(jnp.float32)                # (J, D)

    for r in range(rows):                            # static unroll over grid rows
        u_row = u_ref[0]                             # (dm, W*J), lane order w*J+j
        v_row = v_ref[0, r]                          # (dm, J)
        v_rep = pltpu.repeat(v_row, w, axis=1)       # (dm, W*J): tiles [v, v, ...]
        h1 = jnp.maximum(u_row + v_rep, 0.0)
        h2 = jnp.dot(w1_ref[:].T, h1.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b1_ref[:], 0.0)        # (dm, W*J)
        bias = jnp.dot(w2_ref[:], h2,
                       preferred_element_type=jnp.float32) + b2_ref[0, 0]
        bias = bias.reshape(w, j)                    # (W, J)

        q_row = q_ref[0, r * w:(r + 1) * w, :].astype(jnp.float32)     # (W, D)
        sim = jax.lax.dot_general(q_row, kk, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32) + bias

        m = jnp.max(sim, axis=-1, keepdims=True)
        p = jnp.exp(sim - m)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)
        attn_ref[0, r * w:(r + 1) * w, :] = attn.astype(attn_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows_per_block", "interpret"))
def fused_bias_attention_weights(q: jnp.ndarray, k: jnp.ndarray, u: jnp.ndarray,
                                 v: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                                 w2: jnp.ndarray, b2: jnp.ndarray,
                                 rows_per_block: int = 10,
                                 interpret: bool = False) -> jnp.ndarray:
    """attn (BG, N, J) from q (BG, N, D) [already scaled], k (BG, J, D), CPB tables.

    u: (BG, dm, W*J) lane order w*J+j;  v: (BG, H, dm, J);  w1 (dm, dm), b1 (dm,),
    w2 (dm, 1) [one bias head per group], b2 (1,).  N = H*W, query index iy*W + ix.
    """
    bg, n, d = q.shape
    _, h, dm, j = v.shape
    w = n // h
    assert u.shape == (bg, dm, w * j), (u.shape, (bg, dm, w * j))
    assert h % rows_per_block == 0, (h, rows_per_block)
    blocks = h // rows_per_block

    kernel = functools.partial(_kernel, rows=rows_per_block, w=w, j=j, dm=dm)

    return pl.pallas_call(
        kernel,
        grid=(bg, blocks),
        in_specs=[
            pl.BlockSpec((1, rows_per_block * w, d),
                         lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm, w * j), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows_per_block, dm, j),
                         lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, dm), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, 1), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, r: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_per_block * w, j),
                               lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, n, j), jnp.float32),
        interpret=interpret,
    )(q, k, u, v, w1, b1.reshape(dm, 1), w2.reshape(1, dm), b2.reshape(1, 1))
