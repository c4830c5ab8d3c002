"""Fused CPB (continuous-position-bias) Pallas kernels for deformable cross-attention.

The deformable attention's CPB MLP is the model's dominant cost (94% of a train step
before optimization — see benchmarks/BENCH.md).  A custom-VJP pair of kernels keeps
the (dim, W*J) layer activations VMEM-resident in BOTH directions:

forward, per offset group and query-grid row:
    h1   = relu(u + tile(v_row, W))      layer-1 from separable factor tables
    h2   = relu(w1^T @ h1 + b1)          layer-2 (dim x dim)
    bias = w2^T @ h2 + b2                layer-3 -> one (1, W*J) bias row

backward: recompute h1/h2 per row, emit du/dv plus per-program weight-grad partials
(summed over the batch*group axis outside).  The XLA formulation round-trips the
activations (~GBs) through HBM even with remat.

Layout/sizing notes (hard-won on v5e):
* lane order of the flattened column table ``u`` is w*J + j ("j fastest"), exactly
  what ``pltpu.repeat(v_row, ..., axis=1)`` produces when tiling the per-row table —
  layer 1 needs no in-kernel relayout;
* grid = (batch x offset-group, row-blocks); rows inside a block are a ``fori_loop``
  (W=50 query rows can't satisfy Mosaic's %8 sublane block rule).  Row-blocking keeps
  the (rows, W*J) bias/cotangent blocks small — Pallas double-buffers blocks, and a
  full-H f32 block OOMs scoped VMEM at 4096-patch bags;
* rows are additionally processed in ``wsplit`` lane chunks (cap 8192 lanes) so the
  (dim, W*J) temporaries fit;
* bias rows are stored f32 — bf16 single-sublane dynamic stores do not lower;
* no in-kernel transposes: weight grads use lane-contracting dot_generals and lane
  reductions (Mosaic cannot shape-cast (1, W*J) -> (W, J), which is also why the bias
  is returned flat and reshaped by XLA).

Reference semantics: ``models/DeformableAttention2D.py:120-157``; values AND gradients
are oracle-tested against the XLA formulation (tests/test_pallas_kernel.py,
tests/test_pallas_grad.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024   # headroom under the 16MB scoped limit (blocks 2x-buffer)
_MAX_CHUNK_LANES = 8192           # cap per-op lane width (larger stores fail to lower)
_MAX_ROWBLOCK_BYTES = 2 * 1024 * 1024  # cap the f32 bias/cotangent row block


def _pick_wsplit(w: int, j: int, dm: int, fixed_bytes: int, n_temps: int) -> int:
    for s in range(1, w + 1):
        if w % s:
            continue
        cwj = (w // s) * j
        if cwj > _MAX_CHUNK_LANES:
            continue
        per_chunk = n_temps * dm * cwj * 4
        if fixed_bytes + per_chunk <= _VMEM_BUDGET:
            return s
    return w


def _pick_rowblocks(h: int, wj: int) -> int:
    """Largest row block under the byte cap that also satisfies Mosaic's block
    rule (second-to-last block dim % 8 == 0, or equal to the array dim)."""
    def aligned(h_rb):
        return h_rb == h or h_rb % 8 == 0

    for nb in range(1, h + 1):
        if h % nb:
            continue
        h_rb = h // nb
        if aligned(h_rb) and h_rb * wj * 4 <= _MAX_ROWBLOCK_BYTES:
            return nb
    # nothing aligned fits the cap: smallest aligned block (support check rejects
    # the shape upstream if even this blows VMEM)
    for nb in range(h, 0, -1):
        if h % nb == 0 and aligned(h // nb):
            return nb
    return 1


_HARD_VMEM = 15 * 1024 * 1024     # the chip's ~16MB scoped VMEM, minus slack


def pallas_cpb_supported(dm: int, w: int, h: int, j: int,
                         itemsize: int = 2) -> bool:
    """Whether the fused kernels can tile (dm, W*J) x H at all.

    This is a HARD-capacity check (the `_VMEM_BUDGET` used by the chunk pickers
    is a soft heuristic the pickers may exceed via their fallbacks, and shapes
    like the 4k bag run fine slightly over it): with the smallest possible lane
    chunk (cwj = J), the u row table (double-buffered), the bias/cotangent row
    block and the v/dv blocks must all fit together.  (Row-block alignment is
    guaranteed by `_pick_rowblocks` — a full-height block is always legal — so
    only the capacity can reject.)  Callers fall back to the XLA formulation
    otherwise — e.g. 16k-patch bags (W=128, J=1024): u alone is 2 x 8.4 MB bf16."""
    wj = w * j
    n_rb = _pick_rowblocks(h, wj)
    h_rb = h // n_rb
    cwj = j                                           # wsplit = w (minimal chunk)
    u2 = 2 * dm * wj * itemsize
    bias2 = 2 * h_rb * wj * 4
    v2 = 2 * h_rb * dm * j * itemsize
    fwd_min = u2 + bias2 + v2 + 4 * dm * cwj * 4
    bwd_min = (u2 + dm * wj * itemsize                # + du accumulator block
               + bias2 + v2 + 2 * h_rb * dm * j * 4   # + dv block
               + 6 * dm * cwj * 4)
    return max(fwd_min, bwd_min) <= _HARD_VMEM


def _fwd_kernel(u_ref, v_ref, w1_ref, b1_ref, w2_ref, b2_ref, bias_ref,
                *, h_rb: int, w: int, j: int, dm: int, wsplit: int):
    cw = w // wsplit
    cwj = cw * j
    u = u_ref[0]                                         # (dm, W*J), lanes w*J+j

    def body(r, carry):
        v_row = v_ref[0, r]                              # (dm, J)
        v_rep = pltpu.repeat(v_row, cw, axis=1)          # (dm, cw*J)
        for s in range(wsplit):                          # static lane chunks
            h1 = jnp.maximum(u[:, s * cwj:(s + 1) * cwj] + v_rep, 0.0)
            # keep operands in the input dtype (bf16): f32 operands halve MXU rate
            h2 = jnp.dot(w1_ref[:].T, h1, preferred_element_type=jnp.float32)
            h2 = jnp.maximum(h2 + b1_ref[:], 0.0)        # (dm, cw*J)
            bias = jnp.dot(w2_ref[:], h2,
                           preferred_element_type=jnp.float32) + b2_ref[0, 0]
            bias_ref[0, r, s * cwj:(s + 1) * cwj] = bias[0].astype(bias_ref.dtype)
        return carry

    jax.lax.fori_loop(0, h_rb, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_cpb_bias(u: jnp.ndarray, v: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                   w2: jnp.ndarray, b2: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """bias (BG, H, W*J) f32 [lane order w*J+j] from CPB factor tables.

    u: (BG, dm, W*J);  v: (BG, H, dm, J);  w1 (dm, dm), b1 (dm,), w2 (dm, 1)
    [one bias head per group], b2 (1,).
    """
    bg, dm, wj = u.shape
    _, h, _, j = v.shape
    w = wj // j
    usize = jnp.dtype(u.dtype).itemsize
    n_rb = _pick_rowblocks(h, wj)
    h_rb = h // n_rb
    fixed = 2 * dm * wj * usize + 2 * h_rb * wj * 4 + 2 * h_rb * dm * j * usize
    wsplit = _pick_wsplit(w, j, dm, fixed, n_temps=4)

    kernel = functools.partial(_fwd_kernel, h_rb=h_rb, w=w, j=j, dm=dm,
                               wsplit=wsplit)

    return pl.pallas_call(
        kernel,
        grid=(bg, n_rb),
        in_specs=[
            pl.BlockSpec((1, dm, wj), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_rb, dm, j), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, dm), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, 1), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, r: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h_rb, wj), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, h, wj), jnp.float32),
        interpret=interpret,
    )(u, v, w1, b1.reshape(dm, 1), w2.reshape(1, dm), b2.reshape(1, 1))


def _bwd_kernel(u_ref, v_ref, w1_ref, b1_ref, w2_ref, dbias_ref,
                du_ref, dv_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, h_rb: int, w: int, j: int, dm: int, wsplit: int):
    """Backward: recompute h1/h2 per (row, lane-chunk), accumulate grads in VMEM.

    du/dw*/db* blocks are revisited across row blocks (constant index): zero-init at
    row-block 0, accumulate after.
    """
    cw = w // wsplit
    cwj = cw * j
    u = u_ref[0]                                         # (dm, W*J)
    w1 = w1_ref[:].astype(jnp.float32)                   # (dm, dm)
    w2 = w2_ref[:].astype(jnp.float32)                   # (1, dm)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        du_ref[0] = jnp.zeros_like(du_ref[0])
        dw1_ref[0] = jnp.zeros_like(dw1_ref[0])
        db1_ref[0] = jnp.zeros_like(db1_ref[0])
        dw2_ref[0] = jnp.zeros_like(dw2_ref[0])
        db2_ref[0] = jnp.zeros_like(db2_ref[0])

    def body(r, carry):
        v_row = v_ref[0, r]                              # (dm, J)
        v_rep = pltpu.repeat(v_row, cw, axis=1)          # (dm, cw*J)
        dv_acc = jnp.zeros((dm, j), jnp.float32)

        for s in range(wsplit):                          # static lane chunks
            sl = slice(s * cwj, (s + 1) * cwj)
            h1 = jnp.maximum(u[:, sl] + v_rep, 0.0)      # input dtype (bf16)
            z2 = jnp.dot(w1_ref[:].T, h1,
                         preferred_element_type=jnp.float32) + b1_ref[:]
            h2 = jnp.maximum(z2, 0.0)                    # (dm, cw*J) f32

            dbias = dbias_ref[0, pl.ds(r, 1), sl].astype(jnp.float32)  # (1, cw*J)

            # layer-3: bias = w2 @ h2 + b2 (lane reductions, no transposes)
            dw2_ref[0] += jnp.sum(h2 * dbias, axis=1, keepdims=True)   # (dm, 1)
            db2_ref[0] += jnp.sum(dbias).reshape(1, 1)
            dh2 = jax.lax.dot_general(w2, dbias, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dz2 = jnp.where(z2 > 0, dh2, 0.0)

            # layer-2: z2 = w1^T h1 + b1
            dz2_c = dz2.astype(u.dtype)
            dw1_ref[0] += jax.lax.dot_general(h1, dz2_c, (((1,), (1,)), ((), ())),
                                              preferred_element_type=jnp.float32)
            db1_ref[0] += jnp.sum(dz2, axis=1, keepdims=True)
            dh1 = jnp.dot(w1_ref[:], dz2_c, preferred_element_type=jnp.float32)
            # relu mask in f32: the target does not support bf16 comparisons
            dz1 = jnp.where(h1.astype(jnp.float32) > 0, dh1, 0.0)

            # layer-1: h1 = relu(u + tile(v_row))
            du_ref[0, :, sl] += dz1.astype(du_ref.dtype)
            for wc in range(cw):                         # fold chunk onto (dm, J)
                dv_acc = dv_acc + dz1[:, wc * j:(wc + 1) * j]

        dv_ref[0, r] = dv_acc.astype(dv_ref.dtype)
        return carry

    jax.lax.fori_loop(0, h_rb, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cpb_bwd_call(u, v, w1, b1, w2, dbias, interpret=False):
    bg, dm, wj = u.shape
    _, h, _, j = v.shape
    w = wj // j
    usize = jnp.dtype(u.dtype).itemsize
    n_rb = _pick_rowblocks(h, wj)
    h_rb = h // n_rb
    fixed = (2 * dm * wj * usize + dm * wj * usize      # u (2x-buffered) + du
             + 2 * h_rb * wj * 4                        # dbias block (2x)
             + 2 * h_rb * dm * j * (usize + 4))         # v + dv blocks
    wsplit = _pick_wsplit(w, j, dm, fixed, n_temps=6)
    kernel = functools.partial(_bwd_kernel, h_rb=h_rb, w=w, j=j, dm=dm,
                               wsplit=wsplit)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(bg, n_rb),
        in_specs=[
            pl.BlockSpec((1, dm, wj), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_rb, dm, j), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, dm), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dm, 1), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_rb, wj), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, dm, wj), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_rb, dm, j), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm, dm), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm, 1), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dm, 1), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bg, dm, wj), u.dtype),   # du
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
    bias = bias.reshape(bg, h * w, j).astype(jnp.float32)  # (BG, N, J): XLA reshape
    sim = jnp.einsum("bnd,bjd->bnj", q.astype(jnp.float32),
                     k.astype(jnp.float32)) + bias
    sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    return jax.nn.softmax(sim, axis=-1)
