"""Fused Pallas kernels for deformable cross-attention: CPB bias + attention epilogue.

Two custom-VJP kernel pairs (reference semantics:
``models/DeformableAttention2D.py:120-157`` for the CPB MLP and ``:306-311`` for
the attention chain):

1. ``cpb_bias_trainable`` — the continuous-position-bias MLP, the model's
   dominant cost (94% of a train step before optimization);
2. ``deform_attention_trainable`` (round 3b) — sim+softmax(+dropout)+attn@v
   consuming the bias, so the (B, h, N, J) f32 chain never exists in HBM in
   either direction (recompute backward; on-chip PRNG dropout in production,
   exact {0,1} mask operand in interpret mode).

The CPB pair keeps the (dim, lanes) layer activations VMEM-resident in BOTH
directions.  Round 5 folds the separable LAYER-1 FACTOR TABLES into the kernels
too: the operands are the raw signed-log displacement tables dx (BG, W*J) /
dy (BG, H, J) plus the layer-1 weights (w0x, w0y, b0), and the u/v tiles are
built in VMEM — the (BG, dm, W*J) u and (BG, H, dm, J) v tensors (67 MB each
per branch at the 4k shape) never exist in HBM in either direction.  Their
XLA-side build + backward previously measured 6.2 ms/branch of the 4k step
(scripts/profile_components.py ``factors``), dominated by the dm-broadcast
relayouts and the (BG, dm, W*J) du round trip.

forward, per offset group / query-grid row-block / lane chunk:
    u    = w0x * dx_chunk                    layer-1 column table, built in VMEM
    v_r  = w0y * dy_row + b0                 layer-1 row table, built per row
    h1   = relu(u + tile(v_r, cw))           layer-1
    h2   = relu(w1^T @ h1 + b1)              layer-2 (dim x dim)
    bias = w2^T @ h2 + b2                    layer-3 -> one (1, cw*J) bias row piece

backward: recompute h1/h2 per row, accumulate du in a VMEM scratch and project
it onto (d_dx = w0x^T du, dw0x = sum_l du * dx) once per block; the per-row dv
fold projects onto (d_dy = w0y^T dv_acc, dw0y, db0) immediately.  Per-program
weight-grad partials are summed over the batch*group axis outside.

Tiling (round 3): the lane-chunk loop is a GRID dimension, not an in-kernel loop —
the lane axis streams one cw*J chunk at a time.  Grid order (bg, row-block,
chunk) with chunk fastest keeps the bias/d_dy blocks VMEM-resident across a
row-block's chunks (consecutive revisits); the d_dx blocks are emitted per
(row-block, chunk) and summed over row-blocks by XLA (tiny: (BG, n_rb, W*J)).

Layout/sizing notes (hard-won on v5e):
* lane order of the flattened column table ``u`` is w*J + j ("j fastest"), exactly
  what ``pltpu.repeat(v_row, cw, axis=1)`` produces when tiling the per-row table —
  layer 1 needs no in-kernel relayout;
* a chunked lane-block must satisfy Mosaic's rule (lane dim % 128 == 0 or equal to
  the array's) — the tiling picker only emits legal (wsplit, n_rb) pairs, and the
  support gate IS the picker (shared constants, per round-2 advice);
* rows inside a block are a ``fori_loop`` (query-row counts can't satisfy Mosaic's
  %8 sublane block rule);
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
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024   # headroom under the 16MB scoped limit (blocks 2x-buffer)
# The backward tolerates a tighter fit: bigger tiles mean fewer block revisits
# (less streamed-u refetch / fewer emitted partials).  Step-level A/B @4k (B=8,
# device-loop): (2,8)@10MB = 60.1 ms vs (2,2)@13MB = 59.6 ms; 16k B=2 re-checked
# under the (16,16) pick this budget selects.  Raise no further: 14MB left no
# additional pick changes and erodes the double-buffering slack.
_VMEM_BUDGET_BWD = 13 * 1024 * 1024
# Probe overrides (scripts/bench_cpb_tiling.py batch-scaling sweeps): force the
# bwd soft budget / grid order per-process without editing the module.  Both
# default to the tuned values above; production never sets them.
if os.environ.get("SML_TPU_VMEM_BWD_MB"):
    _VMEM_BUDGET_BWD = int(os.environ["SML_TPU_VMEM_BWD_MB"]) * 1024 * 1024
_FORCE_BWD_ORDER = os.environ.get("SML_TPU_CPB_BWD_ORDER") or None
# Backward weight-grad lane reductions on the MXU (lane-contracting
# dot_generals with a ones row) instead of VPU mult+reduce passes.  The idea:
# the bwd is VPU-recompute-bound, so move ~3 of its ~11 per-row VPU passes to
# the mostly-idle MXU.  Step-level A/B @4k (r5, 2 runs/arm, device-loop):
# MXU=1 145.78 bags/s vs MXU=0 146.33/146.35 — a wash-to-slightly-negative
# (the (rows,1) dot issues don't beat the VPU reduce at these row counts).
# Measured negative result; default OFF, flag kept for re-measurement.
_MXU_REDUCE = os.environ.get("SML_TPU_CPB_MXU_REDUCE", "0") != "0"
# Escape hatch: force the CPB bias / dbias HBM interface back to f32 (round 5
# moved it to the compute dtype — bf16 in production — which halves the
# dominant HBM stream of the 4k step: bias+dbias round-trips are ~2.7 GB/step
# f32 across both branches.  In-VMEM math stays f32 either way.)
_BIAS_F32 = os.environ.get("SML_TPU_CPB_BIAS_F32", "0") != "0"
_MAX_CHUNK_LANES = 8192           # cap per-op lane width (larger stores fail to lower)
_MAX_ROWBLOCK_BYTES = 2 * 1024 * 1024  # cap the f32 bias/cotangent row block
_HARD_VMEM = 15 * 1024 * 1024     # the chip's ~16MB scoped VMEM, minus slack


def _divisors(n: int):
    return [d for d in range(1, n + 1) if n % d == 0]


def _row_aligned(h_rb: int, h: int) -> bool:
    """Mosaic block rule: second-to-last block dim % 8 == 0, or == the array dim."""
    return h_rb == h or h_rb % 8 == 0


def _tile_bytes(dm: int, h_rb: int, cwj: int, j: int, usize: int,
                bwd: bool) -> int:
    """Per-program VMEM bytes for one (wsplit, n_rb) tiling choice (2x = Pallas
    double-buffering of streamed blocks).  The u/v factor tiles are built
    in-kernel (round 5), so the streamed operands are only the thin dx/dy
    displacement tables; u lives once as a computed VMEM value."""
    dx2 = 2 * cwj * 4                             # dx chunk (f32)
    dy2 = 2 * h_rb * j * 4                        # dy row block (f32)
    u1 = dm * cwj * usize                         # in-kernel u tile (single)
    # bias / dbias block rides the compute dtype (round 5); sub-word dtypes
    # add an f32 staging scratch (aligned bulk cast) — net VMEM is ~unchanged
    bias_usize = 4 if _BIAS_F32 else usize
    bias2 = 2 * h_rb * cwj * bias_usize
    bias_scr = h_rb * cwj * 4 if bias_usize < 4 else 0
    if not bwd:
        temps = 4 * dm * cwj * 4
        return dx2 + dy2 + u1 + bias2 + bias_scr + temps
    ddx2 = 2 * cwj * 4                            # d_dx block
    ddy2 = 2 * h_rb * j * 4                       # d_dy block
    du1 = dm * cwj * 4                            # du accumulator scratch (f32)
    temps = 6 * dm * cwj * 4
    return dx2 + dy2 + u1 + bias2 + bias_scr + ddx2 + ddy2 + du1 + temps


def _pick_tiling(dm: int, w: int, h: int, j: int, usize: int, bwd: bool):
    """(wsplit, n_rb) — smallest lane split (fewest chunks) and fewest row blocks
    such that every per-program block is Mosaic-legal and fits the soft budget.
    Returns None when even the finest legal tiling exceeds hard VMEM capacity —
    the ONLY source of truth for :func:`pallas_cpb_supported`."""
    budget = _VMEM_BUDGET_BWD if bwd else _VMEM_BUDGET
    candidates = []
    for s in _divisors(w):
        cwj = (w // s) * j
        if cwj > _MAX_CHUNK_LANES:
            continue
        if s > 1 and cwj % 128 != 0:
            continue                    # chunked lane blocks must be %128
        for nb in _divisors(h):
            h_rb = h // nb
            if not _row_aligned(h_rb, h):
                continue
            if h_rb * cwj * 4 > _MAX_ROWBLOCK_BYTES:
                continue
            size = _tile_bytes(dm, h_rb, cwj, j, usize, bwd)
            if size > _HARD_VMEM:
                continue
            if size <= budget:
                return s, nb
            candidates.append((size, s, nb))
    if candidates:
        _, s, nb = min(candidates)
        return s, nb
    return None


def _pick_rpack(dm: int, h_rb: int, cwj: int, j: int, usize: int,
                bwd: bool) -> int:
    """Rows packed per forward matmul (block-diagonal weights).  1 for the
    backward (measured slower there: its matmuls already hide behind the
    heavier VPU recompute, and the packed f32 live ranges cost more than the
    saved dispatches).  The live-set model (ur + v_rep + h1 in the input
    dtype, h2 f32, plus the streamed blocks) must fit hard VMEM; h_rb < 8
    cannot form an aligned 8-row group."""
    if bwd or h_rb < 8:
        return 1
    for r in (4, 2):
        if r * dm > 128:
            continue
        blocks = (dm * cwj * usize              # in-kernel u tile
                  + 2 * cwj * 4                 # dx chunk
                  + 2 * h_rb * j * 4            # dy rows
                  + 2 * h_rb * cwj * 4)         # bias rows
        temps = r * dm * cwj * (3 * usize + 4)
        if blocks + temps <= _HARD_VMEM:
            return r
    return 1


def pallas_cpb_supported(dm: int, w: int, h: int, j: int,
                         itemsize: int = 2) -> bool:
    """Whether the kernels have a legal VMEM tiling for this shape (both
    directions).  Derived from the same picker the kernels use — the gate can
    not drift from the tiling (round-2 advice).  Callers fall back to the XLA
    formulation otherwise."""
    return (_pick_tiling(dm, w, h, j, itemsize, bwd=False) is not None
            and _pick_tiling(dm, w, h, j, itemsize, bwd=True) is not None)


# Back-compat shims for the forced-chunking tests (and any external callers):
# thin views over the shared picker.
def _pick_wsplit(w: int, j: int, dm: int, fixed_bytes: int, n_temps: int) -> int:
    for s in _divisors(w):
        cwj = (w // s) * j
        if cwj > _MAX_CHUNK_LANES:
            continue
        if s > 1 and cwj % 128 != 0:
            continue
        if fixed_bytes + n_temps * dm * cwj * 4 <= _VMEM_BUDGET:
            return s
    return w


def _pick_rowblocks(h: int, wj: int) -> int:
    for nb in _divisors(h):
        h_rb = h // nb
        if _row_aligned(h_rb, h) and h_rb * wj * 4 <= _MAX_ROWBLOCK_BYTES:
            return nb
    for nb in range(h, 0, -1):
        if h % nb == 0 and _row_aligned(h // nb, h):
            return nb
    return 1


def _build_u(dx_ref, w0x_ref, cdt):
    """(dm, cw*J) layer-1 column tile from the dx chunk: u = w0x * dx.
    Built in VMEM (round 5) — was a streamed HBM operand before.  dx rides as
    (BG, 1, W*J) so the block's sublane dim equals the array's (Mosaic's
    block rule rejects a 1-sublane block on a (BG, W*J) layout)."""
    dm = w0x_ref.shape[0]
    dxc = dx_ref[0].astype(cdt)                          # (1, cw*J)
    return w0x_ref[:] * jnp.broadcast_to(dxc, (dm, dxc.shape[-1]))


def _build_v_rows(dy_rows, w0y_ref, b0_ref, cdt):
    """(k*dm, J) layer-1 row tile for k consecutive query rows:
    v_r = w0y * dy_r + b0, stacked along sublanes (row-major blocks, matching
    the kron(I, W) block-diagonal packed weights)."""
    dm = w0y_ref.shape[0]
    k, j = dy_rows.shape
    rows = [w0y_ref[:] * jnp.broadcast_to(dy_rows[i:i + 1].astype(cdt), (dm, j))
            + b0_ref[:] for i in range(k)]
    return rows[0] if k == 1 else jnp.concatenate(rows, axis=0)


def _fwd_kernel(dx_ref, dy_ref, w0x_ref, w0y_ref, b0_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, bias_ref, *maybe_scr,
                h_rb: int, cw: int, j: int, dm: int, rpack: int = 1,
                cdt=None):
    """Forward: one (row, chunk) MLP evaluation per fori_loop step.

    ``rpack`` > 1 packs rpack query rows per matmul: the (dm x dm) layer-2 and
    (1 x dm) layer-3 weights arrive pre-expanded to block-diagonal
    (rpack*dm x rpack*dm) / (rpack x rpack*dm) form, so each iteration's two
    matmuls cover rpack rows at once.  Bit-exact (the off-block zeros add
    exact 0.0 to the f32 accumulation); measured 35% faster at the 4k shape
    (5.97 -> 3.90 ms/branch) — the per-row matmuls were latency-bound, not
    lane-bound.  Mosaic requires sublane-dim dynamic slices to be 8-aligned,
    so the packed loop runs at 8-row granularity (8 // rpack groups per step)
    with a single-row tail for h_rb % 8 rows.

    Sub-word output dtypes (bf16 production, round 5): Mosaic cannot prove
    row-dynamic sub-pair stores aligned (bf16 packs 2 rows per sublane), so
    rows land in an f32 VMEM scratch (``maybe_scr``) and the block is cast and
    stored ONCE, fully aligned, at program end.  f32 output keeps the direct
    row stores (the tuned round-3e path, bit-identical).
    """
    out_scr = maybe_scr[0] if maybe_scr else None

    def store_rows(idx, val):
        if out_scr is None:
            bias_ref[0, idx] = val.astype(bias_ref.dtype)
        else:
            out_scr[idx] = val.astype(out_scr.dtype)

    u = _build_u(dx_ref, w0x_ref, cdt)                   # (dm, cw*J) this chunk

    def one_row(r):
        dy_row = dy_ref[0, pl.ds(r, 1)]                  # (1, J)
        v_row = _build_v_rows(dy_row, w0y_ref, b0_ref, cdt)   # (dm, J)
        v_rep = pltpu.repeat(v_row, cw, axis=1)          # (dm, cw*J)
        h1 = jnp.maximum(u + v_rep, 0.0)
        # keep operands in the input dtype (bf16): f32 operands halve MXU rate
        h2 = jnp.dot(w1_ref[:dm, :dm].T, h1,
                     preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b1_ref[:dm], 0.0)          # (dm, cw*J)
        bias = jnp.dot(w2_ref[:1, :dm], h2,
                       preferred_element_type=jnp.float32) + b2_ref[0, 0]
        store_rows(r, bias[0])

    def _flush():
        if out_scr is not None:
            bias_ref[0] = out_scr[...].astype(bias_ref.dtype)

    if rpack == 1:
        def body(r, carry):
            one_row(r)
            return carry

        jax.lax.fori_loop(0, h_rb, body, 0)
        _flush()
        return

    ur = jnp.concatenate([u] * rpack, axis=0)            # (rpack*dm, cw*J)

    def body8(i, carry):
        dy8 = dy_ref[0, pl.ds(i * 8, 8)]                 # (8, J): aligned
        outs = []
        for gi in range(8 // rpack):
            vr = _build_v_rows(dy8[gi * rpack:(gi + 1) * rpack],
                               w0y_ref, b0_ref, cdt)     # (rpack*dm, J)
            v_rep = pltpu.repeat(vr, cw, axis=1)         # (rpack*dm, cw*J)
            h1 = jnp.maximum(ur + v_rep, 0.0)
            h2 = jnp.dot(w1_ref[:].T, h1, preferred_element_type=jnp.float32)
            h2 = jnp.maximum(h2 + b1_ref[:], 0.0)
            outs.append(jnp.dot(w2_ref[:], h2,
                                preferred_element_type=jnp.float32)
                        + b2_ref[0, 0])                  # (rpack, cw*J)
        out8 = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        store_rows(pl.ds(i * 8, 8), out8)
        return carry

    jax.lax.fori_loop(0, h_rb // 8, body8, 0)
    if h_rb % 8:                                         # single-row tail
        def tail(r, carry):
            one_row(r)
            return carry

        jax.lax.fori_loop(h_rb - h_rb % 8, h_rb, tail, 0)
    _flush()


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_cpb_bias(dx: jnp.ndarray, dy: jnp.ndarray, w0x: jnp.ndarray,
                   w0y: jnp.ndarray, b0: jnp.ndarray,
                   w1: jnp.ndarray, b1: jnp.ndarray,
                   w2: jnp.ndarray, b2: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """bias (BG, H, W*J) [lane order w*J+j] from signed-log displacement
    tables; the layer-1 factor tiles u = w0x*dx / v = w0y*dy + b0 are built
    in VMEM (round 5 — never in HBM).  The output rides the COMPUTE dtype
    (w1.dtype): f32 runs emit f32 (bit-exact with the pre-round-5 interface),
    bf16 production emits bf16 — in-VMEM accumulation is f32 either way, and
    the downstream attention kernel upcasts per tile, so only the HBM stream
    narrows (`SML_TPU_CPB_BIAS_F32=1` restores f32).

    dx: (BG, W*J) f32 [lane order w*J + j];  dy: (BG, H, J) f32;
    w0x/w0y/b0 (dm,), w1 (dm, dm), b1 (dm,), w2 (dm, 1) [one bias head per
    group], b2 (1,) — all in the compute dtype (bf16 in production).
    """
    bg, wj = dx.shape
    _, h, j = dy.shape
    w = wj // j
    dm = w1.shape[0]
    cdt = w1.dtype
    usize = jnp.dtype(cdt).itemsize
    tiling = _pick_tiling(dm, w, h, j, usize, bwd=False)
    assert tiling is not None, "caller must check pallas_cpb_supported first"
    wsplit, n_rb = tiling
    h_rb = h // n_rb
    cw = w // wsplit
    cwj = cw * j
    rp = _pick_rpack(dm, h_rb, cwj, j, usize, bwd=False)

    kernel = functools.partial(_fwd_kernel, h_rb=h_rb, cw=cw, j=j, dm=dm,
                               rpack=rp, cdt=cdt)
    w1_op = w1
    b1_op = b1.reshape(dm, 1)
    w2_op = w2.reshape(1, dm)
    if rp > 1:
        # block-diagonal layer-2/3 weights: each packed row slot applies the
        # same MLP; the off-block zeros contribute exact 0.0 to the f32 sums
        eye = jnp.eye(rp, dtype=w1.dtype)
        w1_op = jnp.kron(eye, w1)                         # (rp*dm, rp*dm)
        b1_op = jnp.tile(b1_op, (rp, 1))                  # (rp*dm, 1)
        w2_op = jnp.kron(eye, w2_op)                      # (rp, rp*dm)

    in_specs = [
        pl.BlockSpec((1, 1, cwj), lambda b, r, s: (b, 0, s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_rb, j), lambda b, r, s: (b, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dm, 1), lambda b, r, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dm, 1), lambda b, r, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dm, 1), lambda b, r, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp * dm, rp * dm), lambda b, r, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp * dm, 1), lambda b, r, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((rp, rp * dm), lambda b, r, s: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda b, r, s: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    out_dtype = jnp.float32 if _BIAS_F32 else cdt
    subword = jnp.dtype(out_dtype).itemsize < 4
    return pl.pallas_call(
        kernel,
        grid=(bg, n_rb, wsplit),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h_rb, cwj), lambda b, r, s: (b, r, s),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, h, wj), out_dtype),
        # sub-word outputs: rows land in an f32 scratch, cast+stored once per
        # block (Mosaic cannot prove row-dynamic sub-pair stores aligned)
        scratch_shapes=[pltpu.VMEM((h_rb, cwj), jnp.float32)] if subword
        else [],
        interpret=interpret,
    )(dx.reshape(bg, 1, wj), dy, w0x.reshape(dm, 1), w0y.reshape(dm, 1),
      b0.reshape(dm, 1), w1_op, b1_op, w2_op, b2.reshape(1, 1))


def _bwd_kernel(dx_ref, dy_ref, w0x_ref, w0y_ref, b0_ref, w1_ref, b1_ref,
                w2_ref, dbias_ref,
                ddx_ref, ddy_ref, dw0x_ref, dw0y_ref, db0_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref, du_scr, *maybe_scr,
                h_rb: int, cw: int, j: int, dm: int, n_rb: int,
                order: str = "rs", cdt=None):
    """Backward: recompute h1/h2 per (row, lane-chunk), accumulate grads in VMEM.

    The u/v factor tiles are rebuilt in VMEM (round 5) and their cotangents
    are PROJECTED in-kernel: du accumulates in a (dm, cw*J) f32 scratch and is
    folded once per block into d_dx = w0x^T du and dw0x = sum_l du * dx; the
    per-row dv fold projects immediately onto d_dy = w0y^T dv_acc, dw0y, db0.
    The (BG, dm, W*J) du / (BG, H, dm, J) dv tensors never exist in HBM.

    Two grid orders (chosen by HBM-traffic estimate in :func:`_cpb_bwd_call`):

    * ``"rs"`` — grid (bg, n_rb, chunks), chunk fastest.  d_dy (per row-block)
      accumulates across a row-block's chunk programs (consecutive revisits;
      zero-init at chunk 0); the du scratch is per-program, folded into
      per-(row-block, chunk) d_dx partials summed over row-blocks outside.
    * ``"sr"`` — grid (bg, chunks, n_rb), row-block fastest.  The du scratch
      accumulates across a chunk's row-block programs (zero-init at row-block
      0) and folds into d_dx ONCE at the last row-block; d_dy becomes
      per-chunk partials (the wsplit axis is folded onto bg) summed outside.

    With the factor streams gone both orders move only KBs; they are kept for
    the equivalence test and because the fold points differ.
    dw*/db* partials accumulate across all of a bg's programs in both orders.
    """
    # sub-word dbias (bf16 production): Mosaic cannot prove row-dynamic
    # sub-pair loads aligned, so the block is upcast ONCE into an f32 scratch
    # and the row loop reads that (round 5, same trick as the forward store)
    dbias_scr = maybe_scr[0] if maybe_scr else None
    if dbias_scr is not None:
        dbias_scr[...] = dbias_ref[0].astype(jnp.float32)

    def load_dbias_row(r):
        if dbias_scr is None:
            return dbias_ref[0, pl.ds(r, 1)].astype(jnp.float32)
        return dbias_scr[pl.ds(r, 1)]

    u = _build_u(dx_ref, w0x_ref, cdt)                   # (dm, cw*J)
    w2 = w2_ref[:].astype(jnp.float32)                   # (1, dm)
    w0x_f = w0x_ref[:].astype(jnp.float32)               # (dm, 1)
    w0y_f = w0y_ref[:].astype(jnp.float32)               # (dm, 1)
    cwj = u.shape[-1]
    ones_row = jnp.ones((1, cwj), jnp.float32) if _MXU_REDUCE else None

    def _lane_sum(x):
        """sum over the lane axis -> (rows, 1): MXU dot against a ones row
        when enabled (frees the VPU, which bounds this kernel), else a VPU
        reduce."""
        if _MXU_REDUCE:
            return jax.lax.dot_general(x, ones_row, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        return jnp.sum(x, axis=1, keepdims=True)

    @pl.when((pl.program_id(1) == 0) & (pl.program_id(2) == 0))
    def _init_weight_grads():
        dw0x_ref[0] = jnp.zeros_like(dw0x_ref[0])
        dw0y_ref[0] = jnp.zeros_like(dw0y_ref[0])
        db0_ref[0] = jnp.zeros_like(db0_ref[0])
        dw1_ref[0] = jnp.zeros_like(dw1_ref[0])
        db1_ref[0] = jnp.zeros_like(db1_ref[0])
        dw2_ref[0] = jnp.zeros_like(dw2_ref[0])
        db2_ref[0] = jnp.zeros_like(db2_ref[0])

    if order == "rs":
        @pl.when(pl.program_id(2) == 0)
        def _init_ddy():
            ddy_ref[0] = jnp.zeros_like(ddy_ref[0])

        du_scr[...] = jnp.zeros_like(du_scr)             # per-program partial
    else:
        @pl.when(pl.program_id(2) == 0)
        def _init_du():
            du_scr[...] = jnp.zeros_like(du_scr)

    def body(r, carry):
        dy_row = dy_ref[0, pl.ds(r, 1)]                  # (1, J) f32
        v_row = _build_v_rows(dy_row, w0y_ref, b0_ref, cdt)   # (dm, J)
        v_rep = pltpu.repeat(v_row, cw, axis=1)          # (dm, cw*J)

        h1 = jnp.maximum(u + v_rep, 0.0)                 # compute dtype (bf16)
        z2 = jnp.dot(w1_ref[:].T, h1,
                     preferred_element_type=jnp.float32) + b1_ref[:]
        h2 = jnp.maximum(z2, 0.0)                        # (dm, cw*J) f32

        dbias = load_dbias_row(r)                        # (1, cw*J) f32

        # layer-3: bias = w2 @ h2 + b2 (lane reductions, no transposes)
        if _MXU_REDUCE:
            # dw2 = sum_l h2 * dbias == h2 @ dbias^T: lane-contracting MXU dot
            dw2_ref[0] += jax.lax.dot_general(
                h2, dbias, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (dm, 1)
        else:
            dw2_ref[0] += jnp.sum(h2 * dbias, axis=1, keepdims=True)
        db2_ref[0] += _lane_sum(dbias)
        dh2 = jax.lax.dot_general(w2, dbias, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dz2 = jnp.where(z2 > 0, dh2, 0.0)

        # layer-2: z2 = w1^T h1 + b1
        dz2_c = dz2.astype(cdt)
        dw1_ref[0] += jax.lax.dot_general(h1, dz2_c, (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        db1_ref[0] += _lane_sum(dz2)
        dh1 = jnp.dot(w1_ref[:], dz2_c, preferred_element_type=jnp.float32)
        # relu mask in f32: the target does not support bf16 comparisons
        dz1 = jnp.where(h1.astype(jnp.float32) > 0, dh1, 0.0)

        # layer-1 column table: accumulate du, fold at the block boundary
        du_scr[...] += dz1
        dv_acc = jnp.zeros((dm, j), jnp.float32)
        for wc in range(cw):                             # fold chunk onto (dm, J)
            dv_acc = dv_acc + dz1[:, wc * j:(wc + 1) * j]
        # layer-1 row table, projected immediately:
        # v_row = w0y * dy_row + b0  =>  d_dy = w0y^T dv, dw0y = sum_j dv*dy, db0
        ddy_row = jax.lax.dot_general(w0y_f, dv_acc, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        if order == "rs":
            ddy_ref[0, pl.ds(r, 1)] += ddy_row.astype(ddy_ref.dtype)
        else:
            # per-(chunk, row-block) partial: every row written exactly once
            ddy_ref[0, pl.ds(r, 1)] = ddy_row.astype(ddy_ref.dtype)
        dy_c = dy_row.astype(cdt).astype(jnp.float32)    # bf16-rounded like fwd
        dw0y_ref[0] += jnp.sum(
            dv_acc * jnp.broadcast_to(dy_c, (dm, j)), axis=1, keepdims=True)
        db0_ref[0] += jnp.sum(dv_acc, axis=1, keepdims=True)
        return carry

    jax.lax.fori_loop(0, h_rb, body, 0)

    def _fold_du():
        du = du_scr[...]                                 # (dm, cw*J) f32
        ddx = jax.lax.dot_general(
            w0x_f, du, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(ddx_ref.dtype)
        if order == "rs":
            ddx_ref[0, 0] = ddx                          # block (1, 1, 1, cw*J)
        else:
            ddx_ref[0] = ddx                             # block (1, 1, cw*J)
        dx_c = dx_ref[0].astype(cdt).astype(jnp.float32)          # (1, cw*J)
        dw0x_ref[0] += jnp.sum(
            du * jnp.broadcast_to(dx_c, du.shape), axis=1, keepdims=True)

    if order == "rs":
        _fold_du()                                       # per-program partial
    else:
        @pl.when(pl.program_id(2) == n_rb - 1)
        def _fold_last():
            _fold_du()


def _pick_bwd_order(n_rb: int, wsplit: int, dm: int, h: int, wj: int, j: int,
                    usize: int) -> str:
    """Grid order with the lower HBM traffic (bytes per bg program group).
    Round 5: with the factor streams folded in-kernel both orders move only
    the thin dx/dy tables and their partials — "rs" refetches dx per
    row-block and round-trips d_dx partials; "sr" refetches dy per chunk and
    round-trips d_dy partials.  bias/dbias dominate and are identical."""
    cost_rs = n_rb * wj * 4 + h * j * 4 \
        + ((2 * n_rb + 1) * wj * 4 if n_rb > 1 else wj * 4)
    cost_sr = wj * 4 + wsplit * h * j * 4 \
        + ((2 * wsplit + 1) * h * j * 4 if wsplit > 1 else h * j * 4)
    return "sr" if cost_sr < cost_rs else "rs"


@functools.partial(jax.jit, static_argnames=("interpret", "order"))
def _cpb_bwd_call(dx, dy, w0x, w0y, b0, w1, b1, w2, dbias, interpret=False,
                  order=None):
    bg, wj = dx.shape
    _, h, j = dy.shape
    w = wj // j
    dm = w1.shape[0]
    cdt = w1.dtype
    usize = jnp.dtype(cdt).itemsize
    tiling = _pick_tiling(dm, w, h, j, usize, bwd=True)
    assert tiling is not None, "caller must check pallas_cpb_supported first"
    wsplit, n_rb = tiling
    h_rb = h // n_rb
    cw = w // wsplit
    cwj = cw * j
    if order is None:
        order = _FORCE_BWD_ORDER or _pick_bwd_order(n_rb, wsplit, dm, h, wj,
                                                    j, usize)
    kernel = functools.partial(_bwd_kernel, h_rb=h_rb, cw=cw, j=j, dm=dm,
                               n_rb=n_rb, order=order, cdt=cdt)
    f32 = jnp.float32
    weight_specs = [
        pl.BlockSpec((dm, 1), lambda b, r, s: (0, 0),        # w0x
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dm, 1), lambda b, r, s: (0, 0),        # w0y
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dm, 1), lambda b, r, s: (0, 0),        # b0
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dm, dm), lambda b, r, s: (0, 0),       # w1
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((dm, 1), lambda b, r, s: (0, 0),        # b1
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dm), lambda b, r, s: (0, 0),        # w2
                     memory_space=pltpu.VMEM),
    ]
    wgrad_specs = [
        pl.BlockSpec((1, dm, 1), lambda b, r, s: (b, 0, 0),  # dw0x
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dm, 1), lambda b, r, s: (b, 0, 0),  # dw0y
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dm, 1), lambda b, r, s: (b, 0, 0),  # db0
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dm, dm), lambda b, r, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dm, 1), lambda b, r, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dm, 1), lambda b, r, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda b, r, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    wgrad_shapes = [
        jax.ShapeDtypeStruct((bg, dm, 1), f32),             # dw0x partials
        jax.ShapeDtypeStruct((bg, dm, 1), f32),             # dw0y partials
        jax.ShapeDtypeStruct((bg, dm, 1), f32),             # db0 partials
        jax.ShapeDtypeStruct((bg, dm, dm), f32),            # dw1 partials
        jax.ShapeDtypeStruct((bg, dm, 1), f32),             # db1 partials
        jax.ShapeDtypeStruct((bg, dm, 1), f32),             # dw2 partials
        jax.ShapeDtypeStruct((bg, 1, 1), f32),              # db2 partials
    ]
    if order == "rs":
        grid = (bg, n_rb, wsplit)                            # chunk fastest
        in_specs = [
            pl.BlockSpec((1, 1, cwj), lambda b, r, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_rb, j), lambda b, r, s: (b, r, 0),
                         memory_space=pltpu.VMEM),
            *weight_specs,
            pl.BlockSpec((1, h_rb, cwj), lambda b, r, s: (b, r, s),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            # d_dx partials per row-block: (b, r, chunk) — never revisited;
            # summed over the row-block axis by XLA below (tiny: n_rb * W*J).
            # The singleton sublane axis keeps the block Mosaic-legal.
            pl.BlockSpec((1, 1, 1, cwj), lambda b, r, s: (b, r, 0, s),
                         memory_space=pltpu.VMEM),
            # d_dy accumulates across a row-block's chunk programs
            pl.BlockSpec((1, h_rb, j), lambda b, r, s: (b, r, 0),
                         memory_space=pltpu.VMEM),
            *wgrad_specs,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bg, n_rb, 1, wj), f32),   # d_dx partials
            jax.ShapeDtypeStruct((bg, h, j), f32),          # d_dy
            *wgrad_shapes,
        ]
    else:
        grid = (bg, wsplit, n_rb)                            # row-block fastest
        in_specs = [
            # dx fetched once per (b, chunk): revisited across row-blocks
            pl.BlockSpec((1, 1, cwj), lambda b, s, r: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_rb, j), lambda b, s, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            # weight specs are constant index maps — order-agnostic
            *weight_specs,
            pl.BlockSpec((1, h_rb, cwj), lambda b, s, r: (b, r, s),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            # d_dx folded once from the du scratch at the last row-block
            pl.BlockSpec((1, 1, cwj), lambda b, s, r: (b, 0, s),
                         memory_space=pltpu.VMEM),
            # d_dy partials per chunk (wsplit folded onto bg; affine index)
            pl.BlockSpec((1, h_rb, j),
                         lambda b, s, r, _ws=wsplit: (b * _ws + s, r, 0),
                         memory_space=pltpu.VMEM),
            # wgrad specs index only on the leading (bg) grid arg — order-agnostic
            *wgrad_specs,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bg, 1, wj), f32),         # d_dx
            jax.ShapeDtypeStruct((bg * wsplit, h, j), f32),  # d_dy partials
            *wgrad_shapes,
        ]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((dm, cwj), f32)]          # du accumulator
        + ([pltpu.VMEM((h_rb, cwj), f32)]                    # dbias upcast
           if jnp.dtype(dbias.dtype).itemsize < 4 else []),
        interpret=interpret,
    )(dx.reshape(bg, 1, wj), dy, w0x.reshape(dm, 1), w0y.reshape(dm, 1),
      b0.reshape(dm, 1), w1, b1.reshape(dm, 1), w2.reshape(1, dm), dbias)
    ddxp, ddyp = outs[:2]
    dw0xp, dw0yp, db0p, dw1p, db1p, dw2p, db2p = outs[2:]
    if order == "rs":
        ddxp = ddxp[:, :, 0]                                # drop sublane axis
        ddx = ddxp[:, 0] if ddxp.shape[1] == 1 else ddxp.sum(axis=1)
        ddy = ddyp
    else:
        ddx = ddxp[:, 0]
        ddy = ddyp if wsplit == 1 else \
            ddyp.reshape(bg, wsplit, h, j).sum(axis=1)
    return (ddx.astype(dx.dtype), ddy.astype(dy.dtype),
            dw0xp.sum(0)[:, 0].astype(w0x.dtype),
            dw0yp.sum(0)[:, 0].astype(w0y.dtype),
            db0p.sum(0)[:, 0].astype(b0.dtype),
            dw1p.sum(0).astype(w1.dtype), db1p.sum(0)[:, 0].astype(b1.dtype),
            dw2p.sum(0).astype(w2.dtype), db2p.sum(0)[0].astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def cpb_bias_trainable(dx, dy, w0x, w0y, b0, w1, b1, w2, b2, interpret=False):
    """Differentiable fused CPB bias: Pallas forward + Pallas backward.

    Same contract as :func:`fused_cpb_bias`; backward recomputes the VMEM
    activations (no residuals) and returns exact grads for all nine inputs
    (incl. the displacement tables and the layer-1 weights, round 5).
    """
    return fused_cpb_bias(dx, dy, w0x, w0y, b0, w1, b1, w2, b2,
                          interpret=interpret)


def _cpb_fwd(dx, dy, w0x, w0y, b0, w1, b1, w2, b2, interpret):
    return fused_cpb_bias(dx, dy, w0x, w0y, b0, w1, b1, w2, b2,
                          interpret=interpret), \
        (dx, dy, w0x, w0y, b0, w1, b1, w2)


def _cpb_bwd(interpret, res, dbias):
    dx, dy, w0x, w0y, b0, w1, b1, w2 = res
    # dbias arrives in the bias's own dtype (compute dtype in production) and
    # feeds the kernel directly — the kernel upcasts per tile; an XLA-side
    # astype here would materialize another 270 MB f32 copy at the 4k shape
    (ddx, ddy, dw0x, dw0y, db0, dw1, db1, dw2,
     db2) = _cpb_bwd_call(dx, dy, w0x, w0y, b0, w1, b1, w2,
                          dbias, interpret=interpret)
    return (ddx, ddy, dw0x, dw0y, db0, dw1, db1, dw2,
            db2.reshape(1).astype(jnp.float32))


cpb_bias_trainable.defvjp(_cpb_fwd, _cpb_bwd)


# ---------------------------------------------------------------------------
# Fused attention epilogue: sim + bias + softmax (+ dropout) + attn @ v in one
# custom-VJP kernel pair, one offset group (== one head) per grid row.
#
# The XLA formulation around the CPB kernel materializes the (B, h, N, J) f32
# chain (sim, attn, their cotangents) in HBM — ~270 MB per tensor per branch at
# the 4k shape.  This pair reads q/k/v/bias once, keeps the chain VMEM-resident,
# and recomputes it in backward (no residuals).  Dropout is an exact {0, 1}
# mask operand generated by XLA threefry (cheap, replays identically in both
# directions); softmax max-subtraction is stop-gradient like the module's XLA
# path (reference models/DeformableAttention2D.py:306-311).
# ---------------------------------------------------------------------------

_ATTN_ROW_BLOCKS = (1024, 512, 256, 128, 64, 32, 16)


def _attn_tile_bytes(nb: int, j: int, dh: int, usize: int, has_mask: bool,
                     bwd: bool, has_bias: bool = True,
                     has_span: bool = False) -> int:
    bias2 = 2 * nb * j * 4 if has_bias else 0
    q2 = 2 * nb * dh * usize
    kv2 = 2 * 2 * j * dh * usize
    mask2 = 2 * nb * j * usize if has_mask else 0
    span2 = 2 * nb * j * 4 if has_span else 0      # iota + validity temporaries
    if not bwd:
        temps = 4 * nb * j * 4
        return bias2 + 2 * q2 + kv2 + mask2 + span2 + temps
    temps = 6 * nb * j * 4
    acc = 2 * 2 * j * dh * 4                       # dk / dv accumulator blocks
    return 2 * bias2 + 3 * q2 + kv2 + mask2 + span2 + acc + temps


def _pick_attn_rowblock(n: int, j: int, dh: int, usize: int, has_mask: bool,
                        has_bias: bool = True, has_span: bool = False):
    """Row block shared by fwd and bwd (so a dropout mask block maps
    identically in both directions): among Mosaic-legal blocks fitting the
    VMEM budget, near-minimal zero-padding of the row axis first (N need not
    divide the block — e.g. N=2500), then the largest block (fewest grid
    programs).  None = no legal tiling (caller falls back to XLA)."""
    if j > _MAX_CHUNK_LANES:
        return None
    fits = [nb for nb in _ATTN_ROW_BLOCKS
            if max(_attn_tile_bytes(nb, j, dh, usize, has_mask, False,
                                    has_bias, has_span),
                   _attn_tile_bytes(nb, j, dh, usize, has_mask, True,
                                    has_bias, has_span))
            <= _VMEM_BUDGET]
    if not fits:
        return None
    npad = {nb: -(-n // nb) * nb for nb in fits}
    m = min(npad.values())
    return max(nb for nb in fits if npad[nb] <= max(m * 1.03, m + 15))


def fused_attention_supported(n: int, j: int, dh: int, usize: int = 2,
                              has_mask: bool = True,
                              has_bias: bool = True,
                              has_span: bool = False) -> bool:
    return _pick_attn_rowblock(n, j, dh, usize, has_mask, has_bias,
                               has_span) is not None


def fused_attention_padding(n: int, j: int, dh: int, usize: int = 2,
                            has_mask: bool = True, has_bias: bool = True,
                            has_span: bool = False):
    """Rows of zero-padding the fused kernel would add at this shape, or None
    when no legal tiling exists.  Callers use this to route the forward-only
    serving path: the pad copies (~0.5 ms on the 230 MB bias at N=2500) erase
    the kernel's win when there is no backward to amortize them."""
    nb = _pick_attn_rowblock(n, j, dh, usize, has_mask, has_bias, has_span)
    if nb is None:
        return None
    return (-(-n // nb) * nb) - n


_NEG_INF = -3.4028234663852886e38  # -finfo(f32).max: torch's masked_fill value


def _span_valid(span_ref, shape):
    """(row_valid, col_valid) (nb, J) bools for this program's row block from
    the per-bag span scalars [row_start, row_end, col_start, col_end) (SMEM).
    Rows/cols index the UNPADDED arrays; zero-pad rows land outside any span."""
    nb, j = shape
    row_off = pl.program_id(1) * nb
    ri = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + row_off
    ci = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    rv = (ri >= span_ref[0, 0]) & (ri < span_ref[0, 1])
    cv = (ci >= span_ref[0, 2]) & (ci < span_ref[0, 3])
    return rv, cv


def _softmax_rows(q, k, bias, valid=None):
    """(nb, J) attention probabilities, f32, max-shifted like the module.
    ``bias`` may be None (pure softmax attention, e.g. the Nystrom chains).
    ``valid`` = (row_valid, col_valid) applies the module's masked semantics
    exactly: invalid columns are filled with -f32max BEFORE the shift (their
    probability underflows to exactly 0, as in the XLA ``where``), and fully
    invalid rows become a constant row (uniform probabilities over ALL
    columns — identical to softmax over an all--f32max row)."""
    sim = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if bias is not None:
        sim = sim + bias
    if valid is not None:
        rv, cv = valid
        sim = jnp.where(cv, sim, _NEG_INF)
        sim = jnp.where(rv, sim, 0.0)
    sim = sim - jnp.max(sim, axis=1, keepdims=True)
    p = jnp.exp(sim)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _dropout_mult(mask_ref, seed_ref, shape, keep_inv: float, keep_prob: float):
    """Per-element multiplier {0, 1/keep}: from an explicit {0,1} mask operand
    (interpret-safe, exact-match testable) or from the on-chip PRNG seeded by
    (key words, program ids) — bit-identical in fwd and bwd because both
    directions share the same grid and row-block size."""
    if mask_ref is not None:
        return mask_ref[0].astype(jnp.float32) * keep_inv
    # Mosaic caps prng_seed at 2 words: mix the linear program index into the
    # key with distinct odd constants (wrapping int32 arithmetic)
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + pid * jnp.int32(-1640531527),
                    seed_ref[1] + pid * jnp.int32(-1028477379))
    bits = pltpu.prng_random_bits(shape)                 # int32
    u = (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / (1 << 23))
    return jnp.where(u < keep_prob, keep_inv, 0.0)


def _attn_fwd_kernel(*refs, keep_inv: float, keep_prob: float, has_mask: bool,
                     has_seed: bool, has_bias: bool = True,
                     has_span: bool = False):
    refs = list(refs)
    seed_ref = refs.pop(0) if has_seed else None
    span_ref = refs.pop(0) if has_span else None
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    bias_ref = refs.pop(0) if has_bias else None
    mask_ref = refs.pop(0) if has_mask else None
    out_ref = refs.pop(0)
    q = q_ref[0]
    valid = _span_valid(span_ref, (q.shape[0], k_ref.shape[1])) \
        if has_span else None
    attn = _softmax_rows(q, k_ref[0],
                         bias_ref[0] if has_bias else None, valid)
    if has_mask or has_seed:
        attn = attn * _dropout_mult(mask_ref, seed_ref, attn.shape,
                                    keep_inv, keep_prob)
    out = jnp.dot(attn.astype(v_ref.dtype), v_ref[0],
                  preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _attn_bwd_kernel(*refs, keep_inv: float, keep_prob: float, has_mask: bool,
                     has_seed: bool, has_bias: bool = True,
                     has_span: bool = False):
    refs = list(refs)
    seed_ref = refs.pop(0) if has_seed else None
    span_ref = refs.pop(0) if has_span else None
    q_ref, k_ref, v_ref = refs[:3]
    refs = refs[3:]
    bias_ref = refs.pop(0) if has_bias else None
    mask_ref = refs.pop(0) if has_mask else None
    dout_ref, dq_ref, dk_ref, dv_ref = refs[:4]
    dbias_ref = refs[4] if has_bias else None

    @pl.when(pl.program_id(1) == 0)
    def _init_kv_grads():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    valid = _span_valid(span_ref, (q.shape[0], k.shape[0])) \
        if has_span else None
    attn = _softmax_rows(q, k, bias_ref[0] if has_bias else None,
                         valid)                                    # recompute
    if has_mask or has_seed:
        m = _dropout_mult(mask_ref, seed_ref, attn.shape, keep_inv, keep_prob)
        attn_d = attn * m
    else:
        attn_d = attn
    dout = dout_ref[0]

    # out = attn_d @ v
    dv_ref[0] += jax.lax.dot_general(attn_d.astype(v.dtype), dout,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dattn = jax.lax.dot_general(dout, v, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    if has_mask or has_seed:
        dattn = dattn * m
    # softmax vjp (max shift is stop-gradient)
    dsim = attn * (dattn - jnp.sum(dattn * attn, axis=1, keepdims=True))
    if has_span:
        # the XLA path's where(valid, sim, -f32max) blocks the cotangent at
        # every masked position (incl. whole invalid rows, whose uniform
        # probabilities are where-constants there)
        rv, cv = valid
        dsim = jnp.where(rv & cv, dsim, 0.0)
    if has_bias:
        dbias_ref[0] = dsim.astype(dbias_ref.dtype)
    dsim_c = dsim.astype(q.dtype)
    dq_ref[0] = jnp.dot(dsim_c, k,
                        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(dsim_c, q, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)


def _pad_rows(t, npad):
    n = t.shape[1]
    if n == npad:
        return t
    return jnp.pad(t, ((0, 0), (0, npad - n)) + ((0, 0),) * (t.ndim - 2))


def _attn_inputs(q, k, v, bias, mask, seed, span, nb, npad):
    """(operands, specs) for the shared input layout [seed?] [span?] q k v
    [bias?] [mask?] — padded on the row axis; k/v blocks are revisited across
    row programs.  ``bias=None`` = pure softmax attention (no bias operand);
    ``span`` (BG, 4) int32 = per-bag [row_start, row_end, col_start, col_end)
    validity intervals, read from SMEM."""
    j = k.shape[1]
    dh = q.shape[-1]
    ins, specs = [], []
    if seed is not None:
        ins.append(seed)
        specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if span is not None:
        ins.append(span)
        specs.append(pl.BlockSpec((1, 4), lambda b, r: (b, 0),
                                  memory_space=pltpu.SMEM))
    ins.append(_pad_rows(q, npad))
    specs.append(pl.BlockSpec((1, nb, dh), lambda b, r: (b, r, 0),
                              memory_space=pltpu.VMEM))
    ins.extend([k, v])
    specs.append(pl.BlockSpec((1, j, dh), lambda b, r: (b, 0, 0),
                              memory_space=pltpu.VMEM))
    specs.append(pl.BlockSpec((1, j, dh), lambda b, r: (b, 0, 0),
                              memory_space=pltpu.VMEM))
    if bias is not None:
        ins.append(_pad_rows(bias, npad))
        specs.append(pl.BlockSpec((1, nb, j), lambda b, r: (b, r, 0),
                                  memory_space=pltpu.VMEM))
    if mask is not None:
        ins.append(_pad_rows(mask, npad))
        specs.append(pl.BlockSpec((1, nb, j), lambda b, r: (b, r, 0),
                                  memory_space=pltpu.VMEM))
    return ins, specs


@functools.partial(jax.jit, static_argnames=("keep_prob", "interpret"))
def _fused_attn_fwd_call(q, k, v, bias, mask, seed, span, keep_prob,
                         interpret=False):
    bg, n, dh = q.shape
    j = k.shape[1]
    usize = jnp.dtype(q.dtype).itemsize
    nb = _pick_attn_rowblock(n, j, dh, usize, mask is not None,
                             bias is not None, span is not None)
    assert nb is not None, "caller must check fused_attention_supported first"
    npad = -(-n // nb) * nb
    ins, in_specs = _attn_inputs(q, k, v, bias, mask, seed, span, nb, npad)
    kernel = functools.partial(_attn_fwd_kernel, keep_inv=1.0 / keep_prob,
                               keep_prob=keep_prob, has_mask=mask is not None,
                               has_seed=seed is not None,
                               has_bias=bias is not None,
                               has_span=span is not None)
    out = pl.pallas_call(
        kernel,
        grid=(bg, npad // nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nb, dh), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, npad, dh), q.dtype),
        interpret=interpret,
    )(*ins)
    return out[:, :n] if npad != n else out


@functools.partial(jax.jit, static_argnames=("keep_prob", "interpret"))
def _fused_attn_bwd_call(q, k, v, bias, mask, seed, span, dout, keep_prob,
                         interpret=False):
    bg, n, dh = q.shape
    j = k.shape[1]
    usize = jnp.dtype(q.dtype).itemsize
    has_bias = bias is not None
    nb = _pick_attn_rowblock(n, j, dh, usize, mask is not None, has_bias,
                             span is not None)
    assert nb is not None, "caller must check fused_attention_supported first"
    npad = -(-n // nb) * nb
    ins, in_specs = _attn_inputs(q, k, v, bias, mask, seed, span, nb, npad)
    ins.append(_pad_rows(dout, npad))
    in_specs.append(pl.BlockSpec((1, nb, dh), lambda b, r: (b, r, 0),
                                 memory_space=pltpu.VMEM))
    kernel = functools.partial(_attn_bwd_kernel, keep_inv=1.0 / keep_prob,
                               keep_prob=keep_prob, has_mask=mask is not None,
                               has_seed=seed is not None, has_bias=has_bias,
                               has_span=span is not None)
    f32 = jnp.float32
    out_specs = [
        pl.BlockSpec((1, nb, dh), lambda b, r: (b, r, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, j, dh), lambda b, r: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, j, dh), lambda b, r: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bg, npad, dh), q.dtype),   # dq
        jax.ShapeDtypeStruct((bg, j, dh), f32),          # dk
        jax.ShapeDtypeStruct((bg, j, dh), f32),          # dv
    ]
    if has_bias:
        out_specs.append(pl.BlockSpec((1, nb, j), lambda b, r: (b, r, 0),
                                      memory_space=pltpu.VMEM))
        # dbias rides the bias's dtype (compute dtype in production): the
        # softmax VJP is f32 in-kernel, only the HBM stream narrows
        out_shape.append(jax.ShapeDtypeStruct((bg, npad, j), bias.dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(bg, npad // nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)
    dq, dk, dv = outs[:3]
    dbias = outs[3] if has_bias else None
    if npad != n:
        dq = dq[:, :n]
        if has_bias:
            dbias = dbias[:, :n]
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def deform_attention_trainable(q, k, v, bias, mask=None, seed=None, span=None,
                               keep_prob=1.0, interpret=False):
    """out (BG, N, dh) = dropout(softmax(mask(q @ k^T + bias))) @ v, fused.

    q (BG, N, dh) already scaled; k/v (BG, J, dh); bias (BG, N, J) in any
    float dtype — upcast to f32 per tile in-kernel; dbias is returned in the
    same dtype (the
    CPB kernel's output reshaped — a free relayout) or None for pure softmax
    attention (the Nystrom landmark chains use this: no bias operand, no
    dbias output).  Dropout comes from at most one of: ``mask``, a {0, 1}
    float tensor (BG, N, J) of KEPT positions (interpret-safe, exact), or
    ``seed``, a (2,) int32 key feeding the on-chip PRNG (zero HBM traffic;
    TPU only).  ``span`` (BG, 4) int32 = per-bag [row_start, row_end,
    col_start, col_end) validity intervals — the fused form of the masked
    module's ``where(row & col, sim, -f32max)`` for INTERVAL masks (bucketed
    bags): invalid columns get probability exactly 0; fully invalid rows are
    uniform over all columns; the cotangent is blocked at every masked
    position.  The interval scalars ride SMEM, so masking costs no HBM
    traffic.  Backward recomputes the chain (no residuals) and returns exact
    grads for q, k, v (and bias when given).
    """
    assert mask is None or seed is None
    return _fused_attn_fwd_call(q, k, v, bias, mask, seed, span, keep_prob,
                                interpret=interpret)


def _deform_attn_fwd(q, k, v, bias, mask, seed, span, keep_prob, interpret):
    out = _fused_attn_fwd_call(q, k, v, bias, mask, seed, span, keep_prob,
                               interpret=interpret)
    return out, (q, k, v, bias, mask, seed, span)


def _deform_attn_bwd(keep_prob, interpret, res, dout):
    q, k, v, bias, mask, seed, span = res
    dq, dk, dv, dbias = _fused_attn_bwd_call(q, k, v, bias, mask, seed, span,
                                             dout.astype(q.dtype), keep_prob,
                                             interpret=interpret)
    # dbias is already None when bias is None (no bias operand in the kernel)
    dmask = None if mask is None else jnp.zeros_like(mask)
    dseed = None if seed is None else np.zeros(seed.shape, jax.dtypes.float0)
    dspan = None if span is None else np.zeros(span.shape, jax.dtypes.float0)
    return dq, dk, dv, dbias, dmask, dseed, dspan


deform_attention_trainable.defvjp(_deform_attn_fwd, _deform_attn_bwd)


def fused_bias_attention_weights(q, k, dx, dy, w0x, w0y, b0, w1, b1, w2, b2,
                                 interpret=False):
    """attn (BG, N, J): fused-CPB bias kernel + XLA sim/softmax.

    q (BG, N, D) already scaled; k (BG, J, D); displacement tables/params as
    in :func:`fused_cpb_bias`.  N = H*W with query index iy*W + ix.
    """
    bg, n, d = q.shape
    _, h, j = dy.shape
    w = n // h
    bias = fused_cpb_bias(dx, dy, w0x, w0y, b0, w1, b1, w2, b2,
                          interpret=interpret)
    bias = bias.reshape(bg, h * w, j).astype(jnp.float32)  # (BG, N, J): XLA reshape
    sim = jnp.einsum("bnd,bjd->bnj", q.astype(jnp.float32),
                     k.astype(jnp.float32)) + bias
    sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    return jax.nn.softmax(sim, axis=-1)
