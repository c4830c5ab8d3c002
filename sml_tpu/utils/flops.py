"""Analytic FLOP counts for the Pallas kernels (invisible to XLA cost analysis).

XLA's ``compiled.cost_analysis()`` cannot see inside ``pallas_call``, so any MFU
computed from it UNDER-counts as math moves into the fused kernels — the
headline bench number would otherwise punish exactly the optimizations that
make the step fast.  This module hand-counts the useful (model) FLOPs that the
deformpathomic Pallas kernels execute per train/eval step, mirroring the same
routing gates the model uses (``pallas_cpb_supported``,
``fused_attention_padding``), so the count is zero whenever a shape falls back
to XLA (where cost analysis DOES see the math — no double counting).

Counting convention: useful model FLOPs only (the standard MFU convention) —
kernel-internal row padding and the block-diagonal rpack zero lanes are not
counted.  Derivations below; the byte-level A100 roofline lives in
``benchmarks/a100_roofline.md``.

Reference geometry (reference ``models/DeformableAttention2D.py:186-213``,
``models/DeformCrossTransMIL.py:45-54``): dim=128, heads=groups=8,
dim_head=64, CPB MLP width dm=dim//4=32, offset conv kernel 6 / stride 4 /
pad 1, two branches (tumor/immune).
"""

from __future__ import annotations

import math
from typing import Dict


def deform_grid(n: int, downsample: int = 4, kernel: int = 6) -> Dict[str, int]:
    """Query/kv grid sizes for an N-token bag (model pads N to side**2)."""
    side = int(math.ceil(math.sqrt(n)))
    pad = (kernel - downsample) // 2
    kv_side = (side + 2 * pad - kernel) // downsample + 1
    return {"side": side, "n_grid": side * side, "j": kv_side * kv_side}


def _cpb_per_pair(dm: int, training: bool, executed: bool) -> float:
    """FLOPs per (query position, kv position) displacement pair.

    Forward (``_fwd_kernel``): h1 = relu(u + v_rep) [2*dm]; layer-2 matmul
    w1^T @ h1 [2*dm*dm] + bias + relu [2*dm]; layer-3 w2 @ h2 [2*dm] + b2 [1].
    (The layer-1 2->dm projection is folded into the u/v factor tables built
    OUTSIDE the kernel — XLA-visible, not counted here.)

    Backward model math (``_bwd_kernel``): dw2 [2*dm]; db2 [1]; dh2 outer
    [2*dm]; relu mask [dm]; dw1 contraction [2*dm*dm]; db1 [dm];
    dh1 = w1 @ dz2 [2*dm*dm]; relu masks [2*dm]; du += [dm]; dv fold [dm].
    ``executed=True`` adds the recompute of h1/z2/h2 [2*dm*dm + 4*dm] the
    kernel actually runs (custom-VJP keeps no residuals); the standard MFU
    convention EXCLUDES rematerialization, so ``executed=False`` is what
    feeds the reported mfu_total.
    """
    fwd = 2 * dm * dm + 6 * dm + 1
    bwd = 4 * dm * dm + 9 * dm + 1
    if executed:
        bwd += 2 * dm * dm + 4 * dm
    return fwd + (bwd if training else 0)


def _epilogue_per_pair(dh: int, training: bool, executed: bool) -> float:
    """FLOPs per (query token, kv position) pair of the fused attention
    epilogue (``_attn_fwd_kernel``/``_attn_bwd_kernel``).

    Forward: q @ k^T [2*dh]; bias add [1]; softmax (max, sub, exp, sum, div)
    [~5]; dropout mult [1]; attn @ v [2*dh].
    Backward model math: dv = p^T @ dout [2*dh]; dp = dout @ v^T [2*dh];
    softmax backward [~4]; dq = ds @ k [2*dh]; dk = ds^T @ q [2*dh].
    ``executed=True`` adds the in-kernel forward recompute [2*dh + 7].
    """
    fwd = 4 * dh + 7
    bwd = 8 * dh + 4
    if executed:
        bwd += 2 * dh + 7
    return fwd + (bwd if training else 0)


def deformpathomic_pallas_flops(batch_size: int, fixdim: int, *,
                                dim: int = 128, heads: int = 8, groups: int = 8,
                                dim_head: int = 64, n_branches: int = 2,
                                training: bool = True,
                                dropout_active: bool = True,
                                itemsize: int = 2,
                                executed: bool = False) -> float:
    """Per-step FLOPs INSIDE Pallas kernels for the flagship deformpathomic
    model, honoring the model's own fused-vs-XLA routing gates.  Returns 0.0
    for configurations where every kernel falls back to XLA.

    ``executed=False`` (default) counts model FLOPs — the standard MFU
    convention, excluding the custom-VJP recompute; ``executed=True`` counts
    what the hardware actually runs (recompute included).
    """
    from sml_tpu.ops.pallas.deform_attn import (fused_attention_padding,
                                                pallas_cpb_supported)

    g = deform_grid(fixdim)
    n_grid, j = g["n_grid"], g["j"]
    dm = dim // 4
    w = g["side"]

    total = 0.0
    # CPB kernel: pairs = B * groups * n_grid * J per branch
    if heads == groups and pallas_cpb_supported(dm, w, w, j, itemsize):
        pairs_cpb = batch_size * groups * n_grid * j
        total += n_branches * pairs_cpb * _cpb_per_pair(dm, training, executed)

    # fused epilogue: pairs = B * heads * n_grid * J per branch; fused in
    # training whenever a padding choice exists, on the serving path only
    # when pad_rows == 0 (sml_tpu/ops/deformable.py:459-476)
    pad_rows = fused_attention_padding(n_grid, j, dim_head, itemsize,
                                       training and dropout_active)
    if pad_rows is not None and (training or pad_rows == 0):
        pairs_attn = batch_size * heads * n_grid * j
        total += n_branches * pairs_attn * _epilogue_per_pair(dim_head, training,
                                                             executed)
    return total


def a100_roofline_bags_per_sec(batch_size: int, fixdim: int,
                               bw_bytes_per_sec: float = 1.7e12) -> Dict[str, float]:
    """Bytes-roofline bound on the PyTorch reference's A100 train-step rate at
    this shape — deliberately OPTIMISTIC for the reference (perfect bandwidth,
    zero launch overhead, CPB traffic only).  Full byte accounting in
    ``benchmarks/a100_roofline.md``; anchor: 154 GB/step at B=8 x N=2500
    (23.04M displacement pairs per branch), scaled by the pair count.

    Returns the perfect-bandwidth bound and the realistic band (56-80% of
    perfect: unfused elementwise chains sustain 60-80% of peak bandwidth and
    non-CPB work adds ~20%).
    """
    g = deform_grid(fixdim)
    pairs = batch_size * 8 * g["n_grid"] * g["j"]          # per branch
    anchor_pairs = 8 * 8 * 2500 * 144                      # B=8, N=2500
    bytes_per_step = 154e9 * pairs / anchor_pairs
    perfect = batch_size / (bytes_per_step / bw_bytes_per_sec)
    return {"perfect": perfect,
            "realistic_lo": 0.565 * perfect,
            "realistic_hi": 0.80 * perfect}
