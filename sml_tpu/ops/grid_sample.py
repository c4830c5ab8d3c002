"""Bilinear grid sampling with exact PyTorch ``F.grid_sample`` semantics, in gather form.

The reference's deformable attention leans on the cuDNN ``grid_sample`` kernel
(reference ``models/DeformableAttention2D.py:268-271``); on TPU the same op is a pair of
gathers + a lerp, which XLA fuses into the surrounding attention.  We reproduce
``mode='bilinear', padding_mode='zeros'`` for both ``align_corners`` conventions —
corner semantics must match exactly or downstream C-index parity silently drifts.

Coordinate convention (same as torch): ``grid[..., 0]`` is x (width index),
``grid[..., 1]`` is y (height index), both normalized to [-1, 1].

Layouts are TPU-native channels-last: input ``(N, H, W, C)``, grid ``(N, Hg, Wg, 2)``,
output ``(N, Hg, Wg, C)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(img_flat: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
               h: int, w: int) -> jnp.ndarray:
    """Gather pixels at integer (iy, ix) with zero padding for out-of-bounds.

    img_flat: (N, H*W, C); iy/ix: (N, P) int32. Returns (N, P, C).
    """
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy_c = jnp.clip(iy, 0, h - 1)
    ix_c = jnp.clip(ix, 0, w - 1)
    flat_idx = iy_c * w + ix_c                                   # (N, P)
    out = jnp.take_along_axis(img_flat, flat_idx[..., None], axis=1)
    return out * valid[..., None].astype(img_flat.dtype)


def grid_sample_2d(inp: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sample ``inp`` (N,H,W,C) at ``grid`` (N,Hg,Wg,2); zeros padding.

    Exact parity with ``torch.nn.functional.grid_sample(inp_nchw, grid,
    mode='bilinear', padding_mode='zeros', align_corners=align_corners)``.
    """
    n, h, w, c = inp.shape
    gh, gw = grid.shape[1], grid.shape[2]
    x = _unnormalize(grid[..., 0].reshape(n, -1), w, align_corners)   # (N, P)
    y = _unnormalize(grid[..., 1].reshape(n, -1), h, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0          # weight for x1 side
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    img_flat = inp.reshape(n, h * w, c)
    ix0, iy0 = x0.astype(jnp.int32), y0.astype(jnp.int32)
    ix1, iy1 = x1.astype(jnp.int32), y1.astype(jnp.int32)

    v00 = _gather_2d(img_flat, iy0, ix0, h, w)
    v01 = _gather_2d(img_flat, iy0, ix1, h, w)
    v10 = _gather_2d(img_flat, iy1, ix0, h, w)
    v11 = _gather_2d(img_flat, iy1, ix1, h, w)

    out = (v00 * (wy0 * wx0)[..., None] + v01 * (wy0 * wx1)[..., None]
           + v10 * (wy1 * wx0)[..., None] + v11 * (wy1 * wx1)[..., None])
    return out.reshape(n, gh, gw, c)


def grid_sample_2d_matmul(inp: jnp.ndarray, grid: jnp.ndarray,
                          align_corners: bool = False) -> jnp.ndarray:
    """``grid_sample_2d`` restructured as two separable one-hot matmuls.

    Same bilinear/zeros math (weights and taps identical; only the
    accumulation order differs: rows first, then columns), but the sampling
    becomes ``A_y @ img`` followed by a lane reduction with ``A_x`` — and AD
    of a matmul is a matmul, so the backward's d_inp is an MXU contraction
    instead of the XLA scatter-add that ``take_along_axis`` transposes to
    (TPU scatters serialize; this is the deformable branch's grid-sample
    backward cost).  Intermediates are small at model shapes ((B*g, P, H)
    one-hot row matrices and a (B*g, P, W, C) row-gathered slab).

    Weights/one-hots ride in f32 when ``inp`` is f32 (oracle parity) and in
    ``inp.dtype`` otherwise (bf16 MXU path, matching the branch compute dtype).
    """
    n, h, w, c = inp.shape
    gh, gw = grid.shape[1], grid.shape[2]
    x = _unnormalize(grid[..., 0].reshape(n, -1), w, align_corners)   # (N, P)
    y = _unnormalize(grid[..., 1].reshape(n, -1), h, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    adt = inp.dtype if inp.dtype != jnp.float32 else jnp.float32

    def taps(i0, w0, w1, size):
        """(N, P, size) two-tap row matrix: w0 at i0, w1 at i0+1, 0 out of range."""
        idx = i0.astype(jnp.int32)
        iota = jnp.arange(size, dtype=jnp.int32)
        oh0 = (idx[..., None] == iota).astype(adt)
        oh1 = ((idx + 1)[..., None] == iota).astype(adt)
        return oh0 * w0[..., None].astype(adt) + oh1 * w1[..., None].astype(adt)

    a_y = taps(y0, wy0, wy1, h)                                   # (N, P, H)
    a_x = taps(x0, wx0, wx1, w)                                   # (N, P, W)

    # rows: (N, P, H) @ (N, H, W*C) -> (N, P, W, C)
    rows = jnp.einsum("nph,nhwc->npwc", a_y, inp.astype(adt),
                      preferred_element_type=jnp.float32)
    # columns: weighted lane reduction over W
    out = jnp.einsum("npw,npwc->npc", a_x.astype(jnp.float32), rows,
                     preferred_element_type=jnp.float32)
    return out.reshape(n, gh, gw, c).astype(inp.dtype)


def grid_sample_1d(inp: jnp.ndarray, grid: jnp.ndarray,
                   align_corners: bool = False) -> jnp.ndarray:
    """Linear sample ``inp`` (N,L,C) at normalized coords ``grid`` (N,P); zeros padding.

    CONSCIOUS FIX of the reference's ``grid_sample_1d`` (reference
    ``models/DeformableAttention1D.py:36-43``): the reference lifts 1-D to 2-D
    ``F.grid_sample`` but places the coordinate in the x slot of a width-1 image, so
    it actually returns ``midpoint(seq) * (1 - |g|/2)`` — a constant midpoint scaled
    by the offset, never sampling along the sequence (verified empirically;
    emulated in ``tests/test_reference_parity.py``).  This implementation samples
    along the sequence, the evident intent.
    """
    n, l, c = inp.shape
    x = _unnormalize(grid, l, align_corners)                    # (N, P)
    x0 = jnp.floor(x)
    x1 = x0 + 1.0
    w1 = x - x0
    w0 = 1.0 - w1

    ix0 = x0.astype(jnp.int32)
    ix1 = x1.astype(jnp.int32)

    def gather(ix):
        valid = (ix >= 0) & (ix < l)
        ix_c = jnp.clip(ix, 0, l - 1)
        out = jnp.take_along_axis(inp, ix_c[..., None], axis=1)
        return out * valid[..., None].astype(inp.dtype)

    return gather(ix0) * w0[..., None] + gather(ix1) * w1[..., None]
