"""Fused CPB-bias+attention Pallas kernel vs the XLA path (interpret mode on CPU).

Round 5: the kernels take the thin signed-log displacement tables dx/dy plus
the layer-1 weights (w0x, w0y, b0) and build the u/v factor tiles in VMEM.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.ops.deformable import CPB2D, DeformCrossAttention2D
from sml_tpu.ops.pallas.deform_attn import fused_bias_attention_weights


def _mlp_params(rng, dm):
    w0x = rng.normal(size=(dm,)).astype(np.float32) * 0.3
    w0y = rng.normal(size=(dm,)).astype(np.float32) * 0.3
    b0 = rng.normal(size=(dm,)).astype(np.float32) * 0.1
    w1 = rng.normal(size=(dm, dm)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(dm,)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(dm, 1)).astype(np.float32) * 0.3
    b2 = rng.normal(size=(1,)).astype(np.float32) * 0.1
    return w0x, w0y, b0, w1, b1, w2, b2


def test_kernel_matches_reference_math():
    """Direct kernel check against a dense numpy evaluation."""
    rng = np.random.default_rng(0)
    bg, d, hgt, wid, j, dm = 4, 8, 6, 5, 4, 16
    n = hgt * wid
    q = rng.normal(size=(bg, n, d)).astype(np.float32)
    k = rng.normal(size=(bg, j, d)).astype(np.float32)
    # displacement tables; dx lane order = w*J + j (j fastest)
    dx4 = rng.normal(size=(bg, wid, j)).astype(np.float32)
    dx = dx4.reshape(bg, wid * j)
    dy = rng.normal(size=(bg, hgt, j)).astype(np.float32)
    w0x, w0y, b0, w1, b1, w2, b2 = _mlp_params(rng, dm)

    attn = np.asarray(fused_bias_attention_weights(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(dx), jnp.asarray(dy),
        jnp.asarray(w0x), jnp.asarray(w0y), jnp.asarray(b0),
        jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2),
        interpret=True))

    # dense oracle: rebuild the layer-1 factor tables, then the MLP
    u4 = w0x[None, :, None, None] * dx4[:, None, :, :]        # (bg, dm, W, J)
    v = w0y[None, None, :, None] * dy[:, :, None, :] \
        + b0[None, None, :, None]                             # (bg, H, dm, J)
    for b in range(bg):
        for iy in range(hgt):
            for ix in range(wid):
                h1 = np.maximum(u4[b, :, ix, :] + v[b, iy], 0)    # (dm, J)
                h2 = np.maximum(w1.T @ h1 + b1[:, None], 0)       # (dm, J)
                bias = (w2[:, 0] @ h2) + b2[0]                    # (J,)
                sim = k[b] @ q[b, iy * wid + ix] + bias           # (J,)
                e = np.exp(sim - sim.max())
                expect = e / e.sum()
                np.testing.assert_allclose(attn[b, iy * wid + ix], expect,
                                           rtol=1e-4, atol=1e-5,
                                           err_msg=f"b={b} iy={iy} ix={ix}")


def test_module_pallas_path_matches_xla_path():
    """DeformCrossAttention2D with use_pallas (interpret) == the XLA formulation."""
    rng = np.random.default_rng(1)
    b, n, c = 2, 64, 16
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

    common = dict(dim=c, dim_head=8, heads=4, offset_groups=4, dropout=0.0)
    ref_mod = DeformCrossAttention2D(**common)
    pal_mod = DeformCrossAttention2D(**common, use_pallas=True,
                                     pallas_interpret=True)

    params = ref_mod.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)
    out_ref = ref_mod.apply(params, x1, x2, deterministic=True)
    out_pal = pal_mod.apply(params, x1, x2, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)

    # vgrid plumbing unaffected
    o_r, vg_r = ref_mod.apply(params, x1, x2, return_vgrid=True, deterministic=True)
    o_p, vg_p = pal_mod.apply(params, x1, x2, return_vgrid=True, deterministic=True)
    np.testing.assert_allclose(np.asarray(vg_p), np.asarray(vg_r), atol=0)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_r), rtol=1e-4,
                               atol=1e-5)


def test_cpb_factors_consistent_with_call():
    """factors() displacement tables must reproduce __call__'s bias exactly."""
    rng = np.random.default_rng(2)
    b, g, hgt, wid, j, dm = 2, 4, 5, 5, 6, 16
    x_coords = jnp.asarray(np.linspace(-1, 1, wid).astype(np.float32))
    y_coords = jnp.asarray(np.linspace(-1, 1, hgt).astype(np.float32))
    grid_kv = jnp.asarray(rng.uniform(-1, 1, size=(b * g, j, 2)).astype(np.float32))

    mod = CPB2D(dim=dm, heads=g, offset_groups=g)
    params = mod.init(jax.random.PRNGKey(0), x_coords, y_coords, grid_kv, b)
    bias = np.asarray(mod.apply(params, x_coords, y_coords, grid_kv, b))

    dx, dy, w0x, w0y, b0, w1, b1, w2, b2 = mod.apply(
        params, x_coords, y_coords, grid_kv, method=CPB2D.factors)
    dx4 = np.asarray(dx).reshape(b * g, wid, j)     # lane order w*J + j
    dy = np.asarray(dy)
    w0x, w0y, b0 = np.asarray(w0x), np.asarray(w0y), np.asarray(b0)
    u4 = w0x[None, :, None, None] * dx4[:, None, :, :]        # (bg, dm, W, J)
    v = w0y[None, None, :, None] * dy[:, :, None, :] \
        + b0[None, None, :, None]                             # (bg, H, dm, J)
    rebuilt = np.zeros((b * g, hgt * wid, j))
    for bb in range(b * g):
        for iy in range(hgt):
            for ix in range(wid):
                h1 = np.maximum(u4[bb, :, ix, :] + v[bb, iy], 0)
                h2 = np.maximum(np.asarray(w1).T @ h1 + np.asarray(b1)[:, None], 0)
                rebuilt[bb, iy * wid + ix] = (np.asarray(w2)[:, 0] @ h2
                                              + np.asarray(b2)[0])
    np.testing.assert_allclose(bias, rebuilt.reshape(b, g, -1, j), rtol=1e-4,
                               atol=1e-5)


def test_pallas_cpb_support_predicate():
    """Shape gate = the tiling picker (shared constants, round-2 advice): all
    production shapes now tile — 16k included, via grid-streamed u chunks; a
    shape whose minimal legal chunk still exceeds lane caps does not."""
    from sml_tpu.ops.pallas.deform_attn import pallas_cpb_supported

    assert pallas_cpb_supported(32, 50, 50, 144)     # fixdim 2500
    assert pallas_cpb_supported(32, 64, 64, 256)     # fixdim 4096
    assert pallas_cpb_supported(32, 96, 96, 576)     # fixdim 9216
    assert pallas_cpb_supported(32, 128, 128, 1024)  # fixdim 16384 (round 3)
    # J alone beyond the lane cap: no legal chunk exists
    assert not pallas_cpb_supported(32, 128, 128, 16384)


def test_cpb2d_pallas_falls_back_on_unsupported_shape(monkeypatch):
    """impl='pallas' on a shape the kernel can't tile must route to the XLA
    formulation (same bias values) instead of failing to lower."""
    from sml_tpu.ops.pallas import deform_attn

    rng = np.random.default_rng(3)
    b, g, hgt, wid, j, dm = 1, 2, 5, 5, 6, 16
    x_coords = jnp.asarray(np.linspace(-1, 1, wid).astype(np.float32))
    y_coords = jnp.asarray(np.linspace(-1, 1, hgt).astype(np.float32))
    grid_kv = jnp.asarray(rng.uniform(-1, 1, size=(b * g, j, 2)).astype(np.float32))

    naive = CPB2D(dim=dm, heads=g, offset_groups=g, impl="naive")
    params = naive.init(jax.random.PRNGKey(0), x_coords, y_coords, grid_kv, b)
    expect = np.asarray(naive.apply(params, x_coords, y_coords, grid_kv, b))

    # force "unsupported" for this tiny shape; the kernel must NOT be invoked
    monkeypatch.setattr(deform_attn, "_HARD_VMEM", 1)

    def boom(*a, **k):
        raise AssertionError("pallas kernel called despite unsupported shape")

    monkeypatch.setattr(deform_attn, "cpb_bias_trainable", boom)
    pallas_mod = CPB2D(dim=dm, heads=g, offset_groups=g, impl="pallas")
    got = np.asarray(pallas_mod.apply(params, x_coords, y_coords, grid_kv, b))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dm,h,w,j", [
    (16, 16, 8, 128),   # clean 8-aligned packed path (rpack=4, two groups)
    (16, 10, 8, 128),   # packed path + 2-row single-row tail
    (64, 16, 8, 128),   # rpack capped at 2 (r*dm <= 128)
])
def test_fwd_row_packing_matches_per_row(monkeypatch, dm, h, w, j):
    """The rpack>1 forward (block-diagonal kron(I, W) weights, 8-row-aligned
    loop + single-row tail) equals the per-row path.  On hardware the packed
    path is bit-exact (the off-block zeros add exact 0.0 to the f32 sums);
    interpret mode allows f32-epsilon reassociation differences."""
    import sml_tpu.ops.pallas.deform_attn as da

    rng = np.random.default_rng(0)
    bg = 2
    dx = jnp.asarray(rng.standard_normal((bg, w * j)) * 0.5, jnp.float32)
    dy = jnp.asarray(rng.standard_normal((bg, h, j)) * 0.5, jnp.float32)
    w0x, w0y, b0, w1, b1, w2, b2 = [jnp.asarray(p) for p in
                                    _mlp_params(rng, dm)]
    args = (dx, dy, w0x, w0y, b0, w1, b1, w2, b2)

    ws, nb = da._pick_tiling(dm, w, h, j, 4, bwd=False)
    assert da._pick_rpack(dm, h // nb, (w // ws) * j, j, 4, bwd=False) > 1

    packed = np.asarray(da.fused_cpb_bias(*args, interpret=True))
    da.fused_cpb_bias.clear_cache()
    monkeypatch.setattr(da, "_pick_rpack", lambda *a, **k: 1)
    per_row = np.asarray(da.fused_cpb_bias(*args, interpret=True))
    da.fused_cpb_bias.clear_cache()
    np.testing.assert_allclose(packed, per_row, rtol=1e-5, atol=1e-5)
