"""Deformable cross-attention: shapes, CPB chunk consistency, conv parity vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.ops.deformable import (
    CPB2D, DeformCrossAttention1D, DeformCrossAttention2D, _group, _ungroup,
    make_grid_2d, normalize_grid_2d)


def test_group_ungroup_roundtrip_and_torch_channel_order():
    """_group must split channels into contiguous chunks (torch 'b (g d) ...' order)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    g = _group(x, 4)  # (8, 4, 4, 2)
    assert g.shape == (8, 4, 4, 2)
    # group 0 of batch 0 must carry channels [0, 1]
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(x[0, :, :, 0:2]))
    np.testing.assert_array_equal(np.asarray(g[1]), np.asarray(x[0, :, :, 2:4]))
    np.testing.assert_array_equal(np.asarray(_ungroup(g, 4)), np.asarray(x))


def test_cpb2d_factorized_matches_naive_mlp():
    """The factorized/block-diagonal CPB must equal the naive dense MLP evaluation
    (the reference formulation) exactly."""
    rng = np.random.default_rng(1)
    b, g, hgt, wid, j = 2, 4, 5, 8, 12
    x_coords = jnp.asarray(np.linspace(-1, 1, wid).astype(np.float32))
    y_coords = jnp.asarray(np.linspace(-1, 1, hgt).astype(np.float32))
    grid_kv = jnp.asarray(rng.uniform(-1, 1, size=(b * g, j, 2)).astype(np.float32))

    mod = CPB2D(dim=16, heads=8, offset_groups=g, impl="naive", query_chunk=0)
    params = mod.init(jax.random.PRNGKey(0), x_coords, y_coords, grid_kv, b)
    out = np.asarray(mod.apply(params, x_coords, y_coords, grid_kv, b))

    variants = [
        CPB2D(dim=16, heads=8, offset_groups=g, impl="naive", query_chunk=7),
        CPB2D(dim=16, heads=8, offset_groups=g, impl="factorized", row_chunk=1),
        CPB2D(dim=16, heads=8, offset_groups=g, impl="factorized", row_chunk=0),
    ]
    out_chunk = np.asarray(variants[0].apply(params, x_coords, y_coords, grid_kv, b))

    # naive oracle: dense pos -> signlog -> 3-layer MLP with the same params
    p = params["params"]
    xs, ys = np.meshgrid(np.asarray(x_coords), np.asarray(y_coords))  # (H, W)
    grid_q = np.stack([xs.ravel(), ys.ravel()], -1)                    # (N, 2) iy*W+ix
    pos = grid_q[None, :, None, :] - np.asarray(grid_kv)[:, None, :, :]
    pos = np.sign(pos) * np.log(np.abs(pos) + 1.0)
    h1 = np.maximum(pos @ np.asarray(p["w0"]) + np.asarray(p["b0"]), 0)
    h2 = np.maximum(h1 @ np.asarray(p["w1"]) + np.asarray(p["b1"]), 0)
    naive = h2 @ np.asarray(p["w2"]) + np.asarray(p["b2"])             # (BG, N, J, o)
    o = 8 // g
    n = hgt * wid
    naive = naive.reshape(b, g, n, j, o).transpose(0, 1, 4, 2, 3).reshape(b, 8, n, j)

    assert out.shape == (b, 8, n, j)
    np.testing.assert_allclose(out, naive, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_chunk, naive, rtol=1e-4, atol=1e-5)
    for variant in variants[1:]:
        got = np.asarray(variant.apply(params, x_coords, y_coords, grid_kv, b))
        np.testing.assert_allclose(got, naive, rtol=1e-4, atol=1e-5)


def test_offset_conv_spatial_shape_matches_reference():
    """50x50 map, k=6 stride=4 pad=1 -> 12x12 offsets (reference prints at
    models/DeformableAttention2D.py:256)."""
    rng = np.random.default_rng(2)
    b, n, c = 1, 2500, 32
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    mod = DeformCrossAttention2D(dim=c, dim_head=8, heads=8, offset_groups=8)
    params = mod.init(jax.random.PRNGKey(0), x1, x2, return_vgrid=True,
                      deterministic=True)
    out, vgrid = mod.apply(params, x1, x2, return_vgrid=True, deterministic=True)
    assert out.shape == (b, n, c)
    assert vgrid.shape == (b, 8, 12, 12, 2)


@pytest.mark.parametrize("n", [64, 2500])
def test_deform2d_shapes_and_grads(n):
    rng = np.random.default_rng(3)
    b, c = 2, 16
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    mod = DeformCrossAttention2D(dim=c, dim_head=8, heads=4, offset_groups=4,
                                 dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)

    def loss(p):
        return (mod.apply(p, x1, x2, deterministic=True) ** 2).sum()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))
    # offsets must receive gradient (through grid_sample + CPB)
    off_g = g["params"]["offset_conv"]["kernel"]
    assert np.abs(np.asarray(off_g)).sum() > 0


def test_deform1d_shapes_and_grads():
    rng = np.random.default_rng(4)
    b, n, c = 2, 101, 16  # odd length incl. a "cls" slot, like 1+N
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    mod = DeformCrossAttention1D(dim=c, dim_head=8, heads=8, offset_groups=4,
                                 downsample_factor=4, offset_scale=2.0,
                                 offset_kernel_size=6)
    params = mod.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)
    out = mod.apply(params, x1, x2, deterministic=True)
    assert out.shape == (b, n, c)

    def loss(p):
        return (mod.apply(p, x1, x2, deterministic=True) ** 2).sum()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_depthwise_strided_conv_matches_torch():
    """The offset conv (k=6, stride=4, pad=1, depthwise) vs torch Conv2d."""
    torch = pytest.importorskip("torch")
    from flax import linen as nn

    rng = np.random.default_rng(5)
    b, h, w, c = 2, 50, 50, 8
    x = rng.normal(size=(b, h, w, c)).astype(np.float32)

    conv = nn.Conv(features=c, kernel_size=(6, 6), strides=(4, 4),
                   padding=((1, 1), (1, 1)), feature_group_count=c, use_bias=True)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = conv.apply(params, jnp.asarray(x))

    kernel = np.asarray(params["params"]["kernel"])  # (kh, kw, in/groups=1, out=c)
    bias = np.asarray(params["params"]["bias"])
    t_conv = torch.nn.Conv2d(c, c, 6, stride=4, padding=1, groups=c)
    with torch.no_grad():
        t_conv.weight.copy_(torch.from_numpy(kernel.transpose(3, 2, 0, 1)))
        t_conv.bias.copy_(torch.from_numpy(bias))
    ref = t_conv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_normalized_grid_bounds():
    grid = make_grid_2d(12, 12)
    norm = normalize_grid_2d(grid, 12, 12)
    assert np.asarray(norm).min() == -1.0
    assert np.asarray(norm).max() == 1.0


def test_deform1d_fused_epilogue_matches_xla():
    """use_pallas routes the 1-D chain through the fused kernel pair
    (interpret mode): the sampled-point axis is padded to %8 with dummy
    points excluded by the col span, so values and grads must equal the
    XLA chain exactly (no dropout)."""
    rng = np.random.default_rng(5)
    b, n, c = 2, 101, 16                   # nd = 26 -> ndp = 32 (span-excluded)
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    kw = dict(dim=c, dim_head=8, heads=8, offset_groups=4,
              downsample_factor=4, offset_scale=2.0, offset_kernel_size=6)
    ref = DeformCrossAttention1D(**kw)
    fused = DeformCrossAttention1D(**kw, use_pallas=True, pallas_interpret=True)
    params = ref.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)

    o_ref = ref.apply(params, x1, x2, deterministic=True)
    o_fused = fused.apply(params, x1, x2, deterministic=True)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(mod):
        return lambda p: (mod.apply(p, x1, x2, deterministic=True) ** 2).sum()

    g_ref = jax.grad(loss(ref))(params)
    g_fused = jax.grad(loss(fused))(params)
    for a, c_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(c_), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_deform1d_fused_dropout_normalizes():
    """Fused 1-D dropout (mask operand in interpret mode) keeps the output
    scale: mean over many draws approaches the deterministic output."""
    rng = np.random.default_rng(6)
    b, n, c = 1, 49, 16
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    mod = DeformCrossAttention1D(dim=c, dim_head=8, heads=8, offset_groups=4,
                                 downsample_factor=4, offset_scale=2.0,
                                 offset_kernel_size=6, dropout=0.3,
                                 use_pallas=True, pallas_interpret=True)
    params = mod.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)
    det = mod.apply(params, x1, x2, deterministic=True)
    outs = [mod.apply(params, x1, x2, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(i)})
            for i in range(24)]
    avg = np.mean([np.asarray(o) for o in outs], axis=0)
    # dropout is unbiased (1/keep rescale): the mean tracks the no-dropout out
    corr = np.corrcoef(avg.ravel(), np.asarray(det).ravel())[0, 1]
    assert corr > 0.99
