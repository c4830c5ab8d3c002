"""Custom-VJP Pallas CPB: gradients match the XLA naive formulation (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.ops.deformable import CPB2D, DeformCrossAttention2D


def _setup(impl, interpret=True):
    rng = np.random.default_rng(0)
    b, g, hgt, wid, j, dm = 2, 4, 5, 5, 6, 16
    x_coords = jnp.asarray(np.linspace(-1, 1, wid).astype(np.float32))
    y_coords = jnp.asarray(np.linspace(-1, 1, hgt).astype(np.float32))
    grid_kv = jnp.asarray(rng.uniform(-1, 1, size=(b * g, j, 2)).astype(np.float32))
    mod = CPB2D(dim=dm, heads=g, offset_groups=g, impl=impl,
                pallas_interpret=interpret)
    return mod, x_coords, y_coords, grid_kv, b


def test_cpb_pallas_value_and_grads_match_naive():
    naive, xc, yc, gkv, b = _setup("naive")
    pallas, *_ = _setup("pallas")
    params = naive.init(jax.random.PRNGKey(0), xc, yc, gkv, b)

    out_naive = naive.apply(params, xc, yc, gkv, b)
    out_pallas = pallas.apply(params, xc, yc, gkv, b)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_naive),
                               rtol=1e-4, atol=1e-5)

    cot = jnp.asarray(np.random.default_rng(1).normal(
        size=out_naive.shape).astype(np.float32))

    def loss(mod):
        def f(p, kv):
            return jnp.sum(mod.apply(p, xc, yc, kv, b) * cot)
        return jax.grad(f, argnums=(0, 1))(params, gkv)

    gp_naive, gkv_naive = loss(naive)
    gp_pallas, gkv_pallas = loss(pallas)

    # grid_kv grads (flow through the signlog factor tables)
    np.testing.assert_allclose(np.asarray(gkv_pallas), np.asarray(gkv_naive),
                               rtol=1e-3, atol=1e-5)
    # every MLP parameter grad
    flat_n = jax.tree_util.tree_leaves_with_path(gp_naive)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp_pallas))
    for path, leaf_n in flat_n:
        leaf_p = flat_p[path]
        np.testing.assert_allclose(np.asarray(leaf_p), np.asarray(leaf_n),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=str(path))


def test_deform2d_pallas_training_grads_match():
    """Full module: value_and_grad through the pallas CPB == naive, incl. offsets."""
    rng = np.random.default_rng(2)
    b, n, c = 2, 64, 16
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    common = dict(dim=c, dim_head=8, heads=4, offset_groups=4, dropout=0.0)
    ref = DeformCrossAttention2D(**common)
    pal = DeformCrossAttention2D(**common, use_pallas=True, pallas_interpret=True)
    params = ref.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)

    def loss(mod):
        def f(p):
            return (mod.apply(p, x1, x2, deterministic=True) ** 2).sum()
        return jax.value_and_grad(f)(params)

    v_ref, g_ref = loss(ref)
    v_pal, g_pal = loss(pal)
    assert abs(float(v_ref) - float(v_pal)) < 1e-2 * max(abs(float(v_ref)), 1)

    leaves_r = jax.tree_util.tree_leaves_with_path(g_ref)
    leaves_p = dict(jax.tree_util.tree_leaves_with_path(g_pal))
    for path, lr in leaves_r:
        lp = leaves_p[path]
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lr), rtol=2e-3,
                                   atol=2e-4, err_msg=str(path))


@pytest.mark.parametrize("force_tiling", [None, (2, 2)])
def test_cpb_bwd_grid_orders_agree(monkeypatch, force_tiling):
    """The two backward grid orders ("rs" chunk-fastest with du partials vs
    "sr" row-block-fastest with dv partials) compute the same gradients; the
    forced (wsplit=2, n_rb=2) tiling exercises the dv-partial fold and the
    du accumulation across row-block revisits."""
    import sml_tpu.ops.pallas.deform_attn as da

    if force_tiling is not None:
        monkeypatch.setattr(da, "_pick_tiling",
                            lambda *a, **k: force_tiling)
    rng = np.random.default_rng(0)
    h, w, j, dm, bg = 8, 16, 128, 32, 4
    wj = w * j
    f32 = jnp.float32
    dx = jnp.asarray(rng.standard_normal((bg, wj)), f32)
    dy = jnp.asarray(rng.standard_normal((bg, h, j)), f32)
    w0x = jnp.asarray(rng.standard_normal((dm,)), f32)
    w0y = jnp.asarray(rng.standard_normal((dm,)), f32)
    b0 = jnp.asarray(rng.standard_normal((dm,)), f32)
    w1 = jnp.asarray(rng.standard_normal((dm, dm)), f32)
    b1 = jnp.asarray(rng.standard_normal((dm,)), f32)
    w2 = jnp.asarray(rng.standard_normal((dm, 1)), f32)
    dbias = jnp.asarray(rng.standard_normal((bg, h, wj)), f32)

    outs = {}
    for order in ("rs", "sr"):
        da._cpb_bwd_call.clear_cache()
        outs[order] = [np.asarray(x, np.float64)
                       for x in da._cpb_bwd_call(dx, dy, w0x, w0y, b0,
                                                 w1, b1, w2, dbias,
                                                 interpret=True, order=order)]
    names = ("ddx", "ddy", "dw0x", "dw0y", "db0", "dw1", "db1", "dw2", "db2")
    for name, a, b in zip(names, outs["rs"], outs["sr"]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=name)
