"""Fused attention-epilogue Pallas kernel (sim+softmax+dropout+attn@v) vs the
XLA chain, values and grads, interpret mode on CPU — including row-axis
zero-padding (N not divisible by the block, e.g. the 2500-patch shape) and the
exact {0,1} dropout-mask semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.ops.pallas.deform_attn import (deform_attention_trainable,
                                            fused_attention_supported,
                                            _pick_attn_rowblock)


def _chain(q, k, v, bias, mask, keep):
    """The module's XLA formulation (sim in input dtype + f32 bias, stop-grad
    max shift, f32 softmax, mask/keep dropout, attn @ v)."""
    sim = jnp.einsum("bid,bjd->bij", q, k) + bias
    sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(sim, axis=-1)
    if mask is not None:
        attn = attn * mask / keep
    return jnp.einsum("bij,bjd->bid", attn, v)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("n", [32, 20])   # 20 forces row padding (npad=32)
def test_fused_attention_matches_chain(n):
    rng = np.random.default_rng(0)
    bg, j, dh = 3, 6, 8
    q, k, v = _rand(rng, bg, n, dh), _rand(rng, bg, j, dh), _rand(rng, bg, j, dh)
    bias = _rand(rng, bg, n, j)
    cot = _rand(rng, bg, n, dh)

    def run(f):
        def loss(q_, k_, v_, b_):
            return jnp.sum(f(q_, k_, v_, b_) * cot)
        val = f(q, k, v, bias)
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        return val, grads

    v_ref, g_ref = run(lambda *a: _chain(*a, None, 1.0))
    v_pal, g_pal = run(lambda *a: deform_attention_trainable(
        *a, None, None, None, 1.0, True))

    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)
    for name, a, b in zip("qkvb", g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=f"d{name}")


def test_fused_attention_dropout_mask_exact():
    """A {0,1} mask operand must reproduce the XLA dropout chain exactly in
    both directions (the mask replays bit-identically in fwd and bwd)."""
    rng = np.random.default_rng(1)
    bg, n, j, dh, keep = 2, 24, 5, 8, 0.75
    q, k, v = _rand(rng, bg, n, dh), _rand(rng, bg, j, dh), _rand(rng, bg, j, dh)
    bias = _rand(rng, bg, n, j)
    mask = jnp.asarray((rng.uniform(size=(bg, n, j)) < keep).astype(np.float32))
    cot = _rand(rng, bg, n, dh)

    def run(f):
        def loss(q_, k_, v_, b_):
            return jnp.sum(f(q_, k_, v_, b_) * cot)
        return f(q, k, v, bias), jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)

    v_ref, g_ref = run(lambda *a: _chain(*a, mask, keep))
    v_pal, g_pal = run(lambda *a: deform_attention_trainable(
        *a, mask, None, None, keep, True))

    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)
    for name, a, b in zip("qkvb", g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=f"d{name}")


def test_rowblock_picker_shapes():
    """Production shapes tile with near-zero padding; the lane cap rejects."""
    # 4k: N=4096 J=256 — divisible block
    nb = _pick_attn_rowblock(4096, 256, 64, 2, True)
    assert nb is not None and 4096 % nb == 0
    # flagship 2500-shape: pads at most 3%
    nb = _pick_attn_rowblock(2500, 144, 64, 2, True)
    npad = -(-2500 // nb) * nb
    assert npad - 2500 <= 0.03 * 2500
    # 16k: N=16384 J=1024
    nb = _pick_attn_rowblock(16384, 1024, 64, 2, True)
    assert nb is not None and 16384 % nb == 0
    assert fused_attention_supported(4096, 256, 64, 2, True)
    assert not fused_attention_supported(4096, 16384, 64, 2, True)


def test_module_fused_dropout_runs_and_normalizes():
    """DeformCrossAttention2D fused path with dropout active: finite output,
    and dropout=0 training call == deterministic call (mask degenerates)."""
    from sml_tpu.ops.deformable import DeformCrossAttention2D

    rng = np.random.default_rng(2)
    b, n, c = 2, 64, 16
    x1 = _rand(rng, b, n, c)
    x2 = _rand(rng, b, n, c)

    mod = DeformCrossAttention2D(dim=c, dim_head=8, heads=4, offset_groups=4,
                                 dropout=0.5, use_pallas=True,
                                 pallas_interpret=True)
    params = mod.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)
    out = mod.apply(params, x1, x2, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out)).all()

    nodrop = DeformCrossAttention2D(dim=c, dim_head=8, heads=4, offset_groups=4,
                                    dropout=0.0, use_pallas=True,
                                    pallas_interpret=True)
    out_train = nodrop.apply(params, x1, x2, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(1)})
    out_det = nodrop.apply(params, x1, x2, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_train), np.asarray(out_det),
                               rtol=1e-5, atol=1e-6)


def _span_chain(q, k, v, bias, span, mask, keep):
    """XLA oracle for the span semantics: where(row & col, sim, -f32max)
    BEFORE the (non-stop-grad-blocked) softmax — the Nystrom masked module's
    formulation generalized to a bias + dropout-mask epilogue."""
    neg = -3.4028234663852886e38
    bg, n, _ = q.shape
    j = k.shape[1]
    ri = jnp.arange(n)[None, :, None]
    ci = jnp.arange(j)[None, None, :]
    rv = (ri >= span[:, 0, None, None]) & (ri < span[:, 1, None, None])
    cv = (ci >= span[:, 2, None, None]) & (ci < span[:, 3, None, None])
    sim = jnp.einsum("bid,bjd->bij", q, k) + bias
    sim = jnp.where(rv & cv, sim, neg)
    attn = jax.nn.softmax(sim, axis=-1)
    if mask is not None:
        attn = attn * mask / keep
    return jnp.einsum("bij,bjd->bid", attn, v)


@pytest.mark.parametrize("dropout", [False, True])
def test_fused_attention_span_with_bias_and_dropout(dropout):
    """span composes with the bias operand and the dropout mask: values and
    all four grads match the XLA where(-f32max) oracle, including a
    fully-invalid-rows bag and row-block zero padding (n=20 -> npad=32)."""
    rng = np.random.default_rng(7)
    bg, n, j, dh, keep = 3, 20, 6, 8, 0.75
    q, k, v = _rand(rng, bg, n, dh), _rand(rng, bg, j, dh), _rand(rng, bg, j, dh)
    bias = _rand(rng, bg, n, j)
    cot = _rand(rng, bg, n, dh)
    # bag 0: interior interval; bag 1: everything valid; bag 2: NO valid rows
    span = jnp.asarray([[3, 17, 1, 5], [0, 20, 0, 6], [20, 20, 0, 6]],
                       jnp.int32)
    mask = jnp.asarray((rng.uniform(size=(bg, n, j)) < keep).astype(np.float32)) \
        if dropout else None
    kp = keep if dropout else 1.0

    def run(f):
        def loss(q_, k_, v_, b_):
            return jnp.sum(f(q_, k_, v_, b_) * cot)
        return (f(q, k, v, bias),
                jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias))

    v_ref, g_ref = run(lambda *a: _span_chain(*a, span, mask, kp))
    v_pal, g_pal = run(lambda *a: deform_attention_trainable(
        *a, mask, None, span, kp, True))

    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref),
                               rtol=1e-5, atol=1e-5)
    for name, a, b in zip("qkvb", g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=f"d{name}")
