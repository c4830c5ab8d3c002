"""Hardware-only checks of the fused attention kernel's on-chip PRNG dropout
(the seed path cannot lower in interpret mode, so CPU CI covers the mask
operand and these tests pin the seed path whenever a TPU is present).

Validated manually on v5e (round 3b): the seed path equals the extracted-mask
path bit-exactly in outputs and all four gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="on-chip PRNG dropout lowers only on TPU hardware")


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_seed_dropout_equals_extracted_mask_path():
    """Extract the data-independent PRNG mask (uniform-attention probe), then
    the mask-operand path (CPU-verified exact) must reproduce the seed path
    bit-for-bit — proving the mask replays identically in fwd and bwd."""
    from sml_tpu.ops.pallas.deform_attn import deform_attention_trainable

    rng = np.random.default_rng(0)
    bg, n, j, dh, keep = 2, 64, 128, 128, 0.8
    seed = jnp.asarray([123, 456], jnp.int32)

    # q=0, bias=0 -> attn uniform 1/j; v=eye -> out = (1/j) * mask * (1/keep)
    z_q = jnp.zeros((bg, n, dh), jnp.float32)
    z_b = jnp.zeros((bg, n, j), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(j, dtype=jnp.float32), (bg, j, dh))
    k0 = jnp.zeros((bg, j, dh), jnp.float32)
    probe = deform_attention_trainable(z_q, k0, eye, z_b, None, seed, None,
                                       keep, False)
    mask01 = jnp.asarray((np.asarray(probe) * j > 0.5).astype(np.float32))
    kept = float(mask01.mean())
    assert 0.7 < kept < 0.9, f"kept fraction {kept} far from keep_prob {keep}"

    f = lambda *s: _rand(rng, *s)
    q, k, v, bias = f(bg, n, dh), f(bg, j, dh), f(bg, j, dh), f(bg, n, j)
    cot = f(bg, n, dh)

    def loss(q_, k_, v_, b_, use_seed):
        o = deform_attention_trainable(q_, k_, v_, b_,
                                       None if use_seed else mask01,
                                       seed if use_seed else None, None, keep,
                                       False)
        return jnp.sum(o.astype(jnp.float32) * cot)

    o_seed = deform_attention_trainable(q, k, v, bias, None, seed, None,
                                        keep, False)
    o_mask = deform_attention_trainable(q, k, v, bias, mask01, None, None,
                                        keep, False)
    np.testing.assert_array_equal(np.asarray(o_seed), np.asarray(o_mask))

    g_seed = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias, True)
    g_mask = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias, False)
    for name, a, b in zip("qkvb", g_seed, g_mask):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"d{name}")


def test_seed_dropout_deterministic_and_normalized():
    from sml_tpu.ops.pallas.deform_attn import deform_attention_trainable

    rng = np.random.default_rng(1)
    bg, n, j, dh, keep = 4, 256, 128, 64, 0.9
    q = _rand(rng, bg, n, dh)
    k = _rand(rng, bg, j, dh)
    v = _rand(rng, bg, j, dh)
    bias = _rand(rng, bg, n, j)
    seed = jnp.asarray([7, 9], jnp.int32)

    o1 = deform_attention_trainable(q, k, v, bias, None, seed, None,
                                        keep, False)
    o2 = deform_attention_trainable(q, k, v, bias, None, seed, None,
                                        keep, False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    # keep ~1.0 degenerates to the no-dropout path exactly
    o_k1 = deform_attention_trainable(q, k, v, bias, None, seed, None,
                                      1.0 - 1e-9, False)
    o_no = deform_attention_trainable(q, k, v, bias, None, None, None, 1.0,
                                      False)
    np.testing.assert_array_equal(np.asarray(o_k1), np.asarray(o_no))


def test_deform1d_fused_matches_xla_on_hardware():
    """1-D fused epilogue through the real Mosaic lowering: col-span-excluded
    dummy sampled points (nd=26 -> ndp=32) + bias operand + row padding."""
    from sml_tpu.ops.deformable import DeformCrossAttention1D

    rng = np.random.default_rng(11)
    b, n, c = 2, 101, 16
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    kw = dict(dim=c, dim_head=8, heads=8, offset_groups=4,
              downsample_factor=4, offset_scale=2.0, offset_kernel_size=6)
    ref = DeformCrossAttention1D(**kw)
    fused = DeformCrossAttention1D(**kw, use_pallas=True)
    params = ref.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)

    o_ref = np.asarray(jax.jit(lambda p: ref.apply(
        p, x1, x2, deterministic=True))(params))
    # deterministic=True keeps the XLA chain under the serving rule unless the
    # row pad is zero, so drive the fused path through the TRAIN route with
    # dropout=0.0 (dropout_active False -> no mask/seed, fused because
    # deterministic=False)
    o_fused = np.asarray(jax.jit(lambda p: fused.apply(
        p, x1, x2, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)}))(params))
    np.testing.assert_allclose(o_fused, o_ref, rtol=2e-2, atol=2e-3)

    def loss(mod, det):
        return jax.jit(jax.grad(lambda p: (mod.apply(
            p, x1, x2, deterministic=det,
            rngs={} if det else {"dropout": jax.random.PRNGKey(1)}) ** 2).sum()))

    g_ref = loss(ref, True)(params)
    g_fused = loss(fused, False)(params)
    for a, c_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(c_), np.asarray(a),
                                   rtol=2e-2, atol=2e-2)
