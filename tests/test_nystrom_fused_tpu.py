"""Hardware-only check of the fused Nystrom chains (Pallas compiled path).

CPU CI proves fused == XLA in interpret mode (tests/test_nystrom_fused.py);
this pins the same equality through the real Mosaic lowering whenever a TPU
backend is present (``SML_TPU_TESTS_ON_TPU=1`` keeps the axon backend).
Reference semantics: ``models/NystromAttention.py:39-157``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="compiled Pallas path requires TPU hardware")

KW = dict(dim=64, dim_head=16, heads=4, num_landmarks=32, pinv_iterations=6,
          residual=True, dropout=0.0)


def test_fused_matches_xla_on_hardware():
    from sml_tpu.ops.nystrom import NystromAttention

    b, n = 2, 512
    ref = NystromAttention(**KW)
    fused = NystromAttention(**KW, use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, KW["dim"]), jnp.float32)
    params = ref.init(jax.random.PRNGKey(0), x, deterministic=True)

    o_ref = np.asarray(jax.jit(
        lambda p, x: ref.apply(p, x, deterministic=True))(params, x))
    o_fused = np.asarray(jax.jit(
        lambda p, x: fused.apply(p, x, deterministic=True))(params, x))
    # both paths run f32 with TPU-default matmul precision; the fused path
    # reassociates one N-sized matmul, so allow small numeric slack
    np.testing.assert_allclose(o_fused, o_ref, rtol=2e-2, atol=2e-3)

    def loss(mod):
        return jax.jit(jax.grad(
            lambda p, x: (mod.apply(p, x, deterministic=True) ** 2).sum(),
            argnums=(0, 1)))

    g_ref, gx_ref = loss(ref)(params, x)
    g_fused, gx_fused = loss(fused)(params, x)
    for a, c in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref),
                               rtol=2e-2, atol=2e-2)


def test_masked_fused_matches_xla_on_hardware():
    """The span (interval-mask) operands through the REAL Mosaic lowering:
    SMEM (1, 4) scalar blocks + in-kernel broadcasted_iota validity — these
    are exactly the pieces interpret mode cannot vouch for."""
    from sml_tpu.ops.nystrom import NystromAttention

    b, n = 2, 512
    ref = NystromAttention(**KW)
    fused = NystromAttention(**KW, use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, KW["dim"]), jnp.float32)
    # one bag with a short valid interval (fully-masked landmark segments on
    # both sides), one bucket-style suffix mask
    idx = jnp.arange(n)[None, :]
    mask = (idx >= jnp.array([[64], [0]])) & (idx < jnp.array([[200], [470]]))
    params = ref.init(jax.random.PRNGKey(0), x, deterministic=True)

    o_ref = np.asarray(jax.jit(
        lambda p, x: ref.apply(p, x, mask=mask, deterministic=True))(params, x))
    o_fused = np.asarray(jax.jit(
        lambda p, x: fused.apply(p, x, mask=mask, deterministic=True))(params, x))
    np.testing.assert_allclose(o_fused, o_ref, rtol=2e-2, atol=2e-3)

    def loss(mod):
        return jax.jit(jax.grad(
            lambda p, x: (mod.apply(p, x, mask=mask,
                                    deterministic=True) ** 2).sum(),
            argnums=(0, 1)))

    g_ref, gx_ref = loss(ref)(params, x)
    g_fused, gx_fused = loss(fused)(params, x)
    for a, c in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref),
                               rtol=2e-2, atol=2e-2)
