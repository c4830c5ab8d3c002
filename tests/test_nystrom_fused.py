"""Fused Nystrom attention chains (Pallas, interpret mode on CPU).

The two N-sized softmax chains (attn1 = softmax(q k_l^T), attn3 =
softmax(q_l k^T)) route through the bias-less ``deform_attention_trainable``
kernel pair when ``use_pallas`` is set (``ops/nystrom.py``).  Values and
gradients must match the XLA formulation; masked / tiny-N / return_attn
inputs must keep the XLA path.  Reference semantics:
``models/NystromAttention.py:39-157``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sml_tpu.ops.nystrom import NystromAttention, _fused_chains_supported

KW = dict(dim=64, dim_head=16, heads=4, num_landmarks=32, pinv_iterations=6,
          residual=True, dropout=0.0)


def _pair(**overrides):
    kw = {**KW, **overrides}
    ref = NystromAttention(**kw)
    fused = NystromAttention(**kw, use_pallas=True, pallas_interpret=True)
    return ref, fused


def test_fused_matches_xla_outputs_and_grads():
    b, n = 2, 520                       # n % m != 0: exercises the front pad
    ref, fused = _pair()
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, KW["dim"]), jnp.float32)
    params = ref.init(jax.random.PRNGKey(0), x, deterministic=True)

    o_ref = ref.apply(params, x, deterministic=True)
    o_fused = fused.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)

    def loss(mod):
        return lambda p, x: (mod.apply(p, x, deterministic=True) ** 2).sum()

    g_ref, gx_ref = jax.grad(loss(ref), argnums=(0, 1))(params, x)
    g_fused, gx_fused = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    for a, c in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)


def _masked_pair_check(n, lengths, starts=None, rtol=1e-4, atol=1e-5):
    """Fused masked module (span kernels) vs the XLA masked formulation:
    outputs and grads on the FULL output (incl. masked-token rows — the span
    semantics reproduce the where(-f32max) math there too)."""
    b = len(lengths)
    ref, fused = _pair()
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, KW["dim"]), jnp.float32)
    idx = jnp.arange(n)[None, :]
    ends = jnp.array(lengths)[:, None]
    lo = jnp.zeros((b, 1), jnp.int32) if starts is None \
        else jnp.array(starts)[:, None]
    mask = (idx >= lo) & (idx < lo + ends)
    params = ref.init(jax.random.PRNGKey(0), x, deterministic=True)

    o_ref = ref.apply(params, x, mask=mask, deterministic=True)
    o_fused = fused.apply(params, x, mask=mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_ref),
                               rtol=rtol, atol=atol)

    def loss(mod):
        return lambda p, x: (mod.apply(p, x, mask=mask,
                                       deterministic=True) ** 2).sum()

    g_ref, gx_ref = jax.grad(loss(ref), argnums=(0, 1))(params, x)
    g_fused, gx_fused = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    for a, c in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref),
                               rtol=rtol, atol=atol)


def test_masked_fused_matches_xla_suffix_masks():
    # bucketed-bag shape: suffix padding, n % m != 0 adds a front pad on top
    _masked_pair_check(n=200, lengths=[150, 200])


def test_masked_fused_matches_xla_fully_masked_landmarks():
    # bags short enough that whole landmark segments are invalid (the XLA
    # path's uniform-softmax rows leak through the pinv — the span kernel
    # must reproduce them), incl. a nearly-empty bag.  Slightly looser
    # tolerance: the fused association (attn1 @ (pinv @ x3)) reassociates
    # f32 sums that the uniform rows amplify through the pinv.
    _masked_pair_check(n=256, lengths=[40, 8, 256], rtol=5e-4, atol=5e-5)


def test_masked_fused_matches_xla_interval_masks():
    # intervals with a False PREFIX (e.g. composed maskings), not just suffix
    _masked_pair_check(n=256, lengths=[100, 200], starts=[30, 56],
                       rtol=5e-4, atol=5e-5)


def test_pallas_masked_false_keeps_xla_path():
    # the opt-out for non-interval masks: bit-identical to the XLA module
    b, n = 2, 200
    ref = NystromAttention(**KW)
    fused = NystromAttention(**KW, use_pallas=True, pallas_masked=False,
                             pallas_interpret=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, KW["dim"]), jnp.float32)
    mask = jnp.arange(n)[None, :] < jnp.array([[150], [200]])
    params = ref.init(jax.random.PRNGKey(0), x, deterministic=True)
    o_ref = ref.apply(params, x, mask=mask, deterministic=True)
    o_fused = fused.apply(params, x, mask=mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_ref),
                               rtol=0, atol=0)   # identical code path


def test_gate_rejects_tiny_and_misaligned():
    assert _fused_chains_supported(1024, 32, 32, jnp.float32)
    assert not _fused_chains_supported(64, 32, 32, jnp.float32)    # n < 4m
    assert not _fused_chains_supported(1028, 32, 32, jnp.float32)  # n % 8
    # n_pad is always a multiple of m in the module, so the %8 case only
    # guards direct callers
    # sub-lane-tile head dims fall back to XLA (dh * itemsize < 128 bytes:
    # Mosaic pads the lane dim 4x and the kernel measured slower — r4 profile)
    assert not _fused_chains_supported(2560, 128, 32, jnp.bfloat16)  # cmta bf16
    assert _fused_chains_supported(2560, 128, 32, jnp.float32)       # f32 tile ok
    assert _fused_chains_supported(2560, 256, 64, jnp.bfloat16)      # transmil


def test_return_attn_keeps_xla_path():
    b, n = 1, 256
    _, fused = _pair()
    x = jax.random.normal(jax.random.PRNGKey(3), (b, n, KW["dim"]), jnp.float32)
    params = fused.init(jax.random.PRNGKey(0), x, deterministic=True)
    out, attn = fused.apply(params, x, deterministic=True, return_attn=True)
    assert attn.shape == (b, KW["heads"], n, n)
