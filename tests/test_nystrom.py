"""Nystrom attention numerics: pinv oracle, exact-attention limit, mask invariance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sml_tpu.ops.linear_algebra import moore_penrose_pinv
from sml_tpu.ops.nystrom import NystromAttention


def _softmax_rows(rng, n):
    x = rng.normal(size=(2, 3, n, n)).astype(np.float32)
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


@pytest.mark.parametrize("n", [8, 32, 64])
def test_moore_penrose_pinv_matches_exact(n):
    rng = np.random.default_rng(0)
    a = jnp.asarray(_softmax_rows(rng, n))
    approx = np.asarray(moore_penrose_pinv(a, iters=6))
    exact = np.asarray(jnp.linalg.pinv(a))
    # pinv property checks (more robust than elementwise for near-singular softmax mats)
    a_np = np.asarray(a)
    recon_approx = a_np @ approx @ a_np
    recon_exact = a_np @ exact @ a_np
    err_approx = np.abs(recon_approx - a_np).max()
    err_exact = np.abs(recon_exact - a_np).max()
    assert err_approx < max(10 * err_exact, 2e-2)


def test_nystrom_close_to_exact_attention_when_landmarks_cover():
    """With num_landmarks == n and distinct tokens, Nystrom is near-exact attention."""
    rng = np.random.default_rng(1)
    b, n, dim, heads = 2, 16, 32, 4
    x = jnp.asarray(rng.normal(size=(b, n, dim)).astype(np.float32))

    mod = NystromAttention(dim=dim, dim_head=8, heads=heads, num_landmarks=n,
                           pinv_iterations=12, residual=False, dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = mod.apply(params, x, deterministic=True)

    # exact attention with the same projections
    w = params["params"]["to_qkv"]["kernel"]
    qkv = np.asarray(x @ w)
    q, k, v = np.split(qkv, 3, axis=-1)

    def split(t):
        return t.reshape(b, n, heads, 8).transpose(0, 2, 1, 3)

    q, k, v = split(q) * (8 ** -0.5), split(k), split(v)
    sim = np.einsum("bhid,bhjd->bhij", q, k)
    attn = np.exp(sim - sim.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    ref = np.einsum("bhij,bhjd->bhid", attn, v)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, n, heads * 8)
    ref = ref @ np.asarray(params["params"]["to_out"]["kernel"]) + np.asarray(
        params["params"]["to_out"]["bias"])

    np.testing.assert_allclose(np.asarray(out), ref, rtol=0.15, atol=0.05)


def test_nystrom_mask_blocks_invalid_tokens():
    """Changing features at masked positions must not change valid outputs."""
    rng = np.random.default_rng(2)
    b, n, dim = 1, 64, 32
    x1 = rng.normal(size=(b, n, dim)).astype(np.float32)
    x2 = x1.copy()
    mask = np.ones((b, n), dtype=bool)
    mask[:, :16] = False
    x2[:, :16] = rng.normal(size=(b, 16, dim))  # perturb ONLY masked tokens

    mod = NystromAttention(dim=dim, dim_head=8, heads=4, num_landmarks=8,
                           residual=False, dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1), deterministic=True)
    o1 = mod.apply(params, jnp.asarray(x1), mask=jnp.asarray(mask), deterministic=True)
    o2 = mod.apply(params, jnp.asarray(x2), mask=jnp.asarray(mask), deterministic=True)

    np.testing.assert_allclose(np.asarray(o1)[:, 16:], np.asarray(o2)[:, 16:],
                               rtol=1e-4, atol=1e-5)


def test_residual_conv_matches_torch_reference_layout():
    """The merged-channel depthwise residual conv must equal torch's
    Conv2d(heads, heads, (33,1), padding=(16,0), groups=heads, bias=False) applied to
    values laid out (b, heads, n, d) — the reference formulation
    (NystromAttention.py:69-72, :144-145)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(7)
    b, h, n, d = 2, 4, 40, 8
    kernel_size = 33
    v_flat = rng.normal(size=(b, n, h * d)).astype(np.float32)   # merged heads
    kern = rng.normal(size=(kernel_size, h)).astype(np.float32) * 0.1

    # ours: expanded depthwise conv over (b, n, h*d)
    expanded = jnp.repeat(jnp.asarray(kern), d, axis=1)
    res = jax.lax.conv_general_dilated(
        jnp.asarray(v_flat), expanded[:, None, :], window_strides=(1,),
        padding=[(16, 16)], feature_group_count=h * d,
        dimension_numbers=("NHC", "HIO", "NHC"))

    # torch: reference layout (b, heads, n, d)
    v_t = torch.from_numpy(v_flat.reshape(b, n, h, d)).permute(0, 2, 1, 3)
    conv = torch.nn.Conv2d(h, h, (kernel_size, 1), padding=(16, 0), groups=h,
                           bias=False)
    with torch.no_grad():
        # torch kernel (out=h, in/groups=1, kh, kw); ours is (kh, h)
        conv.weight.copy_(torch.from_numpy(
            kern.T[:, None, :, None]))
    ref = conv(v_t).permute(0, 2, 1, 3).reshape(b, n, h * d).detach().numpy()

    np.testing.assert_allclose(np.asarray(res), ref, rtol=1e-4, atol=1e-5)


def test_nystrom_padding_path_and_residual_shapes():
    """n not divisible by landmarks (front-pad path) + depthwise residual conv."""
    rng = np.random.default_rng(3)
    b, n, dim = 2, 50, 64
    x = jnp.asarray(rng.normal(size=(b, n, dim)).astype(np.float32))
    mod = NystromAttention(dim=dim, dim_head=8, heads=8, num_landmarks=16,
                           residual=True, dropout=0.1)
    params = mod.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = mod.apply(params, x, deterministic=True)
    assert out.shape == (b, n, dim)
    assert np.isfinite(np.asarray(out)).all()

    # grads flow
    def loss(p):
        return (mod.apply(p, x, deterministic=True) ** 2).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
