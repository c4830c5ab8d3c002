"""RawMultiheadAttention parity vs torch F.multi_head_attention_forward (need_weights
semantics: reference MultiheadAttention.py returns PRE-softmax logits)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from sml_tpu.ops.attention import RawMultiheadAttention  # noqa: E402


@pytest.mark.parametrize("heads", [1, 4])
def test_raw_mha_matches_torch(heads):
    rng = np.random.default_rng(0)
    b, lq, lk, e = 3, 5, 11, 16
    q = rng.normal(size=(b, lq, e)).astype(np.float32)
    k = rng.normal(size=(b, lk, e)).astype(np.float32)
    v = rng.normal(size=(b, lk, e)).astype(np.float32)

    mod = RawMultiheadAttention(embed_dim=e, num_heads=heads)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k),
                      jnp.asarray(v))
    out, raw = mod.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    p = params["params"]
    wq = np.asarray(p["q_proj"]["kernel"]).T  # torch layout (out, in)
    wk = np.asarray(p["k_proj"]["kernel"]).T
    wv = np.asarray(p["v_proj"]["kernel"]).T
    bq = np.asarray(p["q_proj"]["bias"])
    bk = np.asarray(p["k_proj"]["bias"])
    bv = np.asarray(p["v_proj"]["bias"])
    wo = np.asarray(p["out_proj"]["kernel"]).T
    bo = np.asarray(p["out_proj"]["bias"])

    in_proj_weight = torch.from_numpy(np.concatenate([wq, wk, wv], 0))
    in_proj_bias = torch.from_numpy(np.concatenate([bq, bk, bv], 0))

    # torch expects (L, B, E)
    tq = torch.from_numpy(q).transpose(0, 1)
    tk = torch.from_numpy(k).transpose(0, 1)
    tv = torch.from_numpy(v).transpose(0, 1)

    t_out, t_w = F.multi_head_attention_forward(
        tq, tk, tv, e, heads, in_proj_weight, in_proj_bias, None, None, False, 0.0,
        torch.from_numpy(wo), torch.from_numpy(bo), training=False,
        need_weights=True, average_attn_weights=False)

    np.testing.assert_allclose(np.asarray(out), t_out.transpose(0, 1).detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    # torch returns post-softmax weights; verify our raw logits softmax to them
    ours_soft = np.asarray(jax.nn.softmax(raw, axis=-1))
    t_w = t_w.detach().numpy()  # (B, H, Lq, Lk) with average_attn_weights=False
    np.testing.assert_allclose(ours_soft, t_w, rtol=1e-4, atol=1e-5)


def test_raw_logits_include_query_scaling():
    rng = np.random.default_rng(1)
    b, l, e = 1, 4, 8
    x = jnp.asarray(rng.normal(size=(b, l, e)).astype(np.float32))
    mod = RawMultiheadAttention(embed_dim=e, num_heads=2)
    params = mod.init(jax.random.PRNGKey(0), x, x, x)
    _, raw = mod.apply(params, x, x, x)

    p = params["params"]
    q = np.asarray(x @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]) * (4 ** -0.5)
    k = np.asarray(x @ p["k_proj"]["kernel"] + p["k_proj"]["bias"])
    qh = q.reshape(b, l, 2, 4).transpose(0, 2, 1, 3)
    kh = k.reshape(b, l, 2, 4).transpose(0, 2, 1, 3)
    expected = np.einsum("bhid,bhjd->bhij", qh, kh)
    np.testing.assert_allclose(np.asarray(raw), expected, rtol=1e-5, atol=1e-6)
