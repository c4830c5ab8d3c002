"""SNN/AlphaDropout statistics, PPEG parity vs torch, fusion blocks, transformer layer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sml_tpu.ops.conv import PPEG
from sml_tpu.ops.fusion import Bilinear, BilinearFusion, FusionNet, TrilinearFusion
from sml_tpu.ops.pooling import AttnNetGated, Pooler
from sml_tpu.ops.snn import SNNBlock, alpha_dropout
from sml_tpu.ops.transformer import TransformerEncoder


def test_alpha_dropout_preserves_moments():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(200_000,)).astype(np.float32))
    y = alpha_dropout(x, 0.25, jax.random.PRNGKey(1))
    assert abs(float(y.mean())) < 0.02
    assert abs(float(y.var()) - 1.0) < 0.05
    # eval mode: identity
    np.testing.assert_array_equal(
        np.asarray(alpha_dropout(x, 0.25, jax.random.PRNGKey(1), deterministic=True)),
        np.asarray(x))


def test_alpha_dropout_matches_torch_constants():
    torch = pytest.importorskip("torch")
    # dropped value must be -1.7580993408473766 pre-affine; check the affine too
    p = 0.3
    x = jnp.zeros((10_000,), jnp.float32)
    y = np.asarray(alpha_dropout(x, p, jax.random.PRNGKey(0)))
    vals = np.unique(np.round(y, 5))
    assert len(vals) == 2  # kept zeros -> b; dropped -> a*alpha' + b
    t = torch.nn.functional.alpha_dropout(torch.zeros(10_000), p=p, training=True)
    t_vals = np.unique(np.round(t.numpy(), 5))
    np.testing.assert_allclose(sorted(vals), sorted(t_vals), atol=1e-4)


def test_snn_block_shapes():
    x = jnp.ones((4, 59))
    mod = SNNBlock(64, dropout=0.25)
    params = mod.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    out = mod.apply(params, x, deterministic=True)
    assert out.shape == (4, 64)


def test_ppeg_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    b, hw, c = 2, 16, 8
    h = w = 4
    x = rng.normal(size=(b, 1 + hw, c)).astype(np.float32)

    mod = PPEG(dim=c)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), h, w)
    out = np.asarray(mod.apply(params, jnp.asarray(x), h, w))

    p = params["params"]

    def t_dw(name, k):
        conv = torch.nn.Conv2d(c, c, k, 1, k // 2, groups=c)
        kern = np.asarray(p[name]["kernel"])  # (kh, kw, 1, c)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(kern.transpose(3, 2, 0, 1)))
            conv.bias.copy_(torch.from_numpy(np.asarray(p[name]["bias"])))
        return conv

    feat = torch.from_numpy(x[:, 1:]).transpose(1, 2).reshape(b, c, h, w)
    ref = t_dw("proj", 7)(feat) + feat + t_dw("proj1", 5)(feat) + t_dw("proj2", 3)(feat)
    ref = ref.flatten(2).transpose(1, 2).detach().numpy()
    np.testing.assert_allclose(out[:, 1:], ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[:, 0], x[:, 0], atol=0)  # cls passthrough


def test_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x1 = rng.normal(size=(3, 5)).astype(np.float32)
    x2 = rng.normal(size=(3, 7)).astype(np.float32)
    mod = Bilinear(4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2))
    out = np.asarray(mod.apply(params, jnp.asarray(x1), jnp.asarray(x2)))

    t = torch.nn.Bilinear(5, 7, 4)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(np.asarray(params["params"]["weight"])))
        t.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
    ref = t(torch.from_numpy(x1), torch.from_numpy(x2)).detach().numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bilinear_fusion_shapes_and_outer_product():
    rng = np.random.default_rng(3)
    v1 = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
    mod = BilinearFusion(skip=1, use_bilinear=1, gate1=1, gate2=1, dim1=128, dim2=128,
                         mmhid=128, dropout_rate=0.25)
    variables = mod.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, v1, v2,
                         deterministic=True)
    out, mutated = mod.apply(variables, v1, v2, deterministic=False,
                             use_running_average=False,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
    assert out.shape == (4, 128)
    assert "batch_stats" in mutated
    # eval path uses running stats
    out_eval = mod.apply(variables, v1, v2, deterministic=True)
    assert out_eval.shape == (4, 128)


def test_trilinear_fusion_shapes():
    rng = np.random.default_rng(4)
    vs = [jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32)) for _ in range(3)]
    for variant in ("A", "B"):
        mod = TrilinearFusion(variant=variant, mmhid=96)
        variables = mod.init({"params": jax.random.PRNGKey(0),
                              "dropout": jax.random.PRNGKey(1)}, *vs,
                             deterministic=True)
        out = mod.apply(variables, *vs, deterministic=True)
        assert out.shape == (2, 96)


def test_fusion_net_and_poolers():
    rng = np.random.default_rng(5)
    gene = jnp.asarray(rng.normal(size=(2, 10, 128)).astype(np.float32))
    img = jnp.asarray(rng.normal(size=(2, 10, 128)).astype(np.float32))
    fn = FusionNet(128)
    params = fn.init(jax.random.PRNGKey(0), gene, img)
    assert fn.apply(params, gene, img).shape == (2, 10, 128)

    pooler = Pooler(128)
    params = pooler.init(jax.random.PRNGKey(0), gene)
    assert pooler.apply(params, gene).shape == (2, 128)

    gated = AttnNetGated(hidden=64, n_classes=1)
    params = gated.init(jax.random.PRNGKey(0), gene)
    scores, x = gated.apply(params, gene)
    assert scores.shape == (2, 10, 1)
    assert x.shape == gene.shape


def test_transformer_encoder_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    b, l, e = 2, 7, 16
    x = rng.normal(size=(b, l, e)).astype(np.float32)

    mod = TransformerEncoder(num_layers=1, d_model=e, nhead=4, dim_feedforward=32,
                             dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), deterministic=True)
    out = np.asarray(mod.apply(params, jnp.asarray(x), deterministic=True))

    layer = torch.nn.TransformerEncoderLayer(d_model=e, nhead=4, dim_feedforward=32,
                                             dropout=0.0, activation="relu",
                                             batch_first=True)
    p = params["params"]["layer0"]
    sa = p["self_attn"]
    wq = np.asarray(sa["q_proj"]["kernel"]).T
    wk = np.asarray(sa["k_proj"]["kernel"]).T
    wv = np.asarray(sa["v_proj"]["kernel"]).T
    with torch.no_grad():
        layer.self_attn.in_proj_weight.copy_(
            torch.from_numpy(np.concatenate([wq, wk, wv], 0)))
        layer.self_attn.in_proj_bias.copy_(torch.from_numpy(np.concatenate(
            [np.asarray(sa["q_proj"]["bias"]), np.asarray(sa["k_proj"]["bias"]),
             np.asarray(sa["v_proj"]["bias"])], 0)))
        layer.self_attn.out_proj.weight.copy_(
            torch.from_numpy(np.asarray(sa["out_proj"]["kernel"]).T))
        layer.self_attn.out_proj.bias.copy_(
            torch.from_numpy(np.asarray(sa["out_proj"]["bias"])))
        layer.linear1.weight.copy_(torch.from_numpy(np.asarray(p["linear1"]["kernel"]).T))
        layer.linear1.bias.copy_(torch.from_numpy(np.asarray(p["linear1"]["bias"])))
        layer.linear2.weight.copy_(torch.from_numpy(np.asarray(p["linear2"]["kernel"]).T))
        layer.linear2.bias.copy_(torch.from_numpy(np.asarray(p["linear2"]["bias"])))
        layer.norm1.weight.copy_(torch.from_numpy(np.asarray(p["norm1"]["scale"])))
        layer.norm1.bias.copy_(torch.from_numpy(np.asarray(p["norm1"]["bias"])))
        layer.norm2.weight.copy_(torch.from_numpy(np.asarray(p["norm2"]["scale"])))
        layer.norm2.bias.copy_(torch.from_numpy(np.asarray(p["norm2"]["bias"])))
    layer.eval()
    ref = layer(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
