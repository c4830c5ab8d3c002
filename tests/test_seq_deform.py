"""Sequence-parallel deformable cross-attention == single-device module exactly.

VERDICT r2 item 6: the flagship's heavy op (DeformCrossAttention2D) sharded over
the query-row axis of a seq mesh — halo'd offset conv, gathered kv, row-local CPB.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sml_tpu.ops.deformable import DeformCrossAttention2D


def _mesh(seq=4):
    devs = np.asarray(jax.devices()[:2 * seq]).reshape(2, seq)
    return Mesh(devs, ("data", "seq"))


def _build(n, seq_mesh=None, dim=32, heads=8, g=8, dh=8):
    return DeformCrossAttention2D(dim=dim, dim_head=dh, heads=heads,
                                  offset_groups=g, dropout=0.0,
                                  cpb_query_chunk=128, seq_mesh=seq_mesh)


@pytest.mark.parametrize("with_mask", [False, True])
def test_seq_deform_matches_single_device(with_mask):
    rng = np.random.default_rng(0)
    b, n, c = 2, 1024, 32                 # 32x32 grid; 4 seq shards of 8 rows
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    mask = None
    if with_mask:
        mask_np = np.ones((b, n), bool)
        mask_np[0, 900:] = False
        mask = jnp.asarray(mask_np)

    plain = _build(n)
    variables = plain.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)
    ref, vgrid_ref = plain.apply(variables, x1, x2, return_vgrid=True,
                                 deterministic=True, mask=mask)

    sharded = _build(n, seq_mesh=_mesh())
    # identical param tree: the seq path declares mirrors with the same names
    out, vgrid = sharded.apply(variables, x1, x2, return_vgrid=True,
                               deterministic=True, mask=mask)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(vgrid), np.asarray(vgrid_ref),
                               rtol=2e-4, atol=2e-5)


def test_seq_deform_param_tree_matches():
    """Init through the seq path builds the SAME checkpoint tree as the plain
    path (mirrors, not new params)."""
    rng = np.random.default_rng(1)
    b, n, c = 1, 256, 32                  # 16x16 grid, 4 shards of 4 rows
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

    plain_vars = _build(n).init(jax.random.PRNGKey(0), x1, x2,
                                deterministic=True)
    seq_vars = _build(n, seq_mesh=_mesh()).init(jax.random.PRNGKey(0), x1, x2,
                                                deterministic=True)
    ps = jax.tree_util.tree_structure(plain_vars)
    ss = jax.tree_util.tree_structure(seq_vars)
    assert ps == ss
    for a, b_ in zip(jax.tree_util.tree_leaves(plain_vars),
                     jax.tree_util.tree_leaves(seq_vars)):
        assert a.shape == b_.shape


@pytest.mark.slow
def test_seq_deform_grads_match_single_device():
    rng = np.random.default_rng(2)
    b, n, c = 1, 1024, 32
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

    plain = _build(n)
    variables = plain.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)

    def loss(params, mod):
        out = mod.apply({"params": params}, x1, x2, deterministic=True)
        return (out ** 2).sum()

    g_ref = jax.grad(loss)(variables["params"], plain)
    g_seq = jax.grad(loss)(variables["params"], _build(n, seq_mesh=_mesh()))
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3,
                                   atol=5e-4)


def test_seq_deform_pallas_kernels_match_plain():
    """Per-shard Pallas CPB + fused attention epilogue inside shard_map
    (interpret mode) == the plain single-device module."""
    rng = np.random.default_rng(3)
    b, n, c = 1, 1024, 32
    x1 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))

    plain = _build(n)
    variables = plain.init(jax.random.PRNGKey(0), x1, x2, deterministic=True)
    ref = plain.apply(variables, x1, x2, deterministic=True)

    sharded_pal = DeformCrossAttention2D(
        dim=32, dim_head=8, heads=8, offset_groups=8, dropout=0.0,
        cpb_query_chunk=128, seq_mesh=_mesh(), use_pallas=True,
        pallas_interpret=True)
    out = sharded_pal.apply(variables, x1, x2, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)

    def loss(params, mod):
        o = mod.apply({"params": params}, x1, x2, deterministic=True)
        return (o ** 2).sum()

    g_ref = jax.grad(loss)(variables["params"], plain)
    g_pal = jax.grad(loss)(variables["params"], sharded_pal)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3,
                                   atol=5e-4)
