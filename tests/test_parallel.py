"""Explicit-collective layer: GatherLayer AD semantics under shard_map, SyncBatchNorm."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sml_tpu.parallel.batchnorm import SyncBatchNorm
from sml_tpu.parallel.collectives import gather_with_local_grad
from sml_tpu.parallel.mesh import make_mesh, shard_batch


def test_gather_with_local_grad_forward_and_backward():
    """Forward = full all_gather; backward passes grads only to the local shard
    (reference GatherLayer, utils/gather.py:5-20)."""
    mesh = make_mesh(num_devices=8)
    x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)

    from jax import shard_map

    def loss_fn(x):
        def inner(xs):
            g = gather_with_local_grad(xs, "data")          # (8, 2) full batch
            # loss depends on ALL shards
            return jnp.sum(g ** 2, keepdims=True)[None]

        per_dev = shard_map(inner, mesh=mesh, in_specs=P("data"),
                            out_specs=P("data"))(x)
        return per_dev.sum()

    val, grad = jax.value_and_grad(loss_fn)(x)
    # forward: every device computed the full sum -> 8 * sum(x^2)
    assert abs(float(val) - 8 * float(jnp.sum(x ** 2))) < 1e-4
    # backward: each shard receives only ITS OWN 2x contribution (from its device's
    # loss term), NOT the 8x it would get with full AD through all_gather
    np.testing.assert_allclose(np.asarray(grad), 2 * np.asarray(x), rtol=1e-6)


def test_sync_batchnorm_matches_global_batchnorm():
    """psum-BN over shards == BatchNorm over the concatenated batch."""
    mesh = make_mesh(num_devices=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32) * 3 + 1)

    bn = SyncBatchNorm(axis_name="data")
    # init outside shard_map: use running stats so no psum is traced
    variables = bn.init(jax.random.PRNGKey(0), x[:2], use_running_average=True)

    from jax import shard_map

    def apply_sharded(x):
        def inner(xs):
            out, mutated = bn.apply(variables, xs, use_running_average=False,
                                    mutable=["batch_stats"])
            return out, mutated["batch_stats"]["mean"][None]

        return shard_map(inner, mesh=mesh, in_specs=P("data"),
                         out_specs=(P("data"), P("data")))(x)

    out_sharded, means = apply_sharded(x)

    # host reference: plain normalization over the full batch
    mean = np.asarray(x).mean(0)
    var = np.asarray(x).var(0)
    expected = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(out_sharded), expected, rtol=1e-4,
                               atol=1e-5)
    # every shard computed the same global RUNNING mean (0.9*0 + 0.1*batch_mean)
    for k in range(8):
        np.testing.assert_allclose(np.asarray(means)[k], 0.1 * mean, rtol=1e-4,
                                   atol=1e-6)


def test_sync_batchnorm_running_stats_torch_semantics():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(32, 4)).astype(np.float32))
    bn = SyncBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x)
    _, mutated = bn.apply(variables, x, use_running_average=False,
                          mutable=["batch_stats"])
    new_mean = np.asarray(mutated["batch_stats"]["mean"])
    batch_mean = np.asarray(x).mean(0)
    np.testing.assert_allclose(new_mean, 0.1 * batch_mean, rtol=1e-5, atol=1e-6)
    # unbiased variance in the running stats (torch semantics)
    n = x.shape[0]
    unbiased = np.asarray(x).var(0) * n / (n - 1)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * unbiased, rtol=1e-5)


def test_shard_batch_shards_leading_axis():
    mesh = make_mesh(num_devices=8)
    batch = {"x": jnp.zeros((8, 3)), "y": jnp.zeros((8,))}
    sharded = shard_batch(mesh, batch)
    assert len(sharded["x"].sharding.device_set) == 8
