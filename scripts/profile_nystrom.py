#!/usr/bin/env python
"""Component-level timing of the Nystrom stack (CMTA / TransMIL) on the live
device — locates where the step time goes before optimizing (the repo rule:
step-level A/B only).

Times (fetch-synced, two-point): full train steps, one TransLayer fwd+bwd at
each model's shape (pallas on/off), the NS pinv chain alone, and the landmark
segment-mean + small-chain block alone.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, steps=10, small=2):
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.ravel()[0]))

    def run(n):
        o = None
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(np.asarray(leaf.ravel()[0]))
        return time.perf_counter() - t0

    t_small = run(small)
    t_big = run(small + steps)
    return (t_big - t_small) / steps * 1000.0


def step_time(mode, fixdim=2500, batch_size=8, use_pallas=True,
              path_arch="abmil"):
    import jax

    from __graft_entry__ import _example_batch
    from sml_tpu.config import Config
    from sml_tpu.models.factory import define_net, define_optimizer, init_model
    from sml_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from sml_tpu.train.state import TrainState
    from sml_tpu.train.steps import make_train_step

    config = Config(mode=mode, fixdim=fixdim, batch_size=batch_size,
                    task_type="survival", compute_dtype="bfloat16",
                    use_pallas=use_pallas, path_arch=path_arch)
    mesh = make_mesh(config)
    model = define_net(config)
    batch = _example_batch(config, batch_size)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    tx = define_optimizer(config, steps_per_epoch=100)
    state = replicate_tree(mesh, TrainState.create(variables, tx,
                                                   jax.random.PRNGKey(1)))
    dev_batch = shard_batch(mesh, batch)
    train_step = make_train_step(config, model, tx)

    # train_step donates the state: rebind it every call (bench.py pattern)
    box = {"s": state}

    def stepper(b):
        box["s"], m = train_step(box["s"], b)
        return m

    return timed(stepper, (dev_batch,))


def translayer_time(dim, n_tokens, batch=8, use_pallas=True, train=True):
    """One TransLayer (Nystrom attention + FF residual block) fwd(+bwd)."""
    import jax
    import jax.numpy as jnp

    from sml_tpu.models.mil import TransLayer

    layer = TransLayer(dim, dtype=jnp.bfloat16, use_pallas=use_pallas)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, n_tokens, dim), jnp.float32)
    variables = layer.init({"params": rng}, x, deterministic=True)

    if train:
        def loss_fn(v, x):
            out = layer.apply(v, x, deterministic=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        fn = jax.jit(jax.grad(loss_fn))
    else:
        fn = jax.jit(lambda v, x: layer.apply(v, x, deterministic=True))
    return timed(fn, (variables, x))


def pinv_time(bh, m, train=True):
    """The 6-iteration NS pinv chain alone, f32, on softmax-like input."""
    import jax
    import jax.numpy as jnp

    from sml_tpu.ops.linear_algebra import moore_penrose_pinv

    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (bh, m, m), jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)

    if train:
        fn = jax.jit(jax.grad(
            lambda a: jnp.sum(moore_penrose_pinv(a, 6) ** 2)))
    else:
        fn = jax.jit(lambda a: moore_penrose_pinv(a, 6))
    return timed(fn, (attn,))


def landmark_block_time(b, h, n_pad, m, dh, train=True):
    """landmark segment means + sim2 softmax + pinv + the m-sized z matmul —
    everything the round-3 fusion left in XLA."""
    import jax
    import jax.numpy as jnp

    from sml_tpu.ops.linear_algebra import moore_penrose_pinv

    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, h, n_pad, dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, n_pad, dh), jnp.bfloat16)
    x3 = jax.random.normal(jax.random.PRNGKey(2), (b, h, m, dh), jnp.bfloat16)
    seg = n_pad // m

    def block(q, k, x3):
        q_l = q.reshape(b, h, m, seg, dh).sum(axis=3) / seg
        k_l = k.reshape(b, h, m, seg, dh).sum(axis=3) / seg
        sim2 = jnp.einsum("bhid,bhjd->bhij", q_l, k_l)
        attn2 = jax.nn.softmax(sim2.astype(jnp.float32), axis=-1)
        inv = moore_penrose_pinv(attn2, 6)
        z = inv @ x3.astype(jnp.float32)
        return q_l, k_l, z

    if train:
        fn = jax.jit(jax.grad(lambda q, k, x3: sum(
            jnp.sum(t.astype(jnp.float32) ** 2) for t in block(q, k, x3))))
    else:
        fn = jax.jit(block)
    return timed(fn, (q, k, x3))


def chain_block_time(b=8, h=8, n=2560, m=128, dh=32, train=True):
    """The two N-sized softmax chains + value matmuls exactly as the XLA
    fallback runs them (sim1/sim3 + attn2_inv association) — how much of a
    TransLayer the chains cost."""
    import jax
    import jax.numpy as jnp

    ks = [jax.random.normal(jax.random.PRNGKey(i), s, jnp.bfloat16)
          for i, s in enumerate([(b, h, n, dh), (b, h, n, dh), (b, h, m, dh),
                                 (b, h, m, dh), (b, h, n, dh), (b, h, m, m)])]

    def block(q, k, q_l, k_l, v, inv):
        sim1 = jnp.einsum("bhid,bhjd->bhij", q, k_l)
        sim3 = jnp.einsum("bhid,bhjd->bhij", q_l, k)
        attn1 = jax.nn.softmax(sim1, axis=-1)
        attn3 = jax.nn.softmax(sim3, axis=-1)
        return (attn1 @ inv.astype(attn1.dtype)) @ (attn3 @ v)

    if train:
        fn = jax.jit(jax.grad(lambda *a: jnp.sum(block(*a).astype(jnp.float32)
                                                 ** 2), argnums=(0, 1, 4)))
    else:
        fn = jax.jit(block)
    return timed(fn, tuple(ks))


def transformer_p_time(b=8, n=2500, d=256, use_pallas=True, train=True):
    import jax
    import jax.numpy as jnp

    from sml_tpu.models.cmta import TransformerP

    mod = TransformerP(d, dtype=jnp.bfloat16, use_pallas=use_pallas)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, n, d), jnp.float32)
    variables = mod.init({"params": rng}, x, deterministic=True)
    if train:
        def loss_fn(v, x):
            cls, tok = mod.apply(v, x, deterministic=True)
            return (jnp.sum(cls.astype(jnp.float32) ** 2)
                    + jnp.sum(tok.astype(jnp.float32) ** 2))
        fn = jax.jit(jax.grad(loss_fn))
    else:
        fn = jax.jit(lambda v, x: mod.apply(v, x, deterministic=True))
    return timed(fn, (variables, x))


def raw_mha_time(b=8, nq=2500, nk=5, d=256, train=True):
    import jax
    import jax.numpy as jnp

    from sml_tpu.ops.attention import RawMultiheadAttention

    mod = RawMultiheadAttention(d, 1, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, nq, d), jnp.float32)
    kv = jax.random.normal(jax.random.PRNGKey(1), (b, nk, d), jnp.float32)
    variables = mod.init({"params": rng}, q, kv, kv, deterministic=True)
    if train:
        fn = jax.jit(jax.grad(lambda v, q, kv: jnp.sum(
            mod.apply(v, q, kv, kv, deterministic=True)[0]
            .astype(jnp.float32) ** 2)))
    else:
        fn = jax.jit(lambda v, q, kv: mod.apply(v, q, kv, kv,
                                                deterministic=True)[0])
    return timed(fn, (variables, q, kv))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", nargs="+", default=["all"])
    args = ap.parse_args()
    which = set(args.which)
    res = {}

    def want(k):
        return "all" in which or k in which

    if want("steps"):
        res["cmta_step_pallas"] = step_time("cmta")
        res["transmil_step_pallas"] = step_time("path", path_arch="transmil")
        print(json.dumps(res), flush=True)
    if want("steps_xla"):
        res["cmta_step_xla"] = step_time("cmta", use_pallas=False)
        res["transmil_step_xla"] = step_time("path", path_arch="transmil",
                                             use_pallas=False)
        print(json.dumps(res), flush=True)
    if want("layers"):
        # cmta TransformerP layer: dim 256, n = 2501 -> front-pad to 2560
        res["translayer_cmta_pallas"] = translayer_time(256, 2501, use_pallas=True)
        res["translayer_cmta_xla"] = translayer_time(256, 2501, use_pallas=False)
        # transmil layer: dim 512, n = 2501 -> 2560
        res["translayer_transmil_pallas"] = translayer_time(512, 2501,
                                                            use_pallas=True)
        res["translayer_transmil_xla"] = translayer_time(512, 2501,
                                                         use_pallas=False)
        print(json.dumps(res), flush=True)
    if want("cmta_parts"):
        res["transformer_p_train_pallas"] = transformer_p_time(use_pallas=True)
        res["transformer_p_train_xla"] = transformer_p_time(use_pallas=False)
        res["transformer_g_equiv_train"] = transformer_p_time(n=4)
        res["mha_p_in_g_train"] = raw_mha_time(nq=2500, nk=5)
        res["mha_g_in_p_train"] = raw_mha_time(nq=5, nk=2500)
        res["cmta_eval_fwd"] = None
        print(json.dumps(res), flush=True)
    if want("chains"):
        res["chain_block_cmta_train"] = chain_block_time(dh=32, m=128)
        res["chain_block_transmil_train"] = chain_block_time(dh=64, m=256)
        res["cmta_step_gated"] = step_time("cmta")   # after the dh-gate fix
        print(json.dumps(res), flush=True)
    if want("pinv"):
        res["pinv_m128_train"] = pinv_time(64, 128)
        res["pinv_m256_train"] = pinv_time(64, 256)
        res["landmark_block_cmta"] = landmark_block_time(8, 8, 2560, 128, 32)
        res["landmark_block_transmil"] = landmark_block_time(8, 8, 2560, 256, 64)
        print(json.dumps(res), flush=True)

    print("FINAL " + json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
