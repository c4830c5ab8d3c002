#!/usr/bin/env python
"""Component-level timing of the deformpathomic step on the live device.

Times (fetch-synced, two-point to cancel tunnel overhead): full train step,
eval forward, the CPB bias alone (pallas + naive, fwd and fwd+bwd), the
deformable attention with CPB zeroed, and the grid-sample+offsets path — to
locate where the step time goes before optimizing.
"""

from __future__ import annotations

import argparse
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
    float(np.asarray(leaf.ravel()[0]))  # sync (compile)

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(np.asarray(leaf.ravel()[0]))
        return time.perf_counter() - t0

    t_small = run(small)
    t_big = run(small + steps)
    return (t_big - t_small) / steps * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--fixdim", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--components", nargs="+", default=["all"])
    ap.add_argument("--dropout_rate", type=float, default=0.1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from sml_tpu.config import Config
    from sml_tpu.models.factory import define_net, define_optimizer, init_model
    from sml_tpu.ops.deformable import CPB2D
    from sml_tpu.train.state import TrainState
    from sml_tpu.train.steps import make_eval_step, make_train_step

    b, n = args.batch_size, args.fixdim
    side = int(np.ceil(np.sqrt(n)))
    hd = side // 4
    j = hd * hd
    g = 8
    results = {"batch_size": b, "fixdim": n, "side": side, "J": j,
               "device": str(jax.devices()[0])}
    want = set(args.components)
    has = lambda k: "all" in want or k in want

    config = Config(mode="deformpathomic", fixdim=n, batch_size=b,
                    task_type="diag2021", compute_dtype="bfloat16",
                    gradient_modulate=True, return_vgrid=True, use_pallas=True,
                    dropout_rate=args.dropout_rate)
    model = define_net(config)
    batch = _example_batch(config, b)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)

    if has("train"):
        tx = define_optimizer(config, steps_per_epoch=100)
        state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
        # no donation so the same state can be reused across timing reps
        step_nodonate = jax.jit(make_train_step(config, model, tx, jit=False))
        results["train_step_ms"] = timed(
            lambda s: step_nodonate(s, batch)[1]["loss"], (state,), args.steps)
        print("train_step_ms", results["train_step_ms"], flush=True)

    if has("fwd"):
        eval_step = make_eval_step(config, model)
        results["eval_fwd_ms"] = timed(
            lambda v: eval_step(v, batch)["loss"], (variables,), args.steps)
        print("eval_fwd_ms", results["eval_fwd_ms"], flush=True)

    # CPB alone at the deform shapes: x/y axes length `side`, grid_kv (B*g, J, 2)
    rng = np.random.default_rng(0)
    x_axis = jnp.asarray(np.linspace(-1, 1, side, dtype=np.float32))
    y_axis = jnp.asarray(np.linspace(-1, 1, side, dtype=np.float32))
    grid_kv = jnp.asarray(rng.uniform(-1, 1, size=(b * g, j, 2)).astype(np.float32))

    for impl in ("pallas", "naive"):
        if not has(f"cpb_{impl}"):
            continue
        mod = CPB2D(dim=32, heads=8, offset_groups=g, impl=impl,
                    dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x_axis, y_axis, grid_kv, b)

        fwd = jax.jit(lambda p, gkv: mod.apply(p, x_axis, y_axis, gkv, b))
        results[f"cpb_{impl}_fwd_ms"] = timed(fwd, (params, grid_kv), args.steps)
        print(f"cpb_{impl}_fwd_ms", results[f"cpb_{impl}_fwd_ms"], flush=True)

        def loss_fn(p, gkv):
            return jnp.sum(mod.apply(p, x_axis, y_axis, gkv, b) ** 2)

        grad = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        results[f"cpb_{impl}_fwdbwd_ms"] = timed(
            lambda p, gkv: grad(p, gkv)[1], (params, grid_kv), args.steps)
        print(f"cpb_{impl}_fwdbwd_ms", results[f"cpb_{impl}_fwdbwd_ms"], flush=True)

    if has("attn"):
        # the XLA attention epilogue alone at model shapes: sim + bias + softmax
        # + attn@v, fwd+bwd wrt q/k/v/bias (the chain that materializes the
        # (B, h, N, J) f32 tensors around the Pallas CPB kernel)
        heads, dh = 8, 64
        qh = jnp.asarray(rng.standard_normal((b, heads, n, dh)), jnp.bfloat16)
        kh = jnp.asarray(rng.standard_normal((b, heads, j, dh)), jnp.bfloat16)
        vh = jnp.asarray(rng.standard_normal((b, heads, j, dh)), jnp.bfloat16)
        bias_in = jnp.asarray(rng.standard_normal((b, heads, n, j)), jnp.float32)

        def attn_chain(q_, k_, v_, bias_):
            sim = jnp.einsum("bhid,bhjd->bhij", q_, k_) + bias_
            sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v_)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gfn = jax.jit(jax.grad(attn_chain, argnums=(0, 1, 2, 3)))
        results["attn_chain_fwdbwd_ms"] = timed(
            lambda *a: gfn(*a)[0], (qh, kh, vh, bias_in), args.steps)
        print("attn_chain_fwdbwd_ms", results["attn_chain_fwdbwd_ms"], flush=True)

    if has("gridsample"):
        # grid-sample fwd+bwd at model shapes: (B*g, H, W, c/g) map, J points
        from sml_tpu.ops.grid_sample import grid_sample_2d

        bgg = b * g
        img = jnp.asarray(rng.standard_normal((bgg, side, side, 128 // g)),
                          jnp.bfloat16)
        hd2 = side // 4
        pts = jnp.asarray(rng.uniform(-1, 1, (bgg, hd2, hd2, 2)), jnp.float32)

        def gs_loss(img_, pts_):
            return jnp.sum(grid_sample_2d(img_, pts_).astype(jnp.float32) ** 2)

        ggs = jax.jit(jax.grad(gs_loss, argnums=(0, 1)))
        results["gridsample_fwdbwd_ms"] = timed(
            lambda *a: ggs(*a)[0], (img, pts), args.steps)
        print("gridsample_fwdbwd_ms", results["gridsample_fwdbwd_ms"], flush=True)

    if has("offsets"):
        # offset conv stack fwd+bwd: depthwise 6x6 stride-4 + gelu + 1x1 + tanh
        from flax import linen as fnn
        from sml_tpu.ops.common import torch_kernel_init

        bgg = b * g
        od = 512 // g                   # offset_dims = inner_dim / g
        gq = jnp.asarray(rng.standard_normal((bgg, side, side, od)), jnp.bfloat16)

        class Off(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                x = fnn.Conv(od, (6, 6), strides=(4, 4), padding=((1, 1), (1, 1)),
                             feature_group_count=od, kernel_init=torch_kernel_init,
                             dtype=jnp.bfloat16)(x)
                x = fnn.gelu(x, approximate=False)
                x = fnn.Conv(2, (1, 1), use_bias=False,
                             kernel_init=torch_kernel_init,
                             dtype=jnp.bfloat16)(x)
                return jnp.tanh(x)

        om = Off()
        op = om.init(jax.random.PRNGKey(0), gq)

        def off_loss(p, x):
            return jnp.sum(om.apply(p, x).astype(jnp.float32) ** 2)

        goff = jax.jit(jax.grad(off_loss, argnums=(0, 1)))
        results["offsets_fwdbwd_ms"] = timed(
            lambda *a: goff(*a)[1], (op, gq), args.steps)
        print("offsets_fwdbwd_ms", results["offsets_fwdbwd_ms"], flush=True)

    if has("fusedattn"):
        # the fused attention-epilogue kernel alone (fwd+bwd), with and
        # without the dropout-mask operand, at model shapes
        from sml_tpu.ops.pallas.deform_attn import deform_attention_trainable

        heads, dh = 8, 64
        bgf = b * heads
        qf = jnp.asarray(rng.standard_normal((bgf, n, dh)), jnp.bfloat16)
        kf = jnp.asarray(rng.standard_normal((bgf, j, dh)), jnp.bfloat16)
        vf = jnp.asarray(rng.standard_normal((bgf, j, dh)), jnp.bfloat16)
        bias_f = jnp.asarray(rng.standard_normal((bgf, n, j)), jnp.float32)
        mask_f = jnp.asarray(
            (rng.uniform(size=(bgf, n, j)) < 0.9), jnp.bfloat16)

        def floss(q_, k_, v_, b_, m_):
            o = deform_attention_trainable(
                q_, k_, v_, b_, m_,
                keep_prob=0.9 if m_ is not None else 1.0)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g_nomask = jax.jit(jax.grad(lambda q_, k_, v_, b_:
                                    floss(q_, k_, v_, b_, None),
                                    argnums=(0, 1, 2, 3)))
        results["fusedattn_fwdbwd_ms"] = timed(
            lambda *a: g_nomask(*a)[0], (qf, kf, vf, bias_f), args.steps)
        print("fusedattn_fwdbwd_ms", results["fusedattn_fwdbwd_ms"], flush=True)

        g_mask = jax.jit(jax.grad(floss, argnums=(0, 1, 2, 3)))
        results["fusedattn_mask_fwdbwd_ms"] = timed(
            lambda *a: g_mask(*a)[0], (qf, kf, vf, bias_f, mask_f), args.steps)
        print("fusedattn_mask_fwdbwd_ms", results["fusedattn_mask_fwdbwd_ms"],
              flush=True)

        mk = jax.jit(lambda key: jax.random.bernoulli(
            key, 0.9, (bgf, n, j)).astype(jnp.bfloat16))
        results["maskgen_ms"] = timed(mk, (jax.random.PRNGKey(7),), args.steps)
        print("maskgen_ms", results["maskgen_ms"], flush=True)

    if has("factors"):
        # CPB displacement-table construction fwd+bwd wrt grid_kv — XLA glue
        # around the kernel.  Round 5: the fat u/v layer-1 tables are built
        # IN-KERNEL, so this is only the thin signed-log dx/dy build (was
        # 6.2 ms/branch at the 4k shape when it included the u/v build).
        mod_f = CPB2D(dim=32, heads=8, offset_groups=g, impl="pallas",
                      dtype=jnp.bfloat16)
        bound = mod_f.bind(mod_f.init(jax.random.PRNGKey(0), x_axis, y_axis,
                                      grid_kv, b))

        def fac_loss(gkv):
            dxf, dyf, *_ = bound.factors(x_axis, y_axis, gkv)
            return (jnp.sum(dxf.astype(jnp.float32) ** 2)
                    + jnp.sum(dyf.astype(jnp.float32) ** 2))

        gfac = jax.jit(jax.grad(fac_loss))
        results["factors_fwdbwd_ms"] = timed(gfac, (grid_kv,), args.steps)
        print("factors_fwdbwd_ms", results["factors_fwdbwd_ms"], flush=True)

    if has("module"):
        # full module / branch fwd+bwd at model shapes: separates kernel cost
        # (cpb_pallas_* + fusedattn_*) from the module's XLA glue (convs,
        # grid-sample, head splits, residual/norm) and the branch's extras
        # (fc1, FusionNet, pooler, heads)
        from sml_tpu.models.deform import DeformCrossTransMIL
        from sml_tpu.ops.deformable import DeformCrossAttention2D

        x1 = jnp.asarray(rng.standard_normal((b, n, 128)), jnp.bfloat16)
        x2 = jnp.asarray(rng.standard_normal((b, n, 128)), jnp.bfloat16)
        attn_mod = DeformCrossAttention2D(dim=128, dim_head=64, heads=8,
                                          dropout=args.dropout_rate,
                                          downsample_factor=4, offset_scale=4.0,
                                          offset_groups=8, offset_kernel_size=6,
                                          use_pallas=True, dtype=jnp.bfloat16)
        ap = attn_mod.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x1, x2)

        def attn_loss(p, a, bq):
            o, vg = attn_mod.apply(p, a, bq, return_vgrid=True,
                                   deterministic=False,
                                   rngs={"dropout": jax.random.PRNGKey(2)})
            return (jnp.sum(o.astype(jnp.float32) ** 2)
                    + jnp.sum(vg.astype(jnp.float32) ** 2))

        gattn = jax.jit(jax.grad(attn_loss, argnums=(0, 1, 2)))
        results["deform2d_fwdbwd_ms"] = timed(
            lambda *a: gattn(*a)[1], (ap, x1, x2), args.steps)
        print("deform2d_fwdbwd_ms", results["deform2d_fwdbwd_ms"], flush=True)

        path_bag = jnp.asarray(rng.standard_normal((b, n, 1024)), jnp.bfloat16)
        omic_vec = jnp.asarray(rng.standard_normal((b, 128)), jnp.bfloat16)
        mil = DeformCrossTransMIL(n_classes=4, path_dim=128, attn_dim=2,
                                  return_vgrid=True, dropout=args.dropout_rate,
                                  use_pallas=True, dtype=jnp.bfloat16)
        mp = mil.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, path_bag, omic_vec)

        def mil_loss(p, bag, om):
            o = mil.apply(p, bag, om, False,
                          rngs={"dropout": jax.random.PRNGKey(2)})
            return sum(jnp.sum(v.astype(jnp.float32) ** 2)
                       for k, v in o.items() if k != "omic")

        gmil = jax.jit(jax.grad(mil_loss, argnums=(0, 1, 2)))
        results["mil_branch_fwdbwd_ms"] = timed(
            lambda *a: gmil(*a)[1], (mp, path_bag, omic_vec), args.steps)
        print("mil_branch_fwdbwd_ms", results["mil_branch_fwdbwd_ms"],
              flush=True)

    if has("nocpb"):
        # deform attention with the CPB zeroed: isolates qkv/offsets/grid-sample/
        # attention cost.  flat_bias -> None also disables the fused epilogue so
        # this measures the XLA chain + glue (the historical meaning).
        import sml_tpu.ops.deformable as dmod

        orig = dmod.CPB2D.__call__
        orig_flat = dmod.CPB2D.flat_bias

        def zero_bias(self, x_coords, y_coords, grid_kv_, batch):
            return jnp.zeros((batch, self.heads, x_coords.shape[0] * y_coords.shape[0],
                              grid_kv_.shape[1]), jnp.float32)

        dmod.CPB2D.__call__ = zero_bias
        dmod.CPB2D.flat_bias = lambda self, *a, **k: None
        try:
            model2 = define_net(config)
            eval_step2 = make_eval_step(config, model2)
            results["eval_fwd_nocpb_ms"] = timed(
                lambda v: eval_step2(v, batch)["loss"], (variables,), args.steps)
            print("eval_fwd_nocpb_ms", results["eval_fwd_nocpb_ms"], flush=True)

            tx = define_optimizer(config, steps_per_epoch=100)
            state2 = TrainState.create(variables, tx, jax.random.PRNGKey(1))
            step2 = jax.jit(make_train_step(config, model2, tx, jit=False))
            results["train_step_nocpb_ms"] = timed(
                lambda s: step2(s, batch)[1]["loss"], (state2,), args.steps)
            print("train_step_nocpb_ms", results["train_step_nocpb_ms"], flush=True)
        finally:
            dmod.CPB2D.__call__ = orig
            dmod.CPB2D.flat_bias = orig_flat

    print(json.dumps(results))


if __name__ == "__main__":
    main()
