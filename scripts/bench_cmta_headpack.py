#!/usr/bin/env python
"""CMTA head-packing experiment (r4 verdict item 3).

At CMTA's TransLayer shape (dim 256 -> dh=32, heads=8, m=128 landmarks,
n_pad=2688 tokens, B=8) the fused Nystrom chains measured SLOWER than XLA's
chain (4.31 vs 3.10 ms/TransLayer, r4) because dh=32 bf16 is a sub-128-byte
lane tile that Mosaic pads 4x.  The named fix: pack P heads into one lane
tile (block-diagonal weights, segment softmax).

This script measures a TIMING PROXY for the packed kernel instead of
implementing it: `deform_attention_trainable` at the shapes a packed kernel
would actually stream and compute —

  pack P heads  ==  bg/P programs, dh*P lanes, J*P kv columns (chain's sim
  becomes (rows, P*J) with per-segment softmax; block-diagonal AV)

The proxy's DMA sizes, MXU work (P^2 x the useful FLOPs — the block-diag
zeros), VPU softmax elements, and grid structure all match the packed kernel;
it omits only the in-kernel block-diagonal build and segment-softmax
slicing, so it UNDERSTATES packed cost.  If the proxy already loses to XLA,
the packed kernel loses harder — a measured negative.  Chain3 can pack at
most P=2 (P=4 needs J=10752 > the 8192-lane store cap, which would force
multi-chunk softmax — strictly more cost).

fwd+bwd timing via jax.grad, fetch-synced two-point protocol (see CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, steps=20, small=2):
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.ravel()[0]))

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
    return (t_big - t_small) / steps * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    from sml_tpu.ops.pallas.deform_attn import (deform_attention_trainable,
                                                fused_attention_supported)

    b, heads, dh, m = 8, 8, 32, 128
    n_pad = 2688  # Transformer_P: 2500 -> 51^2 + cls -> front-pad to 21*128
    bg = b * heads
    rng = np.random.default_rng(0)
    results = {"shape": {"b": b, "heads": heads, "dh": dh, "m": m,
                         "n_pad": n_pad}}

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    def fused_pair_ms(bg_, dh_, jp3, jp1, tag):
        """chain3 (rows=m over jp3 kv) + chain1 (rows=n_pad over jp1 kv)."""
        ok3 = fused_attention_supported(m, jp3, dh_, 2, has_mask=False,
                                        has_bias=False)
        ok1 = fused_attention_supported(n_pad, jp1, dh_, 2, has_mask=False,
                                        has_bias=False)
        if not (ok3 and ok1):
            results[tag] = {"supported": False, "ok3": ok3, "ok1": ok1}
            print(tag, "unsupported", flush=True)
            return
        q3, k3, v3 = mk((bg_, m, dh_)), mk((bg_, jp3, dh_)), mk((bg_, jp3, dh_))
        q1, k1 = mk((bg_, n_pad, dh_)), mk((bg_, jp1, dh_))

        def loss(q3_, k3_, v3_, q1_, k1_):
            x3 = deform_attention_trainable(q3_, k3_, v3_, None)
            # stand-in for z = pinv @ x3 (same shape as chain1's v operand)
            z = x3[:, :jp1] if jp1 <= m else jnp.tile(x3, (1, jp1 // m, 1))
            out = deform_attention_trainable(q1_, k1_, z, None)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
        ms = timed(lambda *a: g(*a)[0], (q3, k3, v3, q1, k1))
        results[tag] = {"supported": True, "ms": ms}
        print(f"{tag}: {ms:.3f} ms", flush=True)

    # A: current fused kernels at dh=32 (the r4-measured loser)
    fused_pair_ms(bg, dh, n_pad, m, "fused_dh32")
    # B: packed proxies
    fused_pair_ms(bg // 2, dh * 2, n_pad * 2, m * 2, "packed_p2_proxy")
    # chain3 P=4 impossible (J cap); mixed best-case: chain1 P=4, chain3 P=2
    ok1_p4 = fused_attention_supported(n_pad, m * 4, dh * 4, 2,
                                       has_mask=False, has_bias=False)
    if ok1_p4:
        q1, k1 = mk((bg // 4, n_pad, dh * 4)), mk((bg // 4, m * 4, dh * 4))
        v1 = mk((bg // 4, m * 4, dh * 4))

        def loss1(q_, k_, v_):
            out = deform_attention_trainable(q_, k_, v_, None)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g1 = jax.jit(jax.grad(loss1, argnums=(0, 1, 2)))
        results["chain1_p4_proxy_ms"] = timed(lambda *a: g1(*a)[0],
                                              (q1, k1, v1))
        print(f"chain1_p4_proxy: {results['chain1_p4_proxy_ms']:.3f} ms",
              flush=True)

    # C: the XLA chain (what the gate currently routes dh=32 to) — both
    # N-sized softmax chains with the (b, h, n, m) tensors in HBM
    qf = mk((b, heads, n_pad, dh))
    kf = mk((b, heads, n_pad, dh))
    vf = mk((b, heads, n_pad, dh))
    ql = mk((b, heads, m, dh))
    kl = mk((b, heads, m, dh))

    def xla_loss(q_, k_, v_, ql_, kl_):
        sim3 = jnp.einsum("bhid,bhjd->bhij", ql_, k_)
        attn3 = jax.nn.softmax(sim3, axis=-1)
        x3 = attn3 @ v_
        sim1 = jnp.einsum("bhid,bhjd->bhij", q_, kl_)
        attn1 = jax.nn.softmax(sim1, axis=-1)
        out = attn1 @ x3
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2, 3, 4)))
    results["xla_chain_ms"] = timed(lambda *a: gx(*a)[0], (qf, kf, vf, ql, kl))
    print(f"xla_chain: {results['xla_chain_ms']:.3f} ms", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "cmta_headpack.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
