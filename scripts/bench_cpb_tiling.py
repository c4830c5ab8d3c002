#!/usr/bin/env python
"""A/B the CPB backward kernel's row-block count at a given shape.

The picker's soft-VMEM rule selects the FIRST (wsplit, n_rb) fitting the 10 MB
budget (fewest chunks, then fewest row blocks that fit).  At the 4k shape that
lands on (2, 8), which costs n_rb x u re-reads (~536 MB/branch) plus du
partials written per row-block and re-read by the XLA sum (~1.07 GB/branch).
Smaller n_rb trades VMEM headroom for less HBM traffic.  This script times
_cpb_bwd_call standalone for each legal n_rb so the picker can be retuned on
measurement (see BENCH.md round-3 notes on step-level vs kernel-level A/Bs).
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixdim", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--variants", nargs="+", type=int, default=[8, 4, 2, 1])
    ap.add_argument("--fwd", action="store_true", help="also A/B the forward")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import sml_tpu.ops.pallas.deform_attn as da

    side = int(np.ceil(np.sqrt(args.fixdim)))
    h = w = side
    hd = side // 4
    j = hd * hd
    dm = 32
    bg = args.batch * args.groups
    rng = np.random.default_rng(0)

    dx = jnp.asarray(rng.standard_normal((bg, w * j)), jnp.float32)
    dy = jnp.asarray(rng.standard_normal((bg, h, j)), jnp.float32)
    w0x = jnp.asarray(rng.standard_normal((dm,)), jnp.bfloat16)
    w0y = jnp.asarray(rng.standard_normal((dm,)), jnp.bfloat16)
    b0 = jnp.asarray(rng.standard_normal((dm,)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((dm, dm)), jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((dm,)), jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((dm, 1)), jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((1,)), jnp.float32)
    dbias = jnp.asarray(rng.standard_normal((bg, h, w * j)), jnp.float32)

    orig_pick = da._pick_tiling
    results = {"fixdim": args.fixdim, "side": side, "J": j, "bg": bg,
               "device": str(jax.devices()[0])}

    def timed(fn, steps=args.steps, small=2):
        out = fn()
        float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]))

        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn()
            float(np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0]))
            return time.perf_counter() - t0

        t_small = run(small)
        t_big = run(small + steps)
        return (t_big - t_small) / steps * 1000.0

    baseline = orig_pick(dm, w, h, j, 2, bwd=True)
    print("picker default (wsplit, n_rb):", baseline, flush=True)
    results["picker_default"] = list(baseline) if baseline else None

    # A/B the two grid orders at the natural tiling
    for order in ("rs", "sr"):
        try:
            da._cpb_bwd_call.clear_cache()
            fn = lambda: da._cpb_bwd_call(dx, dy, w0x, w0y, b0, w1, b1, w2, dbias,
                                             order=order)
            ms = timed(fn)
            results[f"bwd_order_{order}_ms"] = ms
            print(f"bwd order={order}: {ms:.3f} ms", flush=True)
        except Exception as e:
            results[f"bwd_order_{order}_ms"] = None
            print(f"bwd order={order}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    for nb in args.variants:
        if h % nb:
            continue

        def forced(dm_, w_, h_, j_, usize, bwd, _nb=nb):
            got = orig_pick(dm_, w_, h_, j_, usize, bwd)
            if got is None or not bwd:
                return got
            return got[0], _nb

        da._pick_tiling = forced
        try:
            # same arg shapes across variants: drop the cached executable or
            # every variant would silently reuse the first compile
            da._cpb_bwd_call.clear_cache()
            fn = lambda: da._cpb_bwd_call(dx, dy, w0x, w0y, b0, w1, b1, w2, dbias)
            ms = timed(fn)
            results[f"bwd_nrb{nb}_ms"] = ms
            print(f"bwd n_rb={nb}: {ms:.3f} ms", flush=True)
        except Exception as e:  # lowering/VMEM failures are data too
            results[f"bwd_nrb{nb}_ms"] = None
            print(f"bwd n_rb={nb}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            da._pick_tiling = orig_pick

    if args.fwd:
        for nb in args.variants:
            if h % nb:
                continue

            def forcedf(dm_, w_, h_, j_, usize, bwd, _nb=nb):
                got = orig_pick(dm_, w_, h_, j_, usize, bwd)
                if got is None or bwd:
                    return got
                return got[0], _nb

            da._pick_tiling = forcedf
            try:
                da.fused_cpb_bias.clear_cache()
                fn = lambda: da.fused_cpb_bias(dx, dy, w0x, w0y, b0,
                                               w1, b1, w2, b2)
                ms = timed(fn)
                results[f"fwd_nrb{nb}_ms"] = ms
                print(f"fwd n_rb={nb}: {ms:.3f} ms", flush=True)
            except Exception as e:
                results[f"fwd_nrb{nb}_ms"] = None
                print(f"fwd n_rb={nb}: FAILED {type(e).__name__}: {e}",
                      flush=True)
            finally:
                da._pick_tiling = orig_pick

    print(json.dumps(results))


if __name__ == "__main__":
    main()
