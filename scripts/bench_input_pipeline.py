#!/usr/bin/env python
"""Input-pipeline measurement (VERDICT r3 item 7).

Phases (independently selectable; --host needs no TPU):

  --host    PackedLoader sustained throughput over a full epoch — C++ threaded
            prefetcher vs numpy-mmap fallback, warm page cache, plus a
            cold-ish run (posix_fadvise DONTNEED between epochs).
  --device  host->device transfer rate through the axon tunnel (device_put,
            fetch-synced) at sample and batch granularity, and the streamed
            device-loop trainer's compute/transfer overlap: epoch wall time
            with chunked double-buffering vs steps x pure-compute step time.

Writes benchmarks/input_pipeline.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build_pack(tmp: str, n: int, fixdim: int) -> str:
    from sml_tpu.config import Config
    from sml_tpu.data.packed import pack_dataset
    from sml_tpu.data.synthetic import SyntheticDataset

    path = os.path.join(tmp, f"pack_{fixdim}_{n}.bin")
    if not os.path.exists(path + ".json"):
        config = Config(dataset="synthetic", synthetic_size=n, fixdim=fixdim,
                        task_type="survival")
        ds = SyntheticDataset("Train", config)
        pack_dataset(ds, path)
    return path


def _epoch_mbps(path: str, batch_size: int, native: bool, epochs: int = 3,
                drop_cache: bool = False) -> float:
    from sml_tpu.data.packed import PackedLoader

    loader = PackedLoader(path, batch_size, shuffle=True,
                          use_native=native, queue_depth=4, workers=4)
    meta = json.load(open(path + ".json"))
    epoch_bytes = meta["record_bytes"] * (len(loader) * batch_size)
    rates = []
    for e in range(epochs):
        if drop_cache:
            fd = os.open(path, os.O_RDONLY)
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            os.close(fd)
        loader.set_epoch(e)
        t0 = time.perf_counter()
        nb = 0
        for batch in loader:
            nb += batch["labels"].shape[0]
        dt = time.perf_counter() - t0
        rates.append(epoch_bytes / dt / 1e6)
    # warm runs: report the best (first epoch may include thread spin-up)
    return max(rates) if not drop_cache else min(rates)


def host_phase(res: dict, tmp: str, fixdim: int, n: int, batch_size: int):
    path = _build_pack(tmp, n, fixdim)
    meta = json.load(open(path + ".json"))
    res["record_mb"] = meta["record_bytes"] / 1e6
    res["epoch_mb"] = meta["record_bytes"] * n / 1e6
    res["host_native_warm_mbps"] = _epoch_mbps(path, batch_size, native=True)
    res["host_numpy_warm_mbps"] = _epoch_mbps(path, batch_size, native=False)
    res["host_native_cold_mbps"] = _epoch_mbps(path, batch_size, native=True,
                                               drop_cache=True)
    print(json.dumps(res), flush=True)


def device_phase(res: dict, fixdim: int, batch_size: int):
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    res["device"] = str(dev)

    def put_mbps(nbytes_shape, reps=6):
        arrs = [np.random.default_rng(i).standard_normal(
            nbytes_shape, dtype=np.float32) for i in range(2)]
        x = jax.device_put(arrs[0], dev)
        float(np.asarray(x.ravel()[0]))            # sync
        t0 = time.perf_counter()
        for i in range(reps):
            x = jax.device_put(arrs[i % 2], dev)
            float(np.asarray(x.ravel()[0]))        # fetch-sync each put
        dt = time.perf_counter() - t0
        return arrs[0].nbytes * reps / dt / 1e6

    # one sample (fixdim x 1024 f32) and one batch
    res["tunnel_put_sample_mbps"] = put_mbps((fixdim, 1024))
    res["tunnel_put_batch_mbps"] = put_mbps((batch_size, fixdim, 1024))

    # streamed device-loop overlap: epoch wall time vs pure-compute time
    from __graft_entry__ import _example_batch
    from sml_tpu.config import Config
    from sml_tpu.models.factory import define_net, define_optimizer, init_model
    from sml_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from sml_tpu.train.state import TrainState
    from sml_tpu.train.steps import make_train_step
    from sml_tpu.train.steps import make_epoch_scan

    steps_per_epoch = 12
    chunk = 3
    config = Config(mode="deformpathomic", fixdim=fixdim, batch_size=batch_size,
                    task_type="survival", compute_dtype="bfloat16",
                    gradient_modulate=True, return_vgrid=True,
                    device_loop=True, device_loop_chunk=chunk)
    mesh = make_mesh(config)
    model = define_net(config)
    batch = _example_batch(config, batch_size)
    variables = init_model(config, model, jax.random.PRNGKey(0), batch)
    tx = define_optimizer(config, steps_per_epoch=steps_per_epoch)
    state = replicate_tree(mesh, TrainState.create(variables, tx,
                                                   jax.random.PRNGKey(1)))

    # host-side epoch: fresh numpy batches (the loader's output contract)
    host_batches = [
        {k: np.asarray(v) for k, v in
         _example_batch(config, batch_size, rng_seed=s).items()}
        for s in range(steps_per_epoch)]

    scan_fn = make_epoch_scan(config, model, tx, num_steps=chunk)

    def run_epoch(state):
        buf, out = [], None
        for hb in host_batches:
            buf.append(hb)
            if len(buf) == chunk:
                stacked = {k: np.stack([b[k] for b in buf]) for k in buf[0]}
                dev_b = shard_batch(mesh, stacked)
                state, out = scan_fn(state, dev_b)
                buf = []
        return state, out

    # make_epoch_scan donates BOTH state and batch buffers: chain states and
    # rebuild dev batches every epoch (that is the production contract)
    state1, m = run_epoch(state)                    # compile
    float(np.asarray(m["loss"][-1]))
    t0 = time.perf_counter()
    state2, m = run_epoch(state1)
    float(np.asarray(m["loss"][-1]))
    epoch_sec = time.perf_counter() - t0
    res["epoch_wall_ms_per_step"] = epoch_sec / steps_per_epoch * 1000

    # pure compute: bench.py-style non-donating scan over ONE device-resident
    # batch passed as a jit argument
    raw_step = make_train_step(config, model, tx, jit=False)

    def steps_fn(s, b, kk):
        def body(st, _):
            st, mm = raw_step(st, b)
            return st, mm["loss"]
        s, losses = jax.lax.scan(body, s, None, length=kk)
        return s, losses[-1]

    dev_b1 = shard_batch(mesh, host_batches[0])
    k_small, k_big = 2, 2 + steps_per_epoch
    scan_small = jax.jit(lambda s, b: steps_fn(s, b, k_small))
    scan_big = jax.jit(lambda s, b: steps_fn(s, b, k_big))
    _, l = scan_small(state2, dev_b1)
    float(np.asarray(l))
    _, l = scan_big(state2, dev_b1)
    float(np.asarray(l))
    t0 = time.perf_counter()
    _, l = scan_small(state2, dev_b1)
    float(np.asarray(l))
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, l = scan_big(state2, dev_b1)
    float(np.asarray(l))
    t_big = time.perf_counter() - t0
    res["compute_only_ms_per_step"] = (t_big - t_small) / steps_per_epoch * 1000
    res["overlap_overhead_pct"] = 100 * (res["epoch_wall_ms_per_step"]
                                         / res["compute_only_ms_per_step"] - 1)
    print(json.dumps(res), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", action="store_true")
    ap.add_argument("--device", action="store_true")
    ap.add_argument("--fixdim", type=int, default=2500)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--tmp", default="/tmp/sml_pack")
    args = ap.parse_args()
    os.makedirs(args.tmp, exist_ok=True)

    out_path = os.path.join(REPO, "benchmarks", "input_pipeline.json")
    res = {}
    if os.path.exists(out_path):
        res = json.load(open(out_path))
    res.update({"fixdim": args.fixdim, "n_samples": args.n,
                "batch_size": args.batch_size})
    if args.host:
        host_phase(res, args.tmp, args.fixdim, args.n, args.batch_size)
    if args.device:
        device_phase(res, args.fixdim, args.batch_size)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("FINAL " + json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
