"""Training orchestration (reference ``train_test.py:24-461`` + ``main.py:18-128``).

Single-program SPMD: the host loop feeds GLOBAL batches; the mesh shards them; jit
handles gradient sync.  Behavior parity: per-epoch test+val evaluation with
best-on-val checkpointing (filename embeds test metrics), optional every-N-iteration
eval sweeps (the reference's every-10-iters habit — expensive, off by default), seeded
per-epoch shuffling, cosine-per-epoch LR.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from sml_tpu.config import Config
from sml_tpu.data.loader import Loader, build_datasets
from sml_tpu.models.factory import define_net, define_optimizer, init_model
from sml_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from sml_tpu.train import checkpoint as ckpt
from sml_tpu.train.evaluate import evaluate
from sml_tpu.train.state import TrainState
from sml_tpu.train.steps import make_eval_step, make_train_step
from sml_tpu.utils.logging import MetricLogger


def cast_features(config: Config, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Host-side cast of the WSI feature bags to ``feature_dtype`` (auto =
    compute_dtype).  Numerics-neutral when it matches compute_dtype — the
    branch's first Dense casts its input there anyway — but halves the
    dominant batch stream in HBM and over the host->device link."""
    from sml_tpu.models.factory import feature_np_dtype

    fdt = feature_np_dtype(config)
    x = batch.get("x_path")
    if x is not None and x.dtype != fdt:
        batch = dict(batch, x_path=np.asarray(x).astype(fdt))
    return batch


def setup(config: Config, mesh=None):
    """Build (mesh, model, state, train_step, eval_step, loaders).

    Multi-host (after ``parallel.distributed.initialize``): the TRAIN loader is
    stride-sharded per process (DistributedSampler equivalent, reference
    ``main.py:51-56``) and yields the LOCAL ``batch_size/process_count`` rows;
    eval loaders stay global on every host (the reference evaluates the full
    split on every rank too).
    """
    mesh = mesh or make_mesh(config)
    pi, pc = jax.process_index(), jax.process_count()
    if pc > 1 and config.batch_size % pc:
        raise ValueError(f"batch_size={config.batch_size} must be divisible by "
                         f"the {pc} participating hosts")
    local_bs = config.batch_size // pc

    if config.packed_dir:
        # packed binary splits + native C++ prefetch (scripts/pack_data.py)
        from sml_tpu.data.packed import PackedLoader

        def packed(phase, batch_size, **kw):
            return PackedLoader(os.path.join(config.packed_dir, f"{phase}.bin"),
                                batch_size, workers=max(config.workers, 2),
                                **kw)

        train_loader = packed("Train", local_bs, shuffle=True, drop_last=True,
                              seed=config.seed, num_shards=pc, shard_id=pi)
        test_loader = packed("Test", config.batch_size)
        val_loader = None if config.novalset else packed("Val", config.batch_size)
    else:
        train_ds = build_datasets(config, "Train")
        test_ds = build_datasets(config, "Test")
        val_ds = None if config.novalset else build_datasets(config, "Val")

        loader_cls = Loader
        if config.bucket_list():
            # mixed bag-size buckets: homogeneous batches per bucket, one
            # compiled program per bucket shape (masks make padding exact)
            from sml_tpu.data.loader import BucketedLoader
            loader_cls = BucketedLoader
            if config.device_loop:
                raise ValueError("bucket_sizes requires per-step dispatch "
                                 "(device_loop scans need one static shape)")
            if not hasattr(train_ds, "bucket_of"):
                raise ValueError(f"dataset {config.dataset!r} does not expose "
                                 "bucket_of(i) metadata for bucket_sizes")
        train_loader = loader_cls(train_ds, local_bs, shuffle=True,
                                  drop_last=True, seed=config.seed,
                                  workers=config.workers,
                                  num_shards=pc, shard_id=pi)
        test_loader = loader_cls(test_ds, config.batch_size)
        val_loader = None if val_ds is None else loader_cls(val_ds,
                                                            config.batch_size)

    model = define_net(config)
    rng = jax.random.PRNGKey(config.seed)
    init_batch = cast_features(config, next(iter(test_loader)))
    init_batch.pop("sample_mask", None)
    variables = init_model(config, model, rng, init_batch)

    steps_per_epoch = max(len(train_loader), 1)
    tx = define_optimizer(config, steps_per_epoch)
    state = TrainState.create(variables, tx, jax.random.fold_in(rng, 1))

    if config.reload:
        best_path = os.path.join(config.checkpoints, "best_modal")
        weights = ckpt.restore_weights(best_path, state.model_variables())
        state = state.replace(params=weights["params"],
                              batch_stats=weights.get("batch_stats", {}))

    if config.resume and ckpt.has_resume_state(config.checkpoints):
        # full train-state resume (params + opt + step + PRNG); epoch/best/plateau
        # come from the meta JSON in train()
        last = os.path.join(config.checkpoints, ckpt.LAST_STATE)
        state = ckpt.restore_train_state(last, jax.device_get(state))

    state = replicate_tree(mesh, state)
    train_step = make_train_step(config, model, tx)
    eval_step = make_eval_step(config, model)
    return mesh, model, state, train_step, eval_step, (train_loader, val_loader,
                                                       test_loader)


def _is_better(config: Config, val: Dict[str, float],
               best: Dict[str, float]) -> bool:
    if config.task_type == "survival":
        return val["cindex"] > best.get("cindex", 0.0)
    # reference: (val_auc > best_auc) or (val_acc > best_acc)
    return (val["auc"] > best.get("auc", 0.0)) or (val["acc"] > best.get("acc", 0.0))


def train(config: Config, logger: Optional[MetricLogger] = None
          ) -> Tuple[TrainState, Dict[str, float]]:
    from sml_tpu.parallel.distributed import is_primary

    primary = is_primary()  # rank-0 logging/writes (reference's `if gpu == 0`)
    logger = logger or MetricLogger(config, disabled=config.debug or not primary)
    os.makedirs(config.checkpoints, exist_ok=True)

    (mesh, model, state, train_step, eval_step,
     (train_loader, val_loader, test_loader)) = setup(config)

    best: Dict[str, float] = {}
    cur_iters = 0
    start = time.time()

    plateau = None
    if config.lr_policy == "plateau":
        from sml_tpu.models.factory import ReduceLROnPlateau

        plateau = ReduceLROnPlateau(config.lr)

    start_epoch = config.start_epoch
    if config.resume:
        meta = ckpt.load_resume_meta(config.checkpoints)
        if meta is not None:
            start_epoch = int(meta["epoch"]) + 1
            best = dict(meta.get("best", {}))
            cur_iters = int(meta.get("iters", 0))
            if plateau is not None and meta.get("plateau"):
                plateau.lr = meta["plateau"]["lr"]
                plateau.best = meta["plateau"]["best"]
                plateau.num_bad = meta["plateau"]["num_bad"]
            print(f"resuming from epoch {start_epoch} "
                  f"(step {int(jax.device_get(state.step))})", flush=True)

    scan_chunk = scan_rem = None
    chunk = 0
    if config.device_loop:
        from sml_tpu.models.factory import define_optimizer
        from sml_tpu.train.steps import make_epoch_scan

        steps_per_epoch = max(len(train_loader), 1)
        tx = define_optimizer(config, steps_per_epoch)
        net = define_net(config)
        # chunk=0: whole epoch in one scan (epoch must fit in HBM); chunk=k: stream
        # the epoch in k-step dispatches — while chunk i computes, the host stacks
        # and device_puts chunk i+1 (both async), so at most 2 chunks are resident
        chunk = config.device_loop_chunk or steps_per_epoch
        chunk = min(chunk, steps_per_epoch)
        if config.eval_every_iters:
            # mid-epoch eval sweeps (reference evals every 10 iters,
            # train_test.py:196): dispatch boundaries must land on the eval
            # interval, so clamp the chunk to their gcd
            import math as _math

            chunk = _math.gcd(chunk, config.eval_every_iters)
        scan_chunk = make_epoch_scan(config, net, tx, num_steps=chunk)
        if steps_per_epoch % chunk:
            scan_rem = make_epoch_scan(config, net, tx,
                                       num_steps=steps_per_epoch % chunk)

    for epoch in range(start_epoch, config.epochs):
        train_loader.set_epoch(epoch)
        # the epoch-end evaluate() below is unconditional: a mid-epoch eval
        # landing exactly on the final iteration would duplicate it
        epoch_end_iters = cur_iters + max(len(train_loader), 1)
        if scan_chunk is not None:
            from sml_tpu.parallel.mesh import shard_stacked_batches

            def dispatch(buf, state):
                stacked = {k: np.stack([b[k] for b in buf]) for k in buf[0]}
                dev = shard_stacked_batches(mesh, stacked)
                scan = scan_chunk if len(buf) == chunk else scan_rem
                return scan(state, dev)

            def maybe_mid_eval(state, cur_iters):
                if (config.eval_every_iters
                        and cur_iters % config.eval_every_iters == 0
                        and cur_iters < epoch_end_iters):
                    variables = state.model_variables()
                    log = {"test": evaluate(config, eval_step, variables,
                                            test_loader, mesh)}
                    if val_loader is not None:
                        log["validation"] = evaluate(config, eval_step,
                                                     variables, val_loader, mesh)
                    logger.log(log)

            metric_chunks, buf = [], []
            for b in train_loader:
                b = cast_features(config, b)
                b.pop("sample_mask", None)
                buf.append(b)
                if len(buf) == chunk:
                    state, m = dispatch(buf, state)  # async: next stack overlaps
                    metric_chunks.append(m)
                    cur_iters += len(buf)
                    buf = []
                    maybe_mid_eval(state, cur_iters)
            if buf:
                state, m = dispatch(buf, state)
                metric_chunks.append(m)
                cur_iters += len(buf)
                maybe_mid_eval(state, cur_iters)
            if metric_chunks:
                metrics_stack = {
                    k: np.concatenate([np.asarray(m[k]) for m in metric_chunks])
                    for k in metric_chunks[0]}
                logger.log({"training": {k: float(np.mean(v))
                                         for k, v in metrics_stack.items()}})
        else:
            for batch in train_loader:
                batch = cast_features(config, batch)
                batch.pop("sample_mask", None)
                dev_batch = shard_batch(mesh, batch)
                state, metrics = train_step(state, dev_batch)
                cur_iters += 1

                if (config.eval_every_iters
                        and cur_iters % config.eval_every_iters == 0
                        and cur_iters < epoch_end_iters):
                    variables = state.model_variables()
                    test_m = evaluate(config, eval_step, variables, test_loader,
                                      mesh)
                    log = {"training": {k: float(v) for k, v in metrics.items()},
                           "test": test_m}
                    if val_loader is not None:
                        log["validation"] = evaluate(config, eval_step, variables,
                                                     val_loader, mesh)
                    logger.log(log)
                elif cur_iters % 10 == 0:
                    logger.log({"training": {k: float(v)
                                             for k, v in metrics.items()}})

        # ---- per-epoch eval + best-on-val checkpoint (reference :263-290) ----
        variables = state.model_variables()
        test_m = evaluate(config, eval_step, variables, test_loader, mesh)
        val_m = (evaluate(config, eval_step, variables, val_loader, mesh)
                 if val_loader is not None else test_m)
        logger.log({"epoch": epoch, "test": test_m, "validation": val_m,
                    "elapsed_sec": time.time() - start})
        if primary:
            print(f"epoch {epoch + 1}/{config.epochs} "
                  f"val={val_m} test={test_m}", flush=True)

        if plateau is not None:  # metric-driven LR (torch ReduceLROnPlateau)
            from sml_tpu.models.factory import set_learning_rate

            new_lr = plateau.step(val_m["loss"])
            state = set_learning_rate(state, new_lr)

        # eval metrics are identical on every host (full split, allgathered
        # outputs), so all hosts take the same branch.  Orbax saves are
        # COLLECTIVE under multi-process (internal sync_global_processes):
        # every process must call them; orbax elects who writes (shared-FS
        # checkpoint dir assumed, as on any pod).  Only the side-car meta JSON
        # is primary-only plain IO.
        if _is_better(config, val_m, best):
            best = dict(val_m)
            best["epoch"] = epoch
            path = ckpt.best_checkpoint_name(config.checkpoints, epoch,
                                             config.task_type, test_m)
            ckpt.save_weights(path, jax.device_get(variables))
            ckpt.save_weights(os.path.join(config.checkpoints, "best_modal"),
                              jax.device_get(variables))

        ckpt.save_train_state(os.path.join(config.checkpoints, ckpt.LAST_STATE),
                              jax.device_get(state))
        if primary:
            meta = {"epoch": epoch, "iters": cur_iters,
                    "best": {k: float(v) for k, v in best.items()}}
            if plateau is not None:
                meta["plateau"] = {"lr": plateau.lr, "best": plateau.best,
                                   "num_bad": plateau.num_bad}
            ckpt.save_resume_meta(config.checkpoints, meta)

    return state, best
