"""SPMD layer: device mesh, sharding helpers, explicit collectives, cross-replica BN.

Replaces the reference's entire distributed runtime (``mp.spawn`` + NCCL DDP +
GatherLayer + 396 lines of threaded SyncBatchNorm — SURVEY.md §2.5) with a single
jit'd program over a 1-D ``jax.sharding.Mesh``:

* gradient all-reduce   -> implicit in jit-of-global-batch autodiff
* GatherLayer           -> the BatchLoss simply sees the global batch
  (explicit shard_map equivalent in :mod:`sml_tpu.parallel.collectives`)
* loss all_reduce log   -> the loss is already the global mean
* SyncBatchNorm         -> BatchNorm over the jit-visible global batch
  (explicit psum version in :mod:`sml_tpu.parallel.batchnorm` for shard_map contexts)
"""

from sml_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate_tree,
                                   shard_batch)
from sml_tpu.parallel.collectives import gather_with_local_grad
from sml_tpu.parallel.batchnorm import SyncBatchNorm
