"""Multi-host SPMD bootstrap (reference multi-node path, ``main.py:26-28,148-149``).

The reference launches one process per GPU via ``mp.spawn`` and rendezvouses them
with ``dist.init_process_group("nccl", rank=nr*gpus+gpu)`` over ``MASTER_ADDR``/
``MASTER_PORT`` env vars (``/root/reference/main.py:145-149,173-177``).  The TPU-native
equivalent is one process per HOST: :func:`initialize` calls
``jax.distributed.initialize`` so every process sees the global device set, the mesh
spans the whole pod, and jit inserts the cross-host collectives over ICI/DCN itself —
no NCCL/MPI plumbing, no gradient hooks.

Single-host runs are untouched: with no coordinator configured this module is a no-op
and ``jax.process_count() == 1``.

Config knobs (mirroring the reference's ``nodes``/``nr`` + env rendezvous):
  - ``coordinator_address`` ("host:port"; also read from ``JAX_COORDINATOR_ADDRESS``)
  - ``num_processes``  (total hosts; also ``JAX_NUM_PROCESSES``)
  - ``process_id``     (this host's rank; also ``JAX_PROCESS_ID``)
On Cloud TPU pods all three may be omitted — ``jax.distributed.initialize()``
auto-detects from the TPU metadata server.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

_INITIALIZED = False


def initialize(config=None) -> None:
    """Bootstrap multi-host jax if a coordinator is configured; no-op otherwise.

    Must be called before any other jax API touches the backend (device queries,
    array creation) — the same ordering rule as the reference's requirement that
    ``init_process_group`` precede model construction.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    # NB: do NOT query jax.process_count()/devices() here — any backend touch
    # before jax.distributed.initialize makes the initialize itself illegal
    from jax._src import distributed as _jax_distributed

    if _jax_distributed.global_state.client is not None:
        _INITIALIZED = True  # someone already bootstrapped this process
        return

    addr = ""
    nproc = 0
    pid = -1
    if config is not None:
        addr = getattr(config, "coordinator_address", "") or ""
        nproc = int(getattr(config, "num_processes", 0) or 0)
        pid = int(getattr(config, "process_id", -1))
    addr = addr or os.environ.get("JAX_COORDINATOR_ADDRESS", "")
    nproc = nproc or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    if pid < 0:
        pid = int(os.environ.get("JAX_PROCESS_ID", "-1"))

    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if addr and nproc > 1 and pid >= 0:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=nproc, process_id=pid)
        _INITIALIZED = True
    elif len(workers.split(",")) > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        # multi-worker Cloud TPU pod slice: auto-detect from the metadata server
        # (a single-entry TPU_WORKER_HOSTNAMES means one host — no bootstrap)
        jax.distributed.initialize()
        _INITIALIZED = True


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) — (0, 1) on single host."""
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that should own logging / printing (rank-0 in the
    reference's ``if gpu == 0`` guards, e.g. ``train_test.py:200``)."""
    return jax.process_index() == 0
