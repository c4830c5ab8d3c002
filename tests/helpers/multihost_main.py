"""Subprocess body for the 2-process multi-host e2e check.

Launched twice (rank 0 and 1) by tests/test_multihost.py: each process gets 2
virtual CPU devices, rendezvouses via ``parallel.distributed.initialize`` (gloo
collectives), and runs the REAL ``train()`` loop — sharded train Loader, global
batch assembly via ``make_array_from_process_local_data``, allgathered eval —
on synthetic data.  Rank 0 prints one JSON line with the per-epoch val losses.

Also runnable with rank=-1: single-process baseline on 4 virtual devices (same
global mesh size) printing the same JSON, for the equivalence comparison.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    rank = int(sys.argv[1])
    port = sys.argv[2]
    ckdir = sys.argv[3]
    device_loop = len(sys.argv) > 4 and sys.argv[4] == "device_loop"
    n_local = 2 if rank >= 0 else 4
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").split("--xla_force_host_platform")[0]
        + f" --xla_force_host_platform_device_count={n_local}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))

    from sml_tpu.config import Config
    from sml_tpu.parallel import distributed
    from sml_tpu.train.loop import train

    config = Config(
        dataset="synthetic", synthetic_size=32, fixdim=64, batch_size=8,
        epochs=2, lr=1e-3, mode="omic", task_type="diag2021", label_dim=4,
        gradient_modulate=False, return_vgrid=False, optimizer="sgd",
        checkpoints=ckdir, debug=True, workers=0,
        coordinator_address=f"127.0.0.1:{port}" if rank >= 0 else "",
        num_processes=2 if rank >= 0 else 0,
        process_id=rank if rank >= 0 else -1,
        device_loop=device_loop, device_loop_chunk=2 if device_loop else 0,
    )
    distributed.initialize(config)
    assert jax.process_count() == (2 if rank >= 0 else 1)
    assert len(jax.devices()) == 4  # same global mesh either way

    losses = []

    class CaptureLogger:
        def log(self, payload):
            if "validation" in payload and "epoch" in payload:
                losses.append(float(payload["validation"]["loss"]))

        def close(self):
            pass

    state, best = train(config, logger=CaptureLogger())
    if distributed.is_primary():
        print(json.dumps({"val_losses": losses, "best": best.get("loss", -1.0),
                          "acc": best.get("acc", -1.0)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
