"""Pytest root config: force CPU with 8 virtual devices so sharding/collective tests run
without a TPU (and leave the real TPU free for benchmarking)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment pins JAX_PLATFORMS=axon (tunneled TPU); override to CPU for tests.
# Must happen via config (sitecustomize re-registers the axon platform at startup).
# SML_TPU_TESTS_ON_TPU=1 keeps the real backend so hardware-only tests
# (tests/test_fused_attention_tpu.py) can run: they skip on CPU.
import jax  # noqa: E402

if not os.environ.get("SML_TPU_TESTS_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
