"""sml_tpu — a TPU-native multimodal (WSI + genomics) representation-learning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
helenypzhang/Subspace-Multimodal-Learning (reference layout documented in SURVEY.md):
gigapixel-pathology MIL + genomics fusion models (ABMIL, TransMIL, MaxNet,
PathomicNet, MCAT, CMTA, DeformPathomicNet), discrete-survival and WHO-2021
classification training, subspace batch-similarity loss, gradient modulation,
and data-parallel SPMD execution over a `jax.sharding.Mesh`.

Layout:
    sml_tpu.config    — YAML config hook with `defaults:` includes + auto-CLI
    sml_tpu.ops       — attention/fusion primitives (single implementation each)
    sml_tpu.models    — model zoo + factory
    sml_tpu.train     — losses, metrics, functional train steps, checkpointing
    sml_tpu.data      — dataset readers (IvYGAP / TCGA / synthetic) + loader
    sml_tpu.parallel  — mesh, collectives, cross-replica batch-norm
    sml_tpu.utils     — logging, profiling, feature importance
"""

__version__ = "0.1.0"
