"""Pallas TPU kernels for the hot ops."""

from sml_tpu.ops.pallas.deform_attn import fused_bias_attention_weights, fused_cpb_bias
