"""Misc: logging, profiling, feature importance, rampup."""

from sml_tpu.utils.logging import MetricLogger, sigmoid_rampup
