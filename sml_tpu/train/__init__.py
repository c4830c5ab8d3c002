"""Training layer: losses, host metrics, functional train/eval steps, checkpointing."""

from sml_tpu.train import losses, metrics
from sml_tpu.train.state import TrainState
