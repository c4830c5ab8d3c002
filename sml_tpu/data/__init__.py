"""Data layer: IvYGAP / TCGA multimodal readers, synthetic generator, batching."""

from sml_tpu.data.synthetic import SyntheticDataset
from sml_tpu.data.datasets import IvYGAPDataset, TCGADataset, LABEL_SLOTS
from sml_tpu.data.loader import Loader, build_datasets, concat_datasets
