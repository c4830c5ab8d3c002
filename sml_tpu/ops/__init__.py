"""Single-implementation op library (the reference vendors 2-3 copies of each; see SURVEY.md §2.4)."""

from sml_tpu.ops.common import torch_kernel_init, torch_bilinear_init, default_dense
from sml_tpu.ops.grid_sample import (grid_sample_2d, grid_sample_2d_matmul,
                                     grid_sample_1d)
from sml_tpu.ops.linear_algebra import moore_penrose_pinv
from sml_tpu.ops.snn import alpha_dropout, SNNBlock, AlphaDropout
from sml_tpu.ops.nystrom import FeedForward, Nystromformer, NystromAttention, PreNorm
from sml_tpu.ops.attention import RawMultiheadAttention
from sml_tpu.ops.transformer import TransformerEncoder, TransformerEncoderLayer
from sml_tpu.ops.conv import PPEG
from sml_tpu.ops.pooling import AttnNetGated, Pooler
from sml_tpu.ops.fusion import Bilinear, BilinearFusion, TrilinearFusion, FusionNet
from sml_tpu.ops.deformable import (
    CPB1D,
    CPB2D,
    DeformCrossAttention1D,
    DeformCrossAttention2D,
)
