"""Model zoo: the seven reference modes, re-designed TPU-first.

Mode -> class (reference ``models/model.py:49-79``):
    path               -> ABMIL
    omic               -> MaxNet
    pathomic           -> PathomicNet
    pathomic_original  -> PathomicNetOriginal
    mcat               -> MCATSurv
    cmta               -> CMTA
    deformpathomic     -> DeformPathomicNet   (the paper's model)
"""

from sml_tpu.models.maxnet import MaxNet
from sml_tpu.models.mil import ABMIL, GatedABMIL, TransMIL, TransLayer
from sml_tpu.models.pathomic import PathomicNet, PathomicNetOriginal
from sml_tpu.models.deform import DeformCrossTransMIL, DeformPathomicNet
from sml_tpu.models.mcat import MCATSurv
from sml_tpu.models.cmta import CMTA, TransformerG, TransformerP
from sml_tpu.models.factory import (
    define_net,
    define_optimizer,
    define_scheduler,
    init_model,
    max_kernel_init,
)
